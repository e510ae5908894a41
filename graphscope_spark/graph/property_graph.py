"""Multi-label property graph — the loaded form GraphScope works on.

Reference: per-label vertex/edge Arrow tables with cross-label edges
(docs/frag_intro.md:29-47; loader core/loader/arrow_fragment_loader.h), ops
ADD_LABELS / CONSOLIDATE_COLUMNS (core/grape_instance.cc:1453,1458) and
PROJECT_TO_SIMPLE (:1346) which builtins run through.

Spark rendering: one DataFrame per vertex label (``id`` + properties) and
one per edge triple ``(edge_label, src_label, dst_label)`` (``src, dst`` +
properties). Label-crossing ids live in a shared long id space (the loader's
GID role); :meth:`to_simple` unions the requested labels into the
single-label :class:`~graphscope_spark.graph.graph.Graph` the algorithm
library executes on — exactly the reference's project-to-simple lowering.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["PropertyGraph"]

EdgeKey = tuple[str, str, str]  # (edge_label, src_label, dst_label)


@dataclass
class PropertyGraph:
    """vertices: label → DataFrame(id, props…);
    edges: (edge_label, src_label, dst_label) → DataFrame(src, dst, props…)."""

    vertices: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[EdgeKey, DataFrame] = field(default_factory=dict)

    # -- ADD_LABELS (grape_instance.cc:1453) -------------------------------

    def add_vertices(self, label: str, df: DataFrame) -> "PropertyGraph":
        if label in self.vertices:
            raise ValueError(f"vertex label {label!r} already present")
        out = PropertyGraph(dict(self.vertices), dict(self.edges))
        out.vertices[label] = df.withColumn("id", F.col("id").cast("long"))
        return out

    def add_edges(
        self, edge_label: str, src_label: str, dst_label: str, df: DataFrame
    ) -> "PropertyGraph":
        for lab in (src_label, dst_label):
            if lab not in self.vertices:
                raise ValueError(f"unknown vertex label {lab!r}")
        key = (edge_label, src_label, dst_label)
        if key in self.edges:
            raise ValueError(f"edge label {key!r} already present")
        out = PropertyGraph(dict(self.vertices), dict(self.edges))
        out.edges[key] = df.withColumn("src", F.col("src").cast("long")).withColumn(
            "dst", F.col("dst").cast("long")
        )
        return out

    # -- CONSOLIDATE_COLUMNS (grape_instance.cc:1458) -----------------------

    def consolidate_columns(
        self, label: str, columns: list[str], out: str
    ) -> "PropertyGraph":
        """Merge property columns into one (first non-null wins — the
        reference consolidates equivalent per-label columns)."""
        v = self.vertices[label].withColumn(out, F.coalesce(*columns))
        g = PropertyGraph(dict(self.vertices), dict(self.edges))
        g.vertices[label] = v
        return g

    # -- schema / reporting --------------------------------------------------

    def schema(self) -> dict:
        return {
            "vertices": {
                lab: [c for c in df.columns if c != "id"]
                for lab, df in self.vertices.items()
            },
            "edges": {
                "/".join(k): [c for c in df.columns if c not in ("src", "dst")]
                for k, df in self.edges.items()
            },
        }

    # -- PROJECT_TO_SIMPLE (grape_instance.cc:1346) --------------------------

    def to_simple(
        self,
        vertex_labels: list[str] | None = None,
        edge_keys: list[EdgeKey] | None = None,
        v_prop: str | None = None,
        e_prop: str | None = None,
        num_partitions: int | None = None,
    ) -> Graph:
        """Union the requested labels into the single-label simple graph
        (≤1 vertex property, ≤1 edge property) the builtin algorithms run
        on; ids must already share one id space."""
        vls = vertex_labels or list(self.vertices)
        eks = edge_keys or [
            k for k in self.edges if k[1] in vls and k[2] in vls
        ]
        vparts = []
        for lab in vls:
            df = self.vertices[lab]
            cols = ["id"] + (
                [F.col(v_prop).cast("double").alias("vdata")]
                if v_prop and v_prop in df.columns
                else []
            )
            vparts.append(df.select(*cols))
        verts = vparts[0]
        for p in vparts[1:]:
            verts = verts.unionByName(p, allowMissingColumns=True)
        eparts = []
        for k in eks:
            df = self.edges[k]
            cols = ["src", "dst"] + (
                [F.col(e_prop).cast("double").alias("weight")]
                if e_prop and e_prop in df.columns
                else []
            )
            eparts.append(df.select(*cols))
        edges = eparts[0]
        for p in eparts[1:]:
            edges = edges.unionByName(p, allowMissingColumns=True)
        return Graph(
            edges,
            vertices=verts.dropDuplicates(["id"]),
            num_partitions=num_partitions,
        )
