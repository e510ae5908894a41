"""GraphAr-style archive source/sink (COO / parquet profile).

Reference: docs/storage_engine/graphar.md — GraphAr lays a property graph
out as YAML metadata + chunked payload files: vertex property groups under
``vertex/<label>/<group>/chunk<k>`` and adjacency under
``edge/<label>/adj_list/`` in COO/CSR/CSC order, each chunk holding
``chunk_size`` logical rows, over CSV/ORC/Parquet.

This implements the COO + Parquet profile with plain-text YAML (no external
yaml dependency — the subset used is line-based ``key: value``):

* :func:`write_graphar` — serialize a :class:`PropertyGraph` (or simple
  Graph) into ``<base>/<name>.graph.yml`` + per-label vertex/edge parquet
  chunk directories.
* :func:`read_graphar` — load it back into a :class:`PropertyGraph`.

Chunking maps to Spark partitions (``repartitionByRange`` on id so chunk
files are contiguous id ranges, GraphAr's internal-id contract); round-trip
equality is pytest-verified. Byte-level compatibility with the C++ GraphAr
writer is NOT claimed — this is the archive *format shape* so graphs can be
exchanged as chunked columnar archives rather than ad-hoc parquet pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph.property_graph import PropertyGraph

__all__ = ["write_graphar", "read_graphar"]


def _write_yaml(path: str, pairs: dict) -> None:
    with open(path, "w") as fh:
        for k, v in pairs.items():
            if isinstance(v, list):
                fh.write(f"{k}:\n")
                for item in v:
                    fh.write(f"  - {item}\n")
            else:
                fh.write(f"{k}: {v}\n")


def _read_yaml(path: str) -> dict:
    out: dict = {}
    key = None
    for line in open(path):
        if not line.strip() or line.startswith("#"):
            continue
        if line.startswith("  - "):
            out.setdefault(key, [])
            out[key].append(line.strip()[2:])
        else:
            key, _, val = line.partition(":")
            key = key.strip()
            val = val.strip()
            out[key] = val if val else []
    return out


def write_graphar(
    pg: PropertyGraph, base: str, name: str = "graph", chunk_size: int = 262_144
) -> None:
    os.makedirs(base, exist_ok=True)
    _write_yaml(
        os.path.join(base, f"{name}.graph.yml"),
        {
            "name": name,
            "chunk_size": chunk_size,
            "vertices": sorted(pg.vertices),
            "edges": sorted("/".join(k) for k in pg.edges),
        },
    )
    for label, df in pg.vertices.items():
        n = df.count()
        parts = max(1, -(-n // chunk_size))
        (
            df.repartitionByRange(parts, "id")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .parquet(os.path.join(base, "vertex", label, "chunks"))
        )
        _write_yaml(
            os.path.join(base, "vertex", f"{label}.vertex.yml"),
            {"label": label, "chunk_size": chunk_size, "count": n,
             "file_type": "parquet"},
        )
    for key, df in pg.edges.items():
        kdir = "_".join(key)
        n = df.count()
        parts = max(1, -(-n // chunk_size))
        (
            df.repartitionByRange(parts, "src", "dst")
            .sortWithinPartitions("src", "dst")
            .write.mode("overwrite")
            .parquet(os.path.join(base, "edge", kdir, "adj_list"))
        )
        _write_yaml(
            os.path.join(base, "edge", f"{kdir}.edge.yml"),
            {"edge_label": key[0], "src_label": key[1], "dst_label": key[2],
             "adj_list_type": "coo_ordered_by_source",
             "chunk_size": chunk_size, "count": n, "file_type": "parquet"},
        )


def read_graphar(
    spark: SparkSession, base: str, name: str = "graph"
) -> PropertyGraph:
    meta = _read_yaml(os.path.join(base, f"{name}.graph.yml"))
    pg = PropertyGraph()
    for label in meta.get("vertices", []):
        df = spark.read.parquet(os.path.join(base, "vertex", label, "chunks"))
        pg = pg.add_vertices(label, df)
    for ekey in meta.get("edges", []):
        el, sl, dl = ekey.split("/")
        kdir = "_".join((el, sl, dl))
        df = spark.read.parquet(os.path.join(base, "edge", kdir, "adj_list"))
        pg = pg.add_edges(el, sl, dl, df)
    return pg
