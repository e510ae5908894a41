"""Context — the algorithm-result surface (SURVEY §1.3).

GraphScope runs produce a Context keyed by vertex, pulled with selectors
``"v.id"`` / ``"v.data"`` / ``"r"`` into numpy/pandas or written back onto
the graph (core/context/selector.h:55-143,
python/graphscope/framework/context.py:137-232, ADD_COLUMN
grape_instance.cc:1493). Here a Context wraps the result DataFrame; the
selectors map to column selection and the exports to Arrow-backed
conversions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["Context"]


class Context:
    """Vertex-data context: result DataFrame with an ``id`` column plus one
    or more value columns (the ``r`` selector targets)."""

    def __init__(self, graph: Graph, result: DataFrame, value_col: str | None = None):
        self.graph = graph
        self.df = result
        cols = [c for c in result.columns if c != "id"]
        self.value_col = value_col or (cols[0] if cols else "id")

    def _select(self, selector: str):
        if selector == "v.id":
            return self.df.select("id")
        if selector == "r":
            return self.df.select(self.value_col)
        if selector.startswith("r."):
            return self.df.select(selector[2:])
        if selector.startswith("v."):  # vertex property
            prop = selector[2:]
            return self.df.select("id").join(
                self.graph.vertices.select("id", prop), "id"
            ).select(prop)
        raise ValueError(f"unknown selector {selector!r}")

    def to_numpy(self, selector: str):
        import numpy as np

        pdf = self._select(selector).toPandas()
        return np.asarray(pdf[pdf.columns[0]])

    def to_dataframe(self, selectors: dict[str, str]):
        out = None
        base = self.df.orderBy("id")
        cols = []
        for name, sel in selectors.items():
            if sel == "v.id":
                cols.append(F.col("id").alias(name))
            elif sel == "r":
                cols.append(F.col(self.value_col).alias(name))
            elif sel.startswith("r."):
                cols.append(F.col(sel[2:]).alias(name))
            else:
                raise ValueError(f"unsupported selector {sel!r}")
        out = base.select(*cols)
        return out.toPandas()

    def output(self, path: str, selectors: dict[str, str], mode: str = "overwrite"):
        """DATA_SINK: write selected columns as parquet."""
        cols = []
        for name, sel in selectors.items():
            if sel == "v.id":
                cols.append(F.col("id").alias(name))
            elif sel == "r":
                cols.append(F.col(self.value_col).alias(name))
            elif sel.startswith("r."):
                cols.append(F.col(sel[2:]).alias(name))
        self.df.select(*cols).write.mode(mode).parquet(path)

    def add_column(self, name: str) -> Graph:
        """ADD_COLUMN: attach the result as a new vertex property."""
        return self.graph.add_column(
            self.df.select("id", F.col(self.value_col).alias(name))
        )
