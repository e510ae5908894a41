"""interactive(graph).execute(...) facade == the underlying frontends."""

from __future__ import annotations

import pytest

from tests.conftest import make_graph

from graphscope_spark.interactive import interactive


def _graph(spark):
    return make_graph(
        spark, [(0, 1), (1, 2), (2, 0), (0, 2)], vertices=[0, 1, 2]
    )


def test_interactive_dispatch(spark):
    iq = interactive(_graph(spark))
    n = iq.execute("g.V().out().count()").collect()[0]["count"]
    assert n == 4
    rows = iq.execute("MATCH (a)-->(b) RETURN a, b").collect()
    assert len(rows) == 4
    # explicit lang + submit alias
    assert iq.submit(
        "MATCH (a)-->(b), (b)-->(c), (a)-->(c) RETURN count(*) AS n",
        lang="cypher",
    ).collect()[0]["n"] == 1
    # CALL infers cypher and dispatches through the procedure registry
    assert iq.execute("CALL wcc()").count() == iq.execute(
        "g.V().count()"
    ).collect()[0]["count"]


def test_interactive_property_graph(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    v = spark.createDataFrame([(0, 5), (1, 9)], "id long, age long")
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    pg = PropertyGraph().add_vertices("p", v).add_edges("knows", "p", "p", e)
    iq = interactive(pg)
    rows = iq.execute(
        "MATCH (a:p)-[:knows]->(b:p) WHERE b.age > 7 RETURN a, b.age AS bage"
    ).collect()
    assert [(r["a"], r["bage"]) for r in rows] == [(0, 9)]
    n = iq.execute("g.V().hasLabel('p').count()").collect()[0]["count"]
    assert n == 2


def test_interactive_errors(spark):
    iq = interactive(_graph(spark))
    with pytest.raises(ValueError, match="cannot infer"):
        iq.execute("SELECT 1")
    with pytest.raises(ValueError, match="Unsupported query language"):
        iq.execute("g.V().count()", lang="sparql")
