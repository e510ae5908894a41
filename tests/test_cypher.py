"""Cypher-subset MATCH parser: string queries == tuple-sentence match()."""

from __future__ import annotations

import random

import pytest

from tests.conftest import make_graph

from graphscope_spark.operators.cypher import cypher, parse_match
from graphscope_spark.operators.match import match


def _rand_graph(spark, n=30, m=90, seed=5):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    return make_graph(spark, sorted(edges), vertices=list(range(n)))


def test_parse_shapes():
    s, ret = parse_match(
        "MATCH (a)-[]->(b), (b)-[e]->(c), (a)<-[]-(c), (a)-[]-(d) "
        "RETURN DISTINCT a, b AS bb"
    )
    assert s == [
        ("a", "out", "b"),
        ("b", "out", "c"),
        ("c", "out", "a"),
        ("a", "both", "d"),
    ]
    assert ret == {
        "distinct": True,
        "items": [("tag", "a", "a"), ("tag", "b", "bb")],
    }

    s2, ret2 = parse_match("MATCH (x)-->(y)<--(z) RETURN count(*) AS n")
    assert s2 == [("x", "out", "y"), ("z", "out", "y")]
    assert ret2["items"] == [("count", "*", "n")]

    with pytest.raises(ValueError):
        parse_match("MATCH (a:Person)-[]->(b) RETURN a")
    with pytest.raises(ValueError):
        parse_match("MATCH (a)-[:KNOWS]->(b) RETURN a")
    with pytest.raises(ValueError):
        parse_match("MATCH (a)-[]->(b) RETURN q")


@pytest.mark.parametrize(
    "query,sentences",
    [
        (
            "MATCH (a)-[]->(b), (b)-[]->(c), (a)-[]->(c) RETURN count(*) AS n",
            [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")],
        ),
        (
            "MATCH (a)-[]->(b)-[]->(c)-[]->(d) RETURN count(*) AS n",
            [("a", "out", "b"), ("b", "out", "c"), ("c", "out", "d")],
        ),
        (
            "MATCH (a)-->(b), (a)-->(c), (b)-->(d), (c)-->(d) "
            "RETURN count(*) AS n",
            [("a", "out", "b"), ("a", "out", "c"),
             ("b", "out", "d"), ("c", "out", "d")],
        ),
    ],
)
def test_cypher_equals_match(spark, query, sentences):
    g = _rand_graph(spark)
    want = match(g, sentences).count()
    got = cypher(g, query).collect()[0]["n"]
    assert got == want


def test_cypher_tag_projection(spark):
    g = _rand_graph(spark)
    rows = cypher(g, "MATCH (a)-[]->(b) RETURN a, b").collect()
    want = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    assert {(r["a"], r["b"]) for r in rows} == want
