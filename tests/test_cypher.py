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


# ---------------------------------------------------------------------------
# labeled surface: cypher_property over a PropertyGraph
# ---------------------------------------------------------------------------


def _pgraph(spark):
    """person {0..4, age=30+id} -knows-> person; person -works_at-> company
    {100,101, size}. Shared long id space (companies offset by 100)."""
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(i, 30 + i) for i in range(5)], "id long, age long"
    )
    company = spark.createDataFrame(
        [(100, 10), (101, 2000)], "id long, size long"
    )
    knows = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)], "src long, dst long"
    )
    works = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 101), (3, 101), (4, 101)],
        "src long, dst long",
    )
    return (
        PropertyGraph()
        .add_vertices("person", person)
        .add_vertices("company", company)
        .add_edges("knows", "person", "person", knows)
        .add_edges("works_at", "person", "company", works)
    )


def test_parse_cypher_full_ast():
    from graphscope_spark.operators.cypher import parse_cypher

    ast = parse_cypher(
        "MATCH (a:person)-[:knows]->(b)-[w:works_at]->(c:company) "
        "WHERE a.age < 33 AND c.size >= 100 AND a <> b "
        "RETURN c.id AS cid, count(*) AS n"
    )
    assert ast["sentences"] == [
        ("a", "out", "b", "knows"),
        ("b", "out", "c", "works_at"),
    ]
    assert ast["labels"] == {"a": "person", "b": None, "c": "company"}
    assert ast["where"] == [
        ("cmp", ("prop", "a", "age"), "<", ("lit", 33)),
        ("cmp", ("prop", "c", "size"), ">=", ("lit", 100)),
        ("cmp", ("tag", "a"), "<>", ("tag", "b")),
    ]
    assert ast["return"]["items"] == [
        ("prop", "c", "id", "cid"),
        ("count", "*", None, "n"),
    ]


def test_cypher_property_label_filtered(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # knows-paths a->b where b works at the big company
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person)-[:works_at]->(c:company) "
        "WHERE c.size >= 100 RETURN a, b, c",
    ).collect()
    got = {(r["a"], r["b"], r["c"]) for r in rows}
    # knows edges whose dst ∈ {2,3,4} (work at 101, size 2000)
    assert got == {(1, 2, 101), (2, 3, 101), (3, 4, 101), (0, 2, 101)}


def test_cypher_property_pushdown_and_group(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.age <= 31 "
        "RETURN b.age AS bage, count(*) AS n",
    ).collect()
    # a ∈ {0,1}: edges (0,1),(0,2),(1,2) → b.age 31 once, 32 twice
    assert {(r["bage"], r["n"]) for r in rows} == {(31, 1), (32, 2)}


def test_cypher_property_cross_tag_where(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE b.age > a.age "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0]["n"] == 5  # every knows edge goes id-increasing


def test_cypher_property_undirected_binds_both_ways(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    n = cypher_property(
        pg, "MATCH (a:person)-[:knows]-(b:person) RETURN count(*) AS n"
    ).collect()[0]["n"]
    assert n == 10  # 5 edges × 2 orientations (Cypher undirected semantics)


def test_cypher_property_errors(spark):
    import pytest as _pytest

    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    with _pytest.raises(ValueError, match="no edge tables match"):
        cypher_property(
            pg, "MATCH (a:company)-[:knows]->(b) RETURN count(*) AS n"
        ).collect()
    with _pytest.raises(ValueError, match="needs a vertex label"):
        cypher_property(
            pg, "MATCH (a)-[:knows]->(b) WHERE a.age < 3 RETURN a"
        ).collect()
    with _pytest.raises(ValueError, match="no property"):
        cypher_property(
            pg, "MATCH (a:person)-[:knows]->(b:person) RETURN a.salary"
        ).collect()
    with _pytest.raises(ValueError, match="two labels"):
        cypher_property(
            pg, "MATCH (a:person)-[:knows]->(a:company) RETURN a"
        ).collect()


def test_cypher_varlen_paths(spark):
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    ast = parse_cypher("MATCH (a)-[:knows*1..3]->(b) RETURN a")
    assert ast["var_hops"] == {0: (1, 3)}
    assert parse_cypher("MATCH (a)-[*2]->(b) RETURN a")["var_hops"] == {0: (2, 2)}
    with pytest.raises(ValueError, match="upper bound"):
        parse_cypher("MATCH (a)-[*]->(b) RETURN a")

    pg = _pgraph(spark)
    # knows chain 0→1→2→3→4 plus 0→2: paths of length 1..2 from 0:
    # 0→1, 0→2, 0→1→2, 0→2→3 → b multiset {1, 2, 2, 3}
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows*1..2]->(b:person) WHERE a = 0 "
        "RETURN b, count(*) AS n",
    ).collect()
    assert {(r["b"], r["n"]) for r in rows} == {(1, 1), (2, 2), (3, 1)}


def test_cypher_varlen_endpoint_labels_only(spark):
    """Intermediate vertices of a var-length pattern are unconstrained:
    person→company edges can chain through a company even when endpoints
    are labeled person/company."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    n = cypher_property(
        pg, "MATCH (a:person)-[*1..2]->(c:company) RETURN count(*) AS n"
    ).collect()[0]["n"]
    # length-1: works_at edges (5); length-2: knows→works_at chains
    # 0→1→100, 1→2→101, 2→3→101, 3→4→101, 0→2→101 (5) → 10
    assert n == 10


def test_cypher_property_pushdown_plan(spark):
    """The single-tag predicate must reach the scan side, not sit above the
    pattern join: the physical plan filters person rows before the join."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    df = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.age <= 31 "
        "RETURN a, b",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_cypher_selfloop_pattern(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    v = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    e = spark.createDataFrame([(0, 0), (0, 1), (2, 2)], "src long, dst long")
    pg = PropertyGraph().add_vertices("n", v).add_edges("e", "n", "n", e)
    rows = cypher_property(pg, "MATCH (a:n)-[:e]->(a) RETURN a").collect()
    assert sorted(r["a"] for r in rows) == [0, 2]


def test_cypher_varlen_undirected_rejected(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    with pytest.raises(ValueError, match="undirected variable-length"):
        cypher_property(pg, "MATCH (a:person)-[:knows*1..2]-(b) RETURN a")


def test_cypher_closing_sentence_bag_semantics(spark):
    """A closing sentence with path multiplicities contributes one binding
    per path (inner join), not an existence check: (0,2) has both the
    direct edge and the 0→1→2 path."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    n = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person), (a)-[:knows*1..2]->(b) "
        "RETURN count(*) AS n",
    ).collect()[0]["n"]
    # pairs with a direct edge: (0,1),(1,2),(2,3),(3,4),(0,2); 1..2-hop
    # path counts: 1,1,1,1,2 → 6 bindings
    assert n == 6


def test_cypher_optional_match(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # every person knows-edge; optionally the target's company
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "OPTIONAL MATCH (b)-[:works_at]->(c:company) RETURN a, b, c",
    ).collect()
    got = {(r["a"], r["b"], r["c"]) for r in rows}
    # knows: (0,1),(1,2),(2,3),(3,4),(0,2); works_at: 0→100,1→100,2→101,
    # 3→101, 4→101 — every b works somewhere here, so no nulls yet
    assert got == {
        (0, 1, 100), (1, 2, 101), (2, 3, 101), (3, 4, 101), (0, 2, 101)
    }
    # with a pushed filter making some optional sides empty → null rows
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "OPTIONAL MATCH (b)-[:works_at]->(c:company) "
        "WHERE c.size > 100 RETURN b, c",
    ).collect()
    got = {(r["b"], r["c"]) for r in rows}
    # only company 101 (size 2000) survives the pushdown; b=1 (works at
    # 100) keeps its row with a null c
    assert got == {(1, None), (2, 101), (3, 101), (4, 101)}


def test_cypher_optional_prop_access_keeps_nulls(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "OPTIONAL MATCH (b)-[:works_at]->(c:company) "
        "WHERE c.size > 100 RETURN b, c.size AS csize",
    ).collect()
    got = {(r["b"], r["csize"]) for r in rows}
    assert got == {(1, None), (2, 2000), (3, 2000), (4, 2000)}


def test_cypher_optional_requires_shared_tag(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    with pytest.raises(ValueError, match="share at least one tag"):
        cypher_property(
            pg,
            "MATCH (a:person)-[:knows]->(b:person) "
            "OPTIONAL MATCH (x:person)-[:works_at]->(y:company) RETURN a",
        )


def test_cypher_order_by_limit_skip(spark):
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    ast = parse_cypher(
        "MATCH (a)-[:e]->(b) RETURN a, b ORDER BY b DESC, a SKIP 2 LIMIT 3"
    )
    assert ast["return"]["order"] == [("b", True), ("a", False)]
    assert ast["return"]["skip"] == 2 and ast["return"]["limit"] == 3
    with pytest.raises(ValueError, match="RETURN item alias"):
        parse_cypher("MATCH (a)-[:e]->(b) RETURN a ORDER BY z")

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "RETURN a, b ORDER BY b DESC, a ASC LIMIT 2",
    ).collect()
    # knows: (0,1),(1,2),(2,3),(3,4),(0,2) → by b desc: (3,4),(2,3)
    assert [(r["a"], r["b"]) for r in rows] == [(3, 4), (2, 3)]
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "RETURN a, b ORDER BY b ASC, a ASC SKIP 1 LIMIT 2",
    ).collect()
    # ordered: (0,1),(0,2),(1,2),(2,3),(3,4) → skip 1, take 2
    assert [(r["a"], r["b"]) for r in rows] == [(0, 2), (1, 2)]


def test_cypher_aggregate_functions(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # knows edges: 0->1, 1->2, 2->3, 3->4, 0->2; dst ages 31,32,33,34,32
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "RETURN a.id AS src, sum(b.age) AS total, max(b.age) AS oldest",
    ).collect()
    got = {r["src"]: (r["total"], r["oldest"]) for r in rows}
    assert got == {0: (31 + 32, 32), 1: (32, 32), 2: (33, 33), 3: (34, 34)}
    # global aggregate (no grouping keys): avg + count(DISTINCT)
    row = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "RETURN avg(c.size) AS mean_size, count(DISTINCT c) AS n_companies",
    ).collect()[0]
    assert row["n_companies"] == 2
    assert row["mean_size"] == pytest.approx((10 + 10 + 2000 * 3) / 5)
    # collect() returns a deterministic sorted list
    row = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.id = 0 "
        "RETURN collect(b.age) AS ages",
    ).collect()[0]
    assert row["ages"] == [31, 32]


def test_cypher_with_pipeline_having(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # degree histogram through WITH + WHERE (HAVING shape):
    # out-degrees: 0->2, 1->1, 2->1, 3->1
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg "
        "WHERE deg >= 1 "
        "RETURN deg, count(*) AS n ORDER BY deg",
    ).collect()
    assert [(r["deg"], r["n"]) for r in rows] == [(1, 3), (2, 1)]
    # WITH WHERE filters groups before the second aggregation
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg WHERE deg >= 2 "
        "RETURN count(*) AS n_hubs",
    ).collect()
    assert rows[0]["n_hubs"] == 1
    # WITH projecting properties, RETURN aggregating the aliases
    row = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "WITH a.age AS age, c.size AS size WHERE size > 100 "
        "RETURN min(age) AS youngest, count(*) AS n",
    ).collect()[0]
    assert (row["youngest"], row["n"]) == (32, 3)


def test_cypher_count_tag_counts_non_null(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # optional company binding: count(c) skips unmatched (null) bindings
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "OPTIONAL MATCH (b)-[:works_at]->(c:company) "
        "WHERE c.id = 101 "
        "RETURN a.id AS src, count(c) AS n_bound ORDER BY src",
    ).collect()
    # b bindings per a: 0->{1,2}, 1->{2}, 2->{3}, 3->{4}; b in {2,3,4} works
    # at 101 -> counts: a=0: 1 (b=2), a=1: 1, a=2: 1, a=3: 1
    assert [(r["src"], r["n_bound"]) for r in rows] == [
        (0, 1), (1, 1), (2, 1), (3, 1),
    ]


def test_cypher_with_errors(spark):
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _pgraph(spark)
    with pytest.raises(ValueError, match="property access after WITH"):
        parse_cypher(
            "MATCH (a:person)-[:knows]->(b:person) WITH a, count(*) AS d "
            "RETURN a.age"
        )
    with pytest.raises(ValueError, match="unknown alias"):
        parse_cypher(
            "MATCH (a:person)-[:knows]->(b:person) WITH a, count(*) AS d "
            "WHERE nope > 1 RETURN d"
        )
    with pytest.raises(ValueError, match="DISTINCT inside an aggregate"):
        parse_cypher(
            "MATCH (a:person)-[:knows]->(b:person) RETURN sum(DISTINCT b.age)"
        )
    with pytest.raises(ValueError, match="WITH requires cypher_property"):
        from graphscope_spark.operators.cypher import parse_match

        parse_match("MATCH (a)-->(b) WITH a, count(*) AS d RETURN d")


def test_cypher_multiple_match_clauses(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # two MATCH clauses join on the shared tag b; per-clause WHEREs AND
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.id = 0 "
        "MATCH (b)-[:works_at]->(c:company) WHERE c.size > 100 "
        "RETURN b.id AS b, c.id AS c ORDER BY b",
    ).collect()
    # a=0 knows {1,2}; works_at: 1->100(small), 2->101(big) -> only b=2
    assert [(r["b"], r["c"]) for r in rows] == [(2, 101)]
    # equivalent comma form gives the same result
    rows2 = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person), (b)-[:works_at]->(c:company) "
        "WHERE a.id = 0 AND c.size > 100 "
        "RETURN b.id AS b, c.id AS c ORDER BY b",
    ).collect()
    assert [(r["b"], r["c"]) for r in rows2] == [(2, 101)]
    with pytest.raises(ValueError, match="MATCH may not follow OPTIONAL"):
        cypher_property(
            pg,
            "MATCH (a:person)-[:knows]->(b:person) "
            "OPTIONAL MATCH (b)-[:works_at]->(c:company) "
            "MATCH (c)-[:knows]->(d:person) RETURN d",
        )


def test_cypher_multi_stage_with(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # stage 1: out-degree per person; stage 2: histogram; RETURN: how many
    # distinct histogram buckets — three aggregation stages chained
    row = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg "
        "WITH deg, count(*) AS n WHERE n >= 1 "
        "RETURN count(*) AS n_buckets, sum(n) AS n_people",
    ).collect()[0]
    # degrees: {0:2, 1:1, 2:1, 3:1} -> histogram {2:1, 1:3} -> 2 buckets, 4 ppl
    assert (row["n_buckets"], row["n_people"]) == (2, 4)
    # second-stage WHERE references only the second stage's aliases
    with pytest.raises(ValueError, match="unknown alias"):
        cypher_property(
            pg,
            "MATCH (a:person)-[:knows]->(b:person) "
            "WITH a, count(*) AS deg "
            "WITH deg, count(*) AS n WHERE a > 1 "
            "RETURN n",
        )


def test_cypher_where_or_not_pushdown(spark):
    """OR groups over one tag's properties push down as a vertex filter;
    OR across tags post-filters; NOT and parens follow standard
    precedence."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # single-tag OR: a.age = 30 OR a.age = 32 -> persons 0, 2
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WHERE a.age = 30 OR a.age = 32 RETURN a.id AS aid, b.id AS bid",
    ).collect()
    assert sorted((r["aid"], r["bid"]) for r in rows) == [
        (0, 1), (0, 2), (2, 3),
    ]
    # NOT over a single-tag prop
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WHERE NOT a.age >= 32 RETURN a.id AS aid, b.id AS bid",
    ).collect()
    assert sorted((r["aid"], r["bid"]) for r in rows) == [
        (0, 1), (0, 2), (1, 2),
    ]
    # cross-tag OR cannot push down: post-filter after property joins
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "WHERE a.age <= 30 OR c.size > 100 RETURN a.id AS aid, c.id AS cid",
    ).collect()
    assert sorted((r["aid"], r["cid"]) for r in rows) == [
        (0, 100), (2, 101), (3, 101), (4, 101),
    ]
    # parens override precedence: (30 OR 31) AND works_at big company
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "WHERE (a.age = 30 OR a.age = 31) AND c.size > 100 "
        "RETURN a.id AS aid",
    ).collect()
    assert rows == []
    # same without parens: OR binds looser than AND -> age=30 rows survive
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "WHERE a.age = 30 OR a.age = 31 AND c.size > 100 "
        "RETURN a.id AS aid",
    ).collect()
    assert sorted(r["aid"] for r in rows) == [0]


def test_cypher_where_or_parse_errors():
    from graphscope_spark.operators.cypher import parse_cypher

    with pytest.raises(ValueError, match="unbalanced"):
        parse_cypher(
            "MATCH (a:person)-[:knows]->(b) WHERE (a.age = 1 RETURN a"
        )
    with pytest.raises(ValueError, match="unsupported predicate"):
        parse_cypher("MATCH (a:person)-[:knows]->(b) WHERE a.age RETURN a")
    # AND inside a string literal does not split the predicate
    ast = parse_cypher(
        "MATCH (a:person)-[:knows]->(b) WHERE a.name = 'x AND y' RETURN a"
    )
    assert ast["where"] == [
        ("cmp", ("prop", "a", "name"), "=", ("lit", "x AND y"))
    ]


def test_cypher_string_predicates(spark):
    """STARTS WITH / ENDS WITH / CONTAINS / =~ over a path-shaped column —
    the filters a code-corpus link graph actually runs."""
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    files = spark.createDataFrame(
        [
            (0, "src/app/main.py"),
            (1, "src/app/util.py"),
            (2, "docs/readme.md"),
            (3, "src/lib/core.rs"),
        ],
        "id long, path string",
    )
    imports = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    pg = (
        PropertyGraph()
        .add_vertices("file", files)
        .add_edges("imports", "file", "file", imports)
    )

    ast = parse_cypher(
        "MATCH (a:file)-[:imports]->(b:file) "
        "WHERE a.path ENDS WITH '.py' RETURN a.id AS aid"
    )
    assert ast["where"] == [
        ("cmp", ("prop", "a", "path"), "endswith", ("lit", ".py"))
    ]

    def ids(q, col="aid"):
        return sorted(r[col] for r in cypher_property(pg, q).collect())

    base = "MATCH (a:file)-[:imports]->(b:file) WHERE {} RETURN a.id AS aid"
    assert ids(base.format("a.path ENDS WITH '.py'")) == [0, 0, 1]
    assert ids(base.format("a.path STARTS WITH 'src/'")) == [0, 0, 1]
    assert ids(base.format("a.path CONTAINS 'app'")) == [0, 0, 1]
    assert ids(base.format("a.path =~ '.*\\.(py|md)'")) == [0, 0, 1, 2]
    # string predicate on the DESTINATION tag + boolean composition
    assert ids(
        base.format("b.path ENDS WITH '.rs' AND a.path CONTAINS 'docs'")
    ) == [2]
    assert ids(
        base.format("a.path ENDS WITH '.md' OR b.path ENDS WITH '.md'")
    ) == [0, 2]
    # NOT over a string predicate
    assert ids(base.format("NOT a.path CONTAINS 'src'")) == [2]

    # =~ requires a string-literal pattern
    with pytest.raises(ValueError, match="string-literal regex"):
        cypher_property(
            pg, base.format("a.path =~ b.path")
        )


def test_cypher_shortest_path(spark):
    """p = shortestPath((a)-[*..k]->(b)): BFS length + vertex path, with
    endpoint predicates pushed into the source/target sets (GIE's
    path_opt=SHORTEST PathExpand — interactive_engine algebra.proto)."""
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _pgraph(spark)

    ast = parse_cypher(
        "MATCH p = shortestPath((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 AND b.id = 4 "
        "RETURN a.id AS aid, b.id AS bid, length(p) AS len, p"
    )
    assert ast["shortest"] == {0: {"var": "p", "max": 6, "all": False}}
    assert ("pathlen", "p", None, "len") in ast["return"]["items"]
    assert ("pathvar", "p", None, "p") in ast["return"]["items"]

    rows = cypher_property(
        pg,
        "MATCH p = shortestPath((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 AND b.id = 4 "
        "RETURN a.id AS aid, b.id AS bid, length(p) AS len, p",
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # 0->2->3->4 (min-predecessor tie-break picks parent 0 for vertex 2)
    assert (r["aid"], r["bid"], r["len"]) == (0, 4, 3)
    assert list(r["p"]) == [0, 2, 3, 4]

    # unreachable pairs drop: vertex 4 has no outgoing knows edges
    assert (
        cypher_property(
            pg,
            "MATCH shortestPath((a:person)-[:knows*]->(b:person)) "
            "WHERE a.id = 4 AND b.id < 4 RETURN count(*) AS n",
        ).collect()[0]["n"]
        == 0
    )

    # depth bound prunes: 0->4 needs 3 hops, *..2 finds nothing
    assert (
        cypher_property(
            pg,
            "MATCH shortestPath((a:person)-[:knows*..2]->(b:person)) "
            "WHERE a.id = 0 AND b.id = 4 RETURN count(*) AS n",
        ).collect()[0]["n"]
        == 0
    )

    # grouping over path length: all-pairs from 0 (1:1hop, 2:1hop via 0->2,
    # 3:2hops, 4:3hops)
    got = {
        (r["len"], r["n"])
        for r in cypher_property(
            pg,
            "MATCH p = shortestPath((a:person)-[:knows*..6]->(b:person)) "
            "WHERE a.id = 0 AND a.id <> b.id "
            "RETURN length(p) AS len, count(*) AS n",
        ).collect()
    }
    assert got == {(1, 2), (2, 1), (3, 1)}


def test_cypher_shortest_path_errors(spark):
    from graphscope_spark.operators.cypher import cypher, parse_cypher

    g = _rand_graph(spark)
    # shortestPath over a plain Graph (no labels) requires cypher_property
    with pytest.raises(ValueError, match="cypher_property"):
        cypher(g, "MATCH shortestPath((a)-[*]->(b)) RETURN count(*) AS n")
    # two edge patterns inside shortestPath
    with pytest.raises(ValueError, match="exactly one edge"):
        parse_cypher(
            "MATCH p = shortestPath((a)-[*]->(b)-[*]->(c)) RETURN count(*) AS n"
        )
    # length() of a non-path variable
    with pytest.raises(ValueError, match="length"):
        parse_cypher("MATCH (a)-[]->(b) RETURN length(a) AS n")
    # rebinding the path variable
    with pytest.raises(ValueError, match="already bound"):
        parse_cypher(
            "MATCH p = shortestPath((a)-[*]->(b)), "
            "p = shortestPath((b)-[*]->(c)) RETURN count(*) AS n"
        )


def _wgraph(spark):
    """_pgraph plus a weight property on knows edges (w = src*10 + dst)."""
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(i, 30 + i) for i in range(5)], "id long, age long"
    )
    knows = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 12), (2, 3, 23), (3, 4, 34), (0, 2, 2)],
        "src long, dst long, w long",
    )
    return (
        PropertyGraph()
        .add_vertices("person", person)
        .add_edges("knows", "person", "person", knows)
    )


def test_cypher_edge_properties(spark):
    """-[r:knows]-> binds the edge's property columns: r.prop in WHERE
    (single-variable predicates filter the edge scan — the edge half of
    FilterIntoJoinRule) and RETURN/aggregates (GIE property access on
    relationship variables, compiler/.../planner property fetch)."""
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _wgraph(spark)

    ast = parse_cypher(
        "MATCH (a:person)-[r:knows]->(b:person) WHERE r.w >= 12 "
        "RETURN a.id AS aid, r.w AS w"
    )
    assert ast["edge_vars"] == {"r": 0}

    rows = sorted(
        (r["aid"], r["w"])
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) WHERE r.w >= 12 "
            "RETURN a.id AS aid, r.w AS w",
        ).collect()
    )
    assert rows == [(1, 12), (2, 23), (3, 34)]

    # edge prop × vertex prop post-predicate + aggregate over r.w
    got = cypher_property(
        pg,
        "MATCH (a:person)-[r:knows]->(b:person) WHERE r.w > a.id "
        "RETURN sum(r.w) AS tot, count(*) AS n",
    ).collect()[0]
    # edges with w > a.id: (1,2,12),(2,3,23),(3,4,34),(0,2,2),(0,1,1)
    assert (got["tot"], got["n"]) == (72, 5)

    # grouping key from an edge property; undirected orientation binds both
    # ways so each edge contributes twice
    got = {
        (r["w"], r["n"])
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]-(b:person) WHERE r.w <= 2 "
            "RETURN r.w AS w, count(*) AS n",
        ).collect()
    }
    assert got == {(1, 2), (2, 2)}

    # two relationship variables on one path
    rows = sorted(
        (r["w1"], r["w2"])
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r1:knows]->(b:person)-[r2:knows]->(c:person) "
            "WHERE r1.w < r2.w RETURN r1.w AS w1, r2.w AS w2",
        ).collect()
    )
    assert rows == [(1, 12), (2, 23), (12, 23), (23, 34)]


def test_cypher_edge_properties_errors(spark):
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _wgraph(spark)
    with pytest.raises(ValueError, match="no propert"):
        cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) RETURN r.missing AS m",
        )
    with pytest.raises(ValueError, match="bare relationship"):
        parse_cypher("MATCH (a)-[r]->(b) RETURN r")
    with pytest.raises(ValueError, match="bare relationship"):
        parse_cypher("MATCH (a)-[r]->(b) WHERE r > 3 RETURN count(*) AS n")
    with pytest.raises(ValueError, match="already bound"):
        parse_cypher("MATCH (a)-[r]->(b)-[r]->(c) RETURN count(*) AS n")
    with pytest.raises(ValueError, match="node tag and a"):
        parse_cypher("MATCH (a)-[b]->(b) RETURN count(*) AS n")
    with pytest.raises(ValueError, match="variable-length"):
        parse_cypher("MATCH (a)-[r*1..3]->(b) RETURN count(*) AS n")


def test_cypher_arithmetic(spark):
    """Arithmetic operands in WHERE and `expr AS alias` RETURN items
    (GIE's expression language, common/expr.proto arithmetic)."""
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _wgraph(spark)

    # WHERE arithmetic both sides, precedence, pushdown (single-tag conjunct
    # with arithmetic still pushes to the vertex/edge table)
    rows = sorted(
        r["aid"]
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) "
            "WHERE a.age * 2 - 60 >= 4 RETURN a.id AS aid",
        ).collect()
    )
    # age*2-60 = 2*id >= 4 → id >= 2 → sources 2, 3
    assert rows == [2, 3]

    # edge-scan pushdown with arithmetic: w % 10 = 2 → w ∈ {12, 2}
    rows = sorted(
        r["w"]
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) "
            "WHERE r.w % 10 = 2 RETURN r.w AS w",
        ).collect()
    )
    assert rows == [2, 12]

    # RETURN expression items: vertex prop, edge prop, mixed, unary minus
    got = {
        (r["aid"], r["dw"], r["neg"])
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) WHERE a.id = 0 "
            "RETURN a.id AS aid, r.w * 10 + a.age AS dw, -a.id AS neg",
        ).collect()
    }
    assert got == {(0, 40, 0), (0, 50, 0)}

    # implicit grouping over an expression key
    got = {
        (r["bucket"], r["n"])
        for r in cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]->(b:person) "
            "RETURN r.w % 10 AS bucket, count(*) AS n",
        ).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 1), (4, 1)}

    # parse shapes
    ast = parse_cypher(
        "MATCH (a)-->(b) WHERE a.id + 1 < b.id * 2 RETURN count(*) AS n"
    )
    assert ast["where"] == [
        (
            "cmp",
            ("arith", "+", ("prop", "a", "id"), ("lit", 1)),
            "<",
            ("arith", "*", ("prop", "b", "id"), ("lit", 2)),
        )
    ]

    # errors: expression items need an alias; unbound tags inside arithmetic
    with pytest.raises(ValueError, match="unsupported"):
        parse_cypher("MATCH (a)-->(b) RETURN a.id + 1")
    with pytest.raises(ValueError, match="unbound tag"):
        parse_cypher("MATCH (a)-->(b) WHERE a.id + q.x > 1 RETURN a")
    with pytest.raises(ValueError, match="unsupported"):
        parse_cypher("MATCH (a)-->(b) WHERE a.id ++ 1 > 1 RETURN a")


# ---------------------------------------------------------------------------
# r4 session 3: IS NULL / EXISTS / UNWIND (supported_cypher.md parity)
# ---------------------------------------------------------------------------


def test_cypher_is_null_with_optional(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # persons nobody knows: OPTIONAL MATCH then keep the null bindings
    rows = cypher_property(
        pg,
        "MATCH (a:person) OPTIONAL MATCH (b:person)-[:knows]->(a) "
        "WHERE b IS NULL RETURN a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [0]
    # IS NOT NULL keeps only matched rows (≡ inner join)
    rows = cypher_property(
        pg,
        "MATCH (a:person) OPTIONAL MATCH (b:person)-[:knows]->(a) "
        "WHERE b IS NOT NULL RETURN DISTINCT a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [1, 2, 3, 4]


def test_cypher_is_null_on_property_not_pushed(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # b.age IS NULL with OPTIONAL b: keeps exactly the unmatched rows —
    # would be wrong if pushed into the vertex scan (every person has age)
    rows = cypher_property(
        pg,
        "MATCH (a:person) OPTIONAL MATCH (b:person)-[:knows]->(a) "
        "WHERE b.age IS NULL RETURN a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [0]
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(c:person) "
        "WHERE a.age IS NOT NULL RETURN count(*) AS n",
    ).collect()
    assert rows[0]["n"] == 5


def test_cypher_exists_semi_anti(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # persons who know someone AND work somewhere
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE EXISTS((a)-[:knows]->(x)) "
        "AND EXISTS((a)-[:works_at]->(y)) RETURN a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [0, 1, 2, 3]
    # NOT EXISTS: persons nobody knows (anti join)
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE NOT EXISTS((x:person)-[:knows]->(a)) "
        "RETURN a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [0]
    # both endpoints bound: knows pairs that are NOT coworkers
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person), (a)-[:works_at]->(c), "
        "(b)-[:works_at]->(d) WHERE NOT EXISTS((b)-[:works_at]->(c)) "
        "RETURN a.id AS aid, b.id AS bid",
    ).collect()
    assert sorted((r["aid"], r["bid"]) for r in rows) == [(0, 2), (1, 2)]
    # reversed arrow form
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE EXISTS((a)<-[:knows]-(x)) "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0]["n"] == 4
    # mixes with plain predicates in the same WHERE
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE a.age >= 31 AND "
        "EXISTS((a)-[:knows]->(x)) RETURN a.id AS pid",
    ).collect()
    assert sorted(r["pid"] for r in rows) == [1, 2, 3]


def test_cypher_exists_null_optional_semantics(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # unmatched optional tag (null) never satisfies EXISTS; NOT EXISTS
    # keeps it — Cypher null semantics through semi/anti joins
    rows = cypher_property(
        pg,
        "MATCH (a:person) OPTIONAL MATCH (a)-[:knows]->(b:person) "
        "WHERE NOT EXISTS((b)-[:works_at]->(y)) RETURN a.id AS pid, b.id AS bid",
    ).collect()
    # every matched b (1,2,3,4) works somewhere → dropped; only the
    # unmatched optional binding (a=4, b=null) survives NOT EXISTS
    assert [(r["pid"], r["bid"]) for r in rows] == [(4, None)]


def test_cypher_exists_errors(spark):
    import pytest as _pytest

    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _pgraph(spark)
    with _pytest.raises(ValueError, match="top-level"):
        parse_cypher(
            "MATCH (a) WHERE a.age > 1 OR EXISTS((a)-->(b)) RETURN a"
        )
    with _pytest.raises(ValueError, match="bound tag"):
        cypher_property(
            pg, "MATCH (a:person) WHERE EXISTS((x)-[:knows]->(y)) RETURN a"
        )
    with _pytest.raises(ValueError, match="single fixed-length"):
        parse_cypher("MATCH (a) WHERE EXISTS((a)-[*1..2]->(b)) RETURN a")
    with _pytest.raises(ValueError, match="EXISTS requires cypher_property"):
        from graphscope_spark.operators.cypher import parse_match

        parse_match("MATCH (a)-->(b) WHERE EXISTS((a)-->(c)) RETURN a")


def test_cypher_unwind(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # collect → UNWIND round-trips the group elements
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a AS a, collect(b) AS bs UNWIND bs AS x "
        "RETURN a AS a, x AS x",
    ).collect()
    want = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) RETURN a AS a, b AS x",
    ).collect()
    assert sorted((r["a"], r["x"]) for r in rows) == sorted(
        (r["a"], r["x"]) for r in want
    )
    # literal list UNWIND multiplies the stream
    rows = cypher_property(
        pg,
        "MATCH (a:person) UNWIND [1, 2, 3] AS k "
        "RETURN a.id AS pid, k AS k",
    ).collect()
    assert len(rows) == 15
    assert sorted({r["k"] for r in rows}) == [1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown name"):
        cypher_property(pg, "MATCH (a:person) UNWIND zs AS x RETURN x AS x")
    with _pytest.raises(ValueError, match="already bound"):
        cypher_property(
            pg, "MATCH (a:person) UNWIND [1] AS a RETURN a AS a"
        )


def test_cypher_call_procedures(spark):
    import json

    from graphscope_spark.operators.cypher import cypher, cypher_call

    g = _rand_graph(spark)
    # CALL dispatches through the ProcedureCall registry; equals the
    # direct algorithm invocation
    from graphscope_spark.algorithms.wcc import wcc

    got = {
        (r[0], r[1]) for r in cypher(g, "CALL wcc()").collect()
    }
    want = {(r[0], r[1]) for r in wcc(g).collect()}
    assert got == want
    # literal args + YIELD projection
    df = cypher_call(g, "CALL bfs(0) YIELD id")
    assert df.columns == ["id"]
    # meta procedures (FLEX-shaped JSON)
    sch = json.loads(
        cypher_call(g, "CALL gs.procedure.meta.schema()").collect()[0][
            "schema"
        ]
    )
    assert sch["vertex_types"][0]["type_name"] == "_default"
    st = json.loads(
        cypher_call(g, "CALL gs.procedure.meta.statistics()").collect()[0][
            "statistics"
        ]
    )
    assert st["total_vertex_count"] == 30
    assert st["total_edge_count"] == 90
    import pytest as _pytest

    with _pytest.raises(KeyError, match="unknown procedure"):
        cypher_call(g, "CALL nope()")
    with _pytest.raises(ValueError, match="literals"):
        cypher_call(g, "CALL wcc(x)")


def test_cypher_call_property_graph_meta(spark):
    import json

    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    sch = json.loads(
        cypher_property(pg, "CALL gs.procedure.meta.schema()").collect()[0][
            "schema"
        ]
    )
    assert [t["type_name"] for t in sch["vertex_types"]] == [
        "company", "person",
    ]
    assert sch["edge_types"][0]["vertex_type_pair_relations"] == [
        {"source_vertex": "person", "destination_vertex": "person"}
    ]
    st = json.loads(
        cypher_property(
            pg, "CALL gs.procedure.meta.statistics()"
        ).collect()[0]["statistics"]
    )
    assert st["vertex_type_statistics"] == {"company": 2, "person": 5}
    assert st["total_edge_count"] == 10


def test_cypher_labels_type_elementid(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[r:works_at]->(c) "
        "RETURN elementId(a) AS eid, labels(c) AS clab, type(r) AS t",
    ).collect()
    assert {(r["eid"], r["clab"], r["t"]) for r in rows} == {
        (i, "company", "works_at") for i in range(5)
    }
    # labels() over an unlabeled tag joins the label-union table
    rows = cypher_property(
        pg, "MATCH (a:person)-[:knows]->(b) RETURN labels(b) AS l, count(*) AS n"
    ).collect()
    assert [(r["l"], r["n"]) for r in rows] == [("person", 5)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labeled relationship"):
        cypher_property(pg, "MATCH (a:person)-[r]->(b) RETURN type(r) AS t")
    with _pytest.raises(ValueError, match="relationship variable"):
        cypher_property(pg, "MATCH (a:person)-[:knows]->(b) RETURN type(a) AS t")


def test_cypher_collect_distinct_and_power(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # collect(DISTINCT): the set of employers per knower (0 knows 1,2 who
    # both... 1->100, 2->101)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person)-[:works_at]->(c) "
        "RETURN a AS a, collect(DISTINCT c) AS cs",
    ).collect()
    got = {(r["a"], tuple(r["cs"])) for r in rows}
    assert (0, (100, 101)) in got  # 0 knows 1 (→100) and 2 (→101)
    # plain collect keeps duplicates; DISTINCT collapses them
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c) "
        "RETURN c AS c, collect(DISTINCT c) AS cs, collect(c) AS cl",
    ).collect()
    for r in rows:
        assert len(r["cs"]) == 1 and len(r["cl"]) >= 1
    # exponentiation: right-assoc, tighter than *
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE a.id = 2 "
        "RETURN a.id ^ 3 AS cube, 2 * a.id ^ 2 AS twice_sq",
    ).collect()
    assert rows[0]["cube"] == 8.0
    assert rows[0]["twice_sq"] == 8.0
    rows = cypher_property(
        pg,
        "MATCH (a:person) WHERE a.age ^ 2 > 1000 RETURN count(*) AS n",
    ).collect()
    assert rows[0]["n"] == 3  # ages 32,33,34 square past 1000


def test_cypher_path_and_edge_functions(spark):
    """nodes(p)/relationships(p)/startNode(r)/endNode(r) — the
    supported_cypher.md UDF rows (gs.function.*)."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH p = shortestPath((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 AND b.id = 4 "
        "RETURN nodes(p) AS ns, relationships(p) AS rs, length(p) AS len",
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(r["ns"]) == [0, 2, 3, 4]
    assert [(x["src"], x["dst"]) for x in r["rs"]] == [(0, 2), (2, 3), (3, 4)]
    assert r["len"] == 3

    rows = cypher_property(
        pg,
        "MATCH (a:person)-[r:knows]->(b:person) WHERE a.id = 0 "
        "RETURN startNode(r) AS s, endNode(r) AS e ORDER BY e",
    ).collect()
    assert [(x["s"], x["e"]) for x in rows] == [(0, 1), (0, 2)]

    # <-[r]- pattern: sentences normalize to src->dst, startNode follows
    # the EDGE direction, not the pattern's textual order
    rows = cypher_property(
        pg,
        "MATCH (b:person)<-[r:knows]-(a:person) WHERE a.id = 0 "
        "RETURN startNode(r) AS s, endNode(r) AS e ORDER BY e",
    ).collect()
    assert [(x["s"], x["e"]) for x in rows] == [(0, 1), (0, 2)]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="shortestPath variable"):
        cypher_property(pg, "MATCH (a:person) RETURN nodes(a) AS x")
    with _pytest.raises(ValueError, match="relationship variable"):
        cypher_property(
            pg, "MATCH (a:person)-[:knows]->(b) RETURN startNode(a) AS x"
        )
    with _pytest.raises(ValueError, match="undirected"):
        cypher_property(
            pg,
            "MATCH (a:person)-[r:knows]-(b:person) "
            "RETURN startNode(r) AS s",
        )


def test_cypher_datetime_literal_and_extract(spark):
    """datetime(<epoch-ms>) literals and <temporal>.<interval> extraction
    (supported_cypher.md UDF + Extract rows) over a timestamp property."""
    from datetime import datetime

    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    ev = spark.createDataFrame(
        [
            (0, datetime(2020, 1, 15, 10, 30, 0)),
            (1, datetime(2021, 6, 1, 5, 0, 0)),
            (2, datetime(2022, 12, 31, 23, 59, 59)),
        ],
        "id long, created timestamp",
    )
    follows = spark.createDataFrame(
        [(0, 1), (1, 2)], "src long, dst long"
    )
    pg = (
        PropertyGraph()
        .add_vertices("event", ev)
        .add_edges("follows", "event", "event", follows)
    )
    # datetime(1606780800000) = 2020-12-01T00:00:00Z; WHERE pushes to scan
    cutoff = 1606780800000
    rows = cypher_property(
        pg,
        f"MATCH (e:event) WHERE e.created > datetime({cutoff}) "
        "RETURN e.id AS id",
    ).collect()
    assert sorted(r["id"] for r in rows) == [1, 2]
    # interval extraction in WHERE and RETURN
    rows = cypher_property(
        pg,
        "MATCH (e:event) WHERE e.created.year = 2021 "
        "RETURN e.id AS id, e.created.month AS m",
    ).collect()
    assert [(r["id"], r["m"]) for r in rows] == [(1, 6)]
    rows = cypher_property(
        pg,
        "MATCH (e:event)-[:follows]->(f:event) "
        "WHERE f.created.year - e.created.year >= 1 "
        "RETURN e.id AS src_id, f.created.day AS d ORDER BY src_id",
    ).collect()
    assert [(r["src_id"], r["d"]) for r in rows] == [(0, 1), (1, 31)]
    # RETURN item form: extraction AS alias
    rows = cypher_property(
        pg,
        "MATCH (e:event) RETURN e.created.hour AS h",
    ).collect()
    assert sorted(r["h"] for r in rows) == [5, 10, 23]


def test_cypher_duration_arithmetic(spark):
    """Temporal Mathematical rows (supported_cypher.md:77-83): temporal ±
    duration, temporal − temporal → milliseconds, duration ± duration,
    duration × ÷ numeric — all lowered to epoch-millisecond arithmetic."""
    from datetime import datetime

    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    ev = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 0, 0, 0)),
            (1, datetime(2024, 1, 1, 0, 5, 0)),
            (2, datetime(2024, 1, 1, 1, 5, 0)),
            (3, datetime(2024, 1, 2, 1, 5, 0)),
        ],
        "id long, created timestamp",
    )
    nxt = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    pg = (
        PropertyGraph()
        .add_vertices("event", ev)
        .add_edges("next", "event", "event", nxt)
    )
    # <temporal> - <temporal> → duration in ms (RETURN), and
    # duration({...}) map-form literals as comparison operands (WHERE)
    rows = cypher_property(
        pg,
        "MATCH (a:event)-[:next]->(b:event) "
        "WHERE b.created - a.created > duration({minutes: 30}) "
        "RETURN a.id AS eid, b.created - a.created AS gap_ms",
    ).collect()
    assert sorted((r["eid"], r["gap_ms"]) for r in rows) == [
        (1, 3_600_000), (2, 86_400_000),
    ]
    # <temporal> ± <duration> in WHERE: shift a datetime() literal
    rows = cypher_property(
        pg,
        "MATCH (e:event) "
        # 2024-01-01T01:00:00Z + 5min = 01:05 → events 2,3 qualify (>=)
        "WHERE e.created >= datetime(1704070800000) + duration({minutes: 5}) "
        "RETURN e.id AS eid",
    ).collect()
    assert sorted(r["eid"] for r in rows) == [2, 3]
    rows = cypher_property(
        pg,
        "MATCH (e:event) "
        # 2024-01-02T01:05:00Z - 1 day = Jan 1 01:05 → events 0,1 are before
        "WHERE e.created < datetime(1704157500000) - duration({days: 1}) "
        "RETURN e.id AS eid",
    ).collect()
    assert sorted(r["eid"] for r in rows) == [0, 1]
    # <temporal> + <duration> as a RETURN projection stays a timestamp
    rows = cypher_property(
        pg,
        "MATCH (e:event) WHERE e.id = 0 "
        "RETURN e.created + duration({hours: 2, minutes: 30}) AS shifted",
    ).collect()
    assert rows[0]["shifted"] == datetime(2024, 1, 1, 2, 30, 0)
    # duration arithmetic: dur ± dur, dur * num, dur / num (bigint ms),
    # bare-ms duration(<n>) form, and unary minus
    rows = cypher_property(
        pg,
        "MATCH (e:event) WHERE e.id = 0 RETURN "
        "duration({days: 1}) + duration(500) AS a, "
        "duration({hours: 1}) - duration({minutes: 30}) AS b, "
        "duration({minutes: 1}) * 3 AS c, "
        "duration({hours: 2}) / 4 AS d, "
        "- duration(250) AS e",
    ).collect()
    r = rows[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (
        86_400_500, 1_800_000, 180_000, 1_800_000, -250,
    )
    # undefined typings refuse loudly
    import pytest as _pytest

    for bad, msg in [
        ("RETURN e.created + datetime(0) AS x", "temporal [+] temporal"),
        ("RETURN duration(1) * duration(2) AS x", "duration [*] duration"),
        ("RETURN 5 / duration(1) AS x", "numeric / duration"),
        ("RETURN duration({months: 1}) AS x", "unsupported duration unit"),
    ]:
        with _pytest.raises(ValueError, match=msg):
            cypher_property(pg, f"MATCH (e:event) WHERE e.id = 0 {bad}")


def test_cypher_xor(spark):
    """XOR boolean row (supported_cypher.md:97): NOT > AND > XOR > OR
    precedence; lowered to boolean inequality."""
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    person = spark.createDataFrame(
        [(0, 10, 1), (1, 20, 1), (2, 10, 2), (3, 20, 2)],
        "id long, age long, grp long",
    )
    knows = spark.createDataFrame([(0, 1)], "src long, dst long")
    pg = (
        PropertyGraph()
        .add_vertices("person", person)
        .add_edges("knows", "person", "person", knows)
    )

    def ids(q):
        return sorted(
            r["eid"]
            for r in cypher_property(
                pg, f"MATCH (a:person) WHERE {q} RETURN a.id AS eid"
            ).collect()
        )

    # exactly-one-of
    assert ids("a.age = 10 XOR a.grp = 1") == [1, 2]
    # AND binds tighter than XOR: (age=10 AND grp=1) XOR grp=2 → {0, 2, 3}
    assert ids("a.age = 10 AND a.grp = 1 XOR a.grp = 2") == [0, 2, 3]
    # XOR binds tighter than OR: age=20 OR (grp=1 XOR grp=2) → everyone
    assert ids("a.age = 20 OR a.grp = 1 XOR a.grp = 2") == [0, 1, 2, 3]
    # NOT applies to the factor only
    assert ids("NOT a.age = 10 XOR a.grp = 1") == [0, 3]


def test_cypher_list_literal_projection(spark):
    """ListLiteral row (supported_cypher.md:107): [expr, …] AS alias folds
    element expressions into one array column; commas inside the brackets
    never split the RETURN items."""
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    person = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 30)], "id long, age long"
    )
    knows = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    pg = (
        PropertyGraph()
        .add_vertices("person", person)
        .add_edges("knows", "person", "person", knows)
    )
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "RETURN [a.id, b.id] AS pair, [a.age + b.age, 7] AS vals, b.id AS bid",
    ).collect()
    got = sorted((tuple(r["pair"]), tuple(r["vals"]), r["bid"]) for r in rows)
    assert got == [((0, 1), (30, 7), 1), ((1, 2), (50, 7), 2)]
    # UNWIND-ing a projected list still works via the literal form
    with pytest.raises(ValueError, match="empty list literal"):
        cypher_property(
            pg, "MATCH (a:person) RETURN [] AS nothing"
        )


def test_cypher_all_shortest_paths(spark):
    """allShortestPaths(...) (supported_cypher.md ALL SHORTEST row): one
    row PER minimal-hop path, vs shortestPath's single representative."""
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.operators.cypher import cypher_property

    # diamond 0->{1,2}->3 plus a longer detour 0->4->5->3: exactly two
    # 2-hop shortest paths 0..3, the detour never binds
    person = spark.createDataFrame(
        [(i, 30 + i) for i in range(6)], "id long, age long"
    )
    knows = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (4, 5), (5, 3)],
        "src long, dst long",
    )
    pg = (
        PropertyGraph()
        .add_vertices("person", person)
        .add_edges("knows", "person", "person", knows)
    )
    rows = cypher_property(
        pg,
        "MATCH p = allShortestPaths((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 AND b.id = 3 "
        "RETURN length(p) AS len, p",
    ).collect()
    assert sorted(tuple(r["p"]) for r in rows) == [(0, 1, 3), (0, 2, 3)]
    assert [r["len"] for r in rows] == [2, 2]
    # singular shortestPath picks ONE deterministic representative
    rows1 = cypher_property(
        pg,
        "MATCH p = shortestPath((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 AND b.id = 3 "
        "RETURN p",
    ).collect()
    assert len(rows1) == 1
    # aggregation over path multiplicity: count of shortest paths per pair
    rows = cypher_property(
        pg,
        "MATCH p = allShortestPaths((a:person)-[:knows*..6]->(b:person)) "
        "WHERE a.id = 0 "
        "RETURN b.id AS bid, count(*) AS n_paths ORDER BY bid",
    ).collect()
    # bid=0 is the 0-hop self binding — same min-depth-includes-0
    # semantics as the singular shortestPath (its BFS forest roots at
    # depth 0)
    assert [(r["bid"], r["n_paths"]) for r in rows] == [
        (0, 1), (1, 1), (2, 1), (3, 2), (4, 1), (5, 1),
    ]


def test_cypher_case_when(spark):
    """Searched CASE WHEN (supported_cypher.md Branch row): multi-branch
    string results, keyword text inside string literals left alone."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    res = cypher_property(
        pg,
        "MATCH (a:person) RETURN a.id AS aid, "
        "CASE WHEN a.age < 32 THEN 'when young' "
        "WHEN a.age < 34 THEN 'mid' ELSE 'else old' END AS band",
    )
    got = {r["aid"]: r["band"] for r in res.collect()}
    assert got == {
        0: "when young", 1: "when young", 2: "mid", 3: "mid", 4: "else old",
    }


def test_cypher_case_no_else_and_value_exprs(spark):
    """No ELSE -> NULL (Cypher semantics); arithmetic in both the
    predicate and the result value."""
    from graphscope_spark.operators.cypher import cypher_property

    res = cypher_property(
        _pgraph(spark),
        "MATCH (a:person) RETURN "
        "CASE WHEN a.age % 2 = 0 THEN a.age * 10 END AS v",
    )
    vals = [r["v"] for r in res.collect()]
    assert sorted(v for v in vals if v is not None) == [300, 320, 340]
    assert vals.count(None) == 2


def test_cypher_case_as_grouping_key(spark):
    """CASE in the grouping position: keys and aggregates coexist."""
    from graphscope_spark.operators.cypher import cypher_property

    res = cypher_property(
        _pgraph(spark),
        "MATCH (a:person) RETURN "
        "CASE WHEN a.age < 33 THEN 0 ELSE 1 END AS b, count(*) AS n",
    )
    assert sorted((r["b"], r["n"]) for r in res.collect()) == [(0, 3), (1, 2)]


def test_cypher_case_errors(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # bare CASE with neither a test operand nor WHEN
    with pytest.raises(ValueError, match="CASE"):
        cypher_property(
            pg, "MATCH (a:person) RETURN CASE a.age END AS x"
        )
    # WHEN without THEN
    with pytest.raises(ValueError, match="THEN"):
        cypher_property(
            pg, "MATCH (a:person) RETURN CASE WHEN a.age < 33 END AS x"
        )
    # ELSE must be last and unique
    with pytest.raises(ValueError, match="ELSE"):
        cypher_property(
            pg,
            "MATCH (a:person) RETURN CASE WHEN a.age < 33 THEN 1 "
            "ELSE 2 ELSE 3 END AS x",
        )
    # alias mandatory (no END ... AS -> not a CASE item at all)
    with pytest.raises(ValueError, match="unsupported"):
        cypher_property(
            pg, "MATCH (a:person) RETURN CASE WHEN a.age < 33 THEN 1 END"
        )


def test_cypher_map_literal(spark):
    """{k: expr, ...} MapLiteral (supported_cypher.md MapLiteral row) ->
    named struct; heterogeneous value types survive."""
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.id = 0 "
        "RETURN {src: a.id, dstage: b.age + 1, tag: 'x'} AS m, b.id AS bid",
    ).collect()
    got = sorted(
        ((r["m"].asDict(), r["bid"]) for r in rows), key=lambda t: t[1]
    )
    assert got == [
        ({"src": 0, "dstage": 32, "tag": "x"}, 1),
        ({"src": 0, "dstage": 33, "tag": "x"}, 2),
    ]
    with pytest.raises(ValueError, match="map-literal"):
        cypher_property(pg, "MATCH (a:person) RETURN {3: a.id} AS m")
    with pytest.raises(ValueError, match="empty map"):
        cypher_property(pg, "MATCH (a:person) RETURN {} AS m")


def test_cypher_line_comments(spark):
    """`//` comments (supported_cypher.md Keyword/Comments row) are stripped
    outside string literals; `//` inside a quoted string survives."""
    from graphscope_spark.operators.cypher import cypher_property, parse_cypher

    pg = _pgraph(spark)
    n = cypher_property(
        pg,
        "// leading comment\n"
        "MATCH (a:person)-[:knows]->(b:person) // trailing comment\n"
        "WHERE a.age <= 31  // filter young\n"
        "RETURN count(*) AS n",
    ).collect()[0]["n"]
    assert n == 3

    ast = parse_cypher(
        "MATCH (a:person) WHERE a.name = 'http://x' // real comment\n"
        "RETURN a.name AS nm"
    )
    assert ast["where"] == [
        ("cmp", ("prop", "a", "name"), "=", ("lit", "http://x"))
    ]


def test_cypher_case_simple_form(spark):
    """Simple CASE `CASE expr WHEN value THEN …` lowers to equality
    predicates on the test operand (supported_cypher.md Branch row)."""
    from graphscope_spark.operators.cypher import cypher_property

    res = cypher_property(
        _pgraph(spark),
        "MATCH (a:person) RETURN a.id AS aid, "
        "CASE a.age % 2 WHEN 0 THEN 'even' WHEN 1 THEN 'odd' END AS par",
    )
    got = {r["aid"]: r["par"] for r in res.collect()}
    # ages 30..34 for ids 0..4
    assert got == {0: "even", 1: "odd", 2: "even", 3: "odd", 4: "even"}


# ---------------------------------------------------------------------------
# MATCH-after-WITH pipeline continuations (LDBC-BI composition: aggregate,
# then keep matching) — supported_cypher.md WITH-clause pipelines
# ---------------------------------------------------------------------------


def test_cypher_continuation_agg_then_match(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg "
        "MATCH (a)-[:works_at]->(c:company) "
        "RETURN a, deg, c.size AS csize",
    ).collect()
    got = {(r["a"], r["deg"], r["csize"]) for r in rows}
    assert got == {(0, 2, 10), (1, 1, 10), (2, 1, 2000), (3, 1, 2000)}


def test_cypher_continuation_chained_and_filtered(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # two continuations chained; suffix WHERE mixes a pre-bound alias and
    # a pattern property
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg "
        "MATCH (a)-[:works_at]->(c:company) "
        "WITH c, sum(deg) AS total "
        "MATCH (x:person)-[:works_at]->(c) "
        "RETURN c, total, count(*) AS emp",
    ).collect()
    assert {(r["c"], r["total"], r["emp"]) for r in rows} == {
        (100, 3, 2),
        (101, 2, 3),
    }
    rows2 = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg "
        "MATCH (a)-[:works_at]->(c:company) "
        "WHERE deg >= 2 OR c.size > 100 "
        "RETURN a, deg, c",
    ).collect()
    assert {(r["a"], r["deg"], r["c"]) for r in rows2} == {
        (0, 2, 100),
        (2, 1, 101),
        (3, 1, 101),
    }


def test_cypher_continuation_with_where_stage(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # WITH … WHERE (HAVING scope) … MATCH
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) "
        "WITH a, count(*) AS deg WHERE deg >= 2 "
        "MATCH (a)-[:works_at]->(c:company) RETURN a, deg, c",
    ).collect()
    assert {(r["a"], r["deg"], r["c"]) for r in rows} == {(0, 2, 100)}


def test_cypher_continuation_cartesian_when_disjoint(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WITH count(*) AS total "
        "MATCH (c:company) RETURN c, total",
    ).collect()
    assert {(r["c"], r["total"]) for r in rows} == {(100, 5), (101, 5)}


def test_cypher_continuation_optional_match(spark):
    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    # OPTIONAL MATCH continuation: unmatched aggregate rows survive with
    # null pattern bindings; the WHERE scopes to the pattern (pre-join)
    rows = cypher_property(
        pg,
        "MATCH (a:person)-[:works_at]->(c:company) "
        "WITH c, count(*) AS emp "
        "OPTIONAL MATCH (c)<-[:works_at]-(x:person) "
        "WHERE x.age > 32 "
        "RETURN c, emp, x",
    ).collect()
    assert {(r["c"], r["emp"], r["x"]) for r in rows} == {
        (100, 2, None),
        (101, 3, 3),
        (101, 3, 4),
    }


def test_cypher_continuation_errors(spark):
    import pytest

    from graphscope_spark.operators.cypher import cypher_property

    pg = _pgraph(spark)
    with pytest.raises(ValueError, match="needs an AS alias"):
        cypher_property(
            pg, "MATCH (a:person) WITH a.age + 1 MATCH (c:company) RETURN c"
        )
    with pytest.raises(ValueError, match="share at least one name"):
        cypher_property(
            pg,
            "MATCH (a:person) WITH a AS x "
            "OPTIONAL MATCH (c:company) RETURN c, x",
        )
    with pytest.raises(ValueError, match="pattern names"):
        cypher_property(
            pg,
            "MATCH (a:person)-[:knows]->(b:person) WITH a, count(*) AS deg "
            "OPTIONAL MATCH (a)-[:works_at]->(c:company) "
            "WHERE deg > 1 AND c <> a RETURN a, deg, c",
        )
