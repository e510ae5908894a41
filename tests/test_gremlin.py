"""Gremlin-subset frontend: traversal strings == the operator DAG."""

from __future__ import annotations

import random

import pytest

from tests.conftest import make_graph

from graphscope_spark.operators.gremlin import gremlin, parse_gremlin
from graphscope_spark.operators.match import match


def _rand_graph(spark, n=30, m=90, seed=7):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    return make_graph(spark, sorted(edges), vertices=list(range(n)))


def test_parse_shapes():
    steps = parse_gremlin(
        "g.V(1, 2).out('knows').has('id', P.lt(10)).as('v')"
        ".where(eq('v')).dedup('v').groupCount().by(select('v'))"
    )
    assert [s[0] for s in steps] == [
        "V", "out", "has", "as", "where", "dedup", "groupCount", "by",
    ]
    assert steps[0][1] == [("num", 1), ("num", 2)]
    assert steps[1][1] == [("str", "knows")]
    assert steps[2][1] == [("str", "id"), ("lt", [("num", 10)])]
    assert parse_gremlin("g.E().count()")[0] == ("E", [])
    with pytest.raises(ValueError, match="start with g.V"):
        parse_gremlin("V().count()")
    # outE parses as an anonymous step; repeat() rejects it at execution
    assert parse_gremlin("g.V().repeat(out('knows')).times(3)")[1] == (
        "repeat", [("step", ("out", [("str", "knows")]))]
    )


def test_gremlin_count_equals_edges(spark):
    g = _rand_graph(spark)
    n = gremlin(g, "g.V().out().count()").collect()[0]["count"]
    assert n == g.edges.count()


def test_gremlin_triangle_equals_match(spark):
    g = _rand_graph(spark)
    want = match(
        g, [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")]
    ).count()
    got = gremlin(
        g, "g.V().as('a').out().as('c').in().as('b').out().where(eq('a')).count()"
    ).collect()[0]["count"]
    assert got == want


def test_gremlin_has_and_ids(spark):
    g = _rand_graph(spark)
    rows = gremlin(g, "g.V().has('id', lt(5)).as('x').out().select('x')").collect()
    srcs = {r["x"] for r in rows}
    want = {
        r["src"] for r in g.edges.filter("src < 5").select("src").collect()
    }
    assert srcs == want
    n = gremlin(g, "g.V(0, 1, 2).count()").collect()[0]["count"]
    assert n == 3


def test_gremlin_two_hop_dedup_group(spark):
    g = _rand_graph(spark)
    rows = gremlin(
        g,
        "g.V().has('id', lt(5)).as('v').out().out().as('y')"
        ".dedup('v','y').groupCount().by(select('v'))",
    ).collect()
    got = {(r["v"], r["count"]) for r in rows}
    e = [(r["src"], r["dst"]) for r in g.edges.collect()]
    import collections

    two = collections.defaultdict(set)
    for a, b in e:
        if a < 5:
            for b2, c in e:
                if b2 == b:
                    two[a].add(c)
    assert got == {(v, len(s)) for v, s in two.items()}


def test_gremlin_property_graph(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(i, 30 + i) for i in range(5)], "id long, age long"
    )
    company = spark.createDataFrame([(100, 10), (101, 2000)], "id long, size long")
    knows = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    works = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 101)], "src long, dst long"
    )
    pg = (
        PropertyGraph()
        .add_vertices("person", person)
        .add_vertices("company", company)
        .add_edges("knows", "person", "person", knows)
        .add_edges("works_at", "person", "company", works)
    )
    # label-restricted expansion + property predicate + values()
    vals = gremlin(
        pg, "g.V().hasLabel('person').has('age', lte(31)).out('works_at').values('size')"
    ).collect()
    assert sorted(v["size"] for v in vals) == [10, 10]
    n = gremlin(pg, "g.V().out('knows').count()").collect()[0]["count"]
    assert n == 3
    with pytest.raises(ValueError, match="no vertex label has property"):
        gremlin(pg, "g.V().has('salary', gt(1))").collect()


def test_gremlin_simple_graph_rejects_labels(spark):
    g = _rand_graph(spark)
    with pytest.raises(ValueError, match="PropertyGraph"):
        gremlin(g, "g.V().out('knows').count()")
    with pytest.raises(ValueError, match="PropertyGraph"):
        gremlin(g, "g.V().hasLabel('x').count()")


def test_gremlin_repeat_times(spark):
    g = _rand_graph(spark)
    want = gremlin(g, "g.V().has('id', lt(5)).out().out().count()").collect()[0][
        "count"
    ]
    got = gremlin(
        g, "g.V().has('id', lt(5)).repeat(out()).times(2).count()"
    ).collect()[0]["count"]
    assert got == want
    with pytest.raises(ValueError, match=r"times\(n\) and/or"):
        gremlin(g, "g.V().repeat(out()).count()")
    with pytest.raises(ValueError, match="must follow repeat"):
        gremlin(g, "g.V().times(2).count()")
    with pytest.raises(ValueError, match="must follow repeat"):
        gremlin(g, "g.V().until(hasId(3)).count()")
    with pytest.raises(ValueError, match="must follow repeat"):
        gremlin(g, "g.V().emit().count()")


def test_gremlin_simple_graph_property_has_raises(spark):
    """has()/values() on a simple Graph must not silently reinterpret a
    named property as the vertex id."""
    g = _rand_graph(spark)
    with pytest.raises(ValueError, match="needs a PropertyGraph"):
        gremlin(g, "g.V().has('age', gt(3)).count()").collect()
    with pytest.raises(ValueError, match="needs a PropertyGraph"):
        gremlin(g, "g.V().values('name')").collect()
    with pytest.raises(ValueError, match="one integer argument"):
        gremlin(g, "g.V().repeat(out()).times().count()")


def _pg_people(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(0, 35, "x"), (1, 31, "y"), (2, 31, "z"), (3, 40, "w"), (4, 28, "v")],
        "id long, age long, name string",
    )
    company = spark.createDataFrame([(100, 10), (101, 2000)], "id long, size long")
    knows = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)], "src long, dst long"
    )
    works = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 101), (3, 101)], "src long, dst long"
    )
    return (
        PropertyGraph()
        .add_vertices("person", person)
        .add_vertices("company", company)
        .add_edges("knows", "person", "person", knows)
        .add_edges("works_at", "person", "company", works)
    )


def test_gremlin_order_by_limit(spark):
    pg = _pg_people(spark)
    # multi-key: age desc, id asc breaks the 31-31 tie deterministically
    rows = gremlin(
        pg,
        "g.V().hasLabel('person').order().by('age', desc).by('id').limit(3)"
        ".values('id')",
    ).collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 3]
    # order by id via the implicit element: order().by(desc)
    rows = gremlin(
        pg, "g.V().hasLabel('person').order().by(desc).limit(2)"
    ).collect()
    assert sorted(r["id"] for r in rows) == [3, 4]
    # order().by(select(tag)) over a tagged upstream vertex
    rows = gremlin(
        pg,
        "g.V().hasLabel('person').as('p').out('knows')"
        ".order().by(select('p'), desc).limit(2).select('p')",
    ).collect()
    assert sorted(r["p"] for r in rows) == [2, 3]


def test_gremlin_values_aggregates(spark):
    pg = _pg_people(spark)
    got = gremlin(
        pg, "g.V().hasLabel('person').values('age').sum()"
    ).collect()[0]["sum"]
    assert got == 35 + 31 + 31 + 40 + 28
    assert (
        gremlin(pg, "g.V().hasLabel('person').values('age').min()")
        .collect()[0]["min"] == 28
    )
    assert (
        gremlin(pg, "g.V().hasLabel('person').values('age').max()")
        .collect()[0]["max"] == 40
    )
    assert gremlin(
        pg, "g.V().hasLabel('person').values('age').mean()"
    ).collect()[0]["mean"] == pytest.approx(165 / 5)
    # traverser multiplicity: out('works_at').values('size').sum() counts
    # the company size once PER EDGE, not per distinct company
    got = gremlin(
        pg, "g.V().out('works_at').values('size').sum()"
    ).collect()[0]["sum"]
    assert got == 10 + 10 + 2000 + 2000


def test_gremlin_group_count_by_prop(spark):
    pg = _pg_people(spark)
    rows = gremlin(
        pg, "g.V().hasLabel('person').out('knows').groupCount().by('age')"
    ).collect()
    # knows dsts: 1(31), 2(31), 3(40), 4(28), 2(31) -> {31:3, 40:1, 28:1}
    assert {r["age"]: r["count"] for r in rows} == {31: 3, 40: 1, 28: 1}


def test_gremlin_unterminated_chain_sinks_ids(spark):
    g = _rand_graph(spark)
    rows = gremlin(g, "g.V().has('id', lt(3))").collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 2]


def test_gremlin_path(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2)], vertices=[0, 1, 2])
    paths = sorted(
        tuple(r["path"])
        for r in gremlin(g, "g.V(0).out().out().path()").collect()
    )
    assert paths == [(0, 1, 2)]
    # repeat() tracks every hop
    paths = sorted(
        tuple(r["path"])
        for r in gremlin(g, "g.V(0).repeat(out()).times(2).path()").collect()
    )
    assert paths == [(0, 1, 2)]
    # 1-hop: every out edge from 0
    paths = sorted(
        tuple(r["path"]) for r in gremlin(g, "g.V(0).out().path()").collect()
    )
    assert paths == [(0, 1), (0, 2)]


def test_gremlin_sample_coin(spark):
    g = _rand_graph(spark)
    got = gremlin(g, "g.V().sample(5)").collect()
    assert len(got) == 5
    # deterministic
    again = gremlin(g, "g.V().sample(5)").collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in again)
    n_all = gremlin(g, "g.V().count()").collect()[0]["count"]
    n_half = gremlin(g, "g.V().coin(0.5).count()").collect()[0]["count"]
    assert 0 < n_half < n_all
    assert gremlin(g, "g.V().coin(1.0).count()").collect()[0]["count"] == n_all


def test_gremlin_edge_steps(spark):
    from graphscope_spark.graph.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 5.0), (1, 2, 1.0), (2, 3, 9.0)],
        "src long, dst long, weight double",
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long")
    g = Graph(edges, vertices=verts)
    # edge-property filter + values terminal
    got = sorted(
        r["weight"]
        for r in gremlin(g, "g.V().outE().has('weight', gt(1.5)).values('weight')").collect()
    )
    assert got == [2.0, 5.0, 9.0]
    # sum over edge weights reachable from 0
    s = gremlin(g, "g.V(0).outE().values('weight').sum()").collect()[0]["sum"]
    assert s == 7.0
    # inV returns to vertices; chain continues
    ids = sorted(
        r["id"]
        for r in gremlin(g, "g.V(0).outE().has('weight', gt(3)).inV()").collect()
    )
    assert ids == [2]
    # inE: incoming edges of 2 -> weights 5.0, 1.0; outV gives the sources
    srcs = sorted(
        r["id"] for r in gremlin(g, "g.V(2).inE().outV()").collect()
    )
    assert srcs == [0, 1]
    # unterminated edge chain sinks (src, dst, weight)
    rows = gremlin(g, "g.V(0).outE()").collect()
    assert sorted((r["src"], r["dst"], r["weight"]) for r in rows) == [
        (0, 1, 2.0), (0, 2, 5.0),
    ]
    # vertex steps on edge traversers are rejected with guidance
    with pytest.raises(ValueError, match="inV"):
        gremlin(g, "g.V().outE().out()")


def test_gremlin_both_e_other_v(spark):
    from graphscope_spark.graph.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 2.0), (2, 0, 5.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame([(i,) for i in range(3)], "id long")
    g = Graph(edges, vertices=verts)
    # bothE from 0 sees both incident edges; otherV leaves the far side
    got = sorted(
        r["id"] for r in gremlin(g, "g.V(0).bothE().otherV()").collect()
    )
    assert got == [1, 2]
    # weight filter applies to incident edges regardless of direction
    got = sorted(
        r["id"]
        for r in gremlin(
            g, "g.V(0).bothE().has('weight', gt(3)).otherV()"
        ).collect()
    )
    assert got == [2]


def test_gremlin_has_id_step(spark):
    g = _rand_graph(spark)
    # hasId mid-chain == seeding V() with the same ids
    a = sorted(
        r["id"] for r in gremlin(g, "g.V().hasId(0, 1, 2).out()").collect()
    )
    b = sorted(r["id"] for r in gremlin(g, "g.V(0, 1, 2).out()").collect())
    assert a == b
    with pytest.raises(ValueError, match="at least one id"):
        gremlin(g, "g.V().hasId()")


def test_gremlin_range_after_order(spark):
    pg = _pg_people(spark)
    # range(1, 3) after order() == rows [1, 3) of the sorted stream
    full = [
        r["id"]
        for r in gremlin(
            pg, "g.V().hasLabel('person').order().by('age').by('id').values('id')"
        ).collect()
    ]
    got = [
        r["id"]
        for r in gremlin(
            pg,
            "g.V().hasLabel('person').order().by('age').by('id')"
            ".range(1, 3).values('id')",
        ).collect()
    ]
    assert got == full[1:3]
    with pytest.raises(ValueError, match="low <= high"):
        gremlin(pg, "g.V().range(3, 1)")


def test_gremlin_value_map(spark):
    pg = _pg_people(spark)
    rows = gremlin(
        pg, "g.V().hasLabel('person').valueMap('age', 'name')"
    ).collect()
    got = {(r["id"], r["age"], r["name"]) for r in rows}
    assert got == {
        (0, 35, "x"), (1, 31, "y"), (2, 31, "z"), (3, 40, "w"), (4, 28, "v"),
    }
    # companies lack 'name': null column, not an error
    rows = gremlin(pg, "g.V().hasLabel('company').valueMap('size', 'name')").collect()
    assert {(r["id"], r["size"], r["name"]) for r in rows} == {
        (100, 10, None), (101, 2000, None),
    }
    # edge traverser valueMap sinks (src, dst, props)
    from graphscope_spark.graph.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 5.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame([(i,) for i in range(3)], "id long")
    g = Graph(edges, vertices=verts)
    rows = gremlin(g, "g.V(0).outE().valueMap('weight')").collect()
    assert sorted((r["src"], r["dst"], r["weight"]) for r in rows) == [
        (0, 1, 2.0), (0, 2, 5.0),
    ]
    with pytest.raises(ValueError, match="must be terminal"):
        gremlin(g, "g.V().valueMap('weight').count()")


# ---------------------------------------------------------------------------
# repeat() with until()/emit() modulators
# ---------------------------------------------------------------------------


def _chain_graph(spark):
    # 0 -> 1 -> 2 -> 3 -> 4 plus a side branch 1 -> 10 (dead end)
    return make_graph(
        spark,
        [(0, 1), (1, 2), (2, 3), (3, 4), (1, 10)],
        vertices=[0, 1, 2, 3, 4, 10],
    )


def test_gremlin_until_hasid_chain(spark):
    g = _chain_graph(spark)
    # traversers from 0 walk until they hit vertex 3; the 1->10 branch
    # dead-ends and drops out
    rows = gremlin(g, "g.V(0).repeat(out()).until(hasId(3))").collect()
    assert sorted(r["id"] for r in rows) == [3]
    n = gremlin(
        g, "g.V(0).repeat(out()).until(hasId(3)).count()"
    ).collect()[0]["count"]
    assert n == 1


def test_gremlin_until_has_id_predicate(spark):
    g = _chain_graph(spark)
    # until(has('id', gte(3))): exits at the first vertex >= 3 (that is 3
    # on the main chain, 10 on the branch)
    rows = gremlin(
        g, "g.V(0).repeat(out()).until(has('id', gte(3)))"
    ).collect()
    assert sorted(r["id"] for r in rows) == [3, 10]


def test_gremlin_until_or_times_cap(spark):
    g = _chain_graph(spark)
    # cap of 2 rounds: nobody satisfies hasId(4) within 2 hops, so the
    # remaining traversers exit at the cap (Gremlin until-OR-times)
    rows = gremlin(
        g, "g.V(0).repeat(out()).until(hasId(4)).times(2)"
    ).collect()
    assert sorted(r["id"] for r in rows) == [2, 10]


def test_gremlin_until_nonconvergence_raises(spark, monkeypatch):
    import graphscope_spark.operators.gremlin as gm

    # a 2-cycle that never reaches the predicate: the unbounded loop must
    # raise loudly, never silently truncate
    g = make_graph(spark, [(0, 1), (1, 0)], vertices=[0, 1])
    monkeypatch.setattr(gm, "_UNTIL_MAX_ROUNDS", 3)
    with pytest.raises(RuntimeError, match="did not converge within 3"):
        gremlin(g, "g.V(0).repeat(out()).until(hasId(9)).count()")


def test_gremlin_emit_times(spark):
    g = _rand_graph(spark)
    # emit() streams every intermediate frontier: hops 1 and 2
    one = gremlin(g, "g.V().out().count()").collect()[0]["count"]
    two = gremlin(g, "g.V().out().out().count()").collect()[0]["count"]
    got = gremlin(
        g, "g.V().repeat(out()).times(2).emit().count()"
    ).collect()[0]["count"]
    assert got == one + two


def test_gremlin_emit_until(spark):
    g = _chain_graph(spark)
    # emit + until: every visited vertex is streamed; the walk stops at 3
    rows = gremlin(
        g, "g.V(0).repeat(out()).until(hasId(3)).emit()"
    ).collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 10]


def test_gremlin_until_path_tracking(spark):
    g = _chain_graph(spark)
    rows = gremlin(
        g, "g.V(0).repeat(out()).until(hasId(3)).path()"
    ).collect()
    assert [list(r["path"]) for r in rows] == [[0, 1, 2, 3]]


def test_gremlin_until_parser_errors(spark):
    g = _chain_graph(spark)
    with pytest.raises(ValueError, match="anonymous hasId"):
        gremlin(g, "g.V().repeat(out()).until(out()).count()")
    with pytest.raises(ValueError, match="takes no arguments"):
        gremlin(g, "g.V().repeat(out()).times(2).emit(3).count()")
    with pytest.raises(ValueError, match="needs ids"):
        gremlin(g, "g.V().repeat(out()).until(hasId()).count()")


# ---------------------------------------------------------------------------
# r4 session 3: E() source, existence filters, value traversers, group(),
# projections — the remaining GIE supported_gremlin_steps.md rows
# ---------------------------------------------------------------------------


def _pg(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(i, 30 + i) for i in range(5)], "id long, age long"
    )
    company = spark.createDataFrame(
        [(100, 10), (101, 2000)], "id long, size long"
    )
    knows = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    works = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 101)], "src long, dst long"
    )
    return (
        PropertyGraph()
        .add_vertices("person", person)
        .add_vertices("company", company)
        .add_edges("knows", "person", "person", knows)
        .add_edges("works_at", "person", "company", works)
    )


def test_gremlin_e_source(spark):
    g = make_graph(
        spark, [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 2.0)], weights=True
    )
    assert gremlin(g, "g.E().count()").collect()[0]["count"] == 3
    heavy = gremlin(g, "g.E().has('weight', gt(1.5))").collect()
    assert sorted((r["src"], r["dst"]) for r in heavy) == [(1, 2), (2, 3)]
    # bothV splits each edge into both endpoints; dedup collapses repeats
    n = gremlin(
        g, "g.E().has('weight', gt(1.5)).bothV().dedup().count()"
    ).collect()[0]["count"]
    assert n == 3  # {1, 2, 3}
    with pytest.raises(ValueError, match="undefined after E"):
        gremlin(g, "g.E().otherV().count()")
    # E() after V is rejected
    with pytest.raises(ValueError, match="source step"):
        gremlin(g, "g.V().E().count()")


def test_gremlin_where_not_existence(spark):
    g = _chain_graph(spark)  # 0->1->2->3->4, 1->10
    # vertices with an out-edge but no in-edge: only the root 0
    rows = gremlin(g, "g.V().where(out()).not(__.in())").collect()
    assert sorted(r["id"] for r in rows) == [0]
    # sinks: no out-edge
    rows = gremlin(g, "g.V().not(out())").collect()
    assert sorted(r["id"] for r in rows) == [4, 10]
    # where(both()) keeps every non-isolated vertex
    n = gremlin(g, "g.V().where(both()).count()").collect()[0]["count"]
    assert n == 6
    # outE existence == out existence
    a = gremlin(g, "g.V().where(outE()).count()").collect()[0]["count"]
    b = gremlin(g, "g.V().where(out()).count()").collect()[0]["count"]
    assert a == b


def test_gremlin_has_not(spark):
    pg = _pg(spark)
    # persons lack 'size'; companies lack 'age'
    rows = gremlin(pg, "g.V().hasNot('size')").collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]
    rows = gremlin(pg, "g.V().hasNot('age')").collect()
    assert sorted(r["id"] for r in rows) == [100, 101]
    # unknown property: everything passes
    n = gremlin(pg, "g.V().hasNot('salary').count()").collect()[0]["count"]
    assert n == 7


def test_gremlin_values_is_dedup(spark):
    pg = _pg(spark)
    rows = gremlin(pg, "g.V().values('age').is(gt(31))").collect()
    assert sorted(r["age"] for r in rows) == [32, 33, 34]
    n = gremlin(
        pg, "g.V().values('age').is(P.gte(32)).count()"
    ).collect()[0]["count"]
    assert n == 3
    # dedup on values
    rows = gremlin(
        pg, "g.V().out('works_at').values('size').dedup()"
    ).collect()
    assert sorted(r["size"] for r in rows) == [10, 2000]
    with pytest.raises(ValueError, match="value traversers"):
        gremlin(pg, "g.V().is(gt(1)).count()")


def test_gremlin_fold(spark):
    g = _chain_graph(spark)
    got = gremlin(g, "g.V(0).out().out().fold()").collect()[0]["folded"]
    assert got == [2, 10]
    pg = _pg(spark)
    got = gremlin(pg, "g.V().values('age').is(lt(33)).fold()").collect()[0][
        "folded"
    ]
    assert got == [30, 31, 32]


def test_gremlin_local_scope(spark):
    """fold().X(local) — local-scope aggregates over the folded list
    (supported_gremlin_steps.md §local examples)."""
    g = _chain_graph(spark)
    assert gremlin(g, "g.V().fold().count(local)").collect()[0]["count"] == \
        gremlin(g, "g.V().count()").collect()[0]["count"]
    pg = _pg(spark)
    ages = [
        r["age"] for r in gremlin(pg, "g.V().values('age')").collect()
        if r["age"] is not None
    ]
    got = gremlin(pg, "g.V().values('age').fold().sum(local)").collect()[0]
    assert got["sum"] == float(sum(ages))
    got = gremlin(pg, "g.V().values('age').fold().min(local)").collect()[0]
    assert got["min"] == min(ages)
    got = gremlin(pg, "g.V().values('age').fold().mean(local)").collect()[0]
    assert abs(got["mean"] - sum(ages) / len(ages)) < 1e-9
    with pytest.raises(ValueError, match="must be terminal"):
        gremlin(g, "g.V().fold().count(local).count()")


def test_gremlin_group(spark):
    pg = _pg(spark)
    # key=property, value=count: persons per employer size bucket
    rows = gremlin(
        pg, "g.V().out('works_at').group().by('size').by(count())"
    ).collect()
    assert sorted((r["size"], r["count"]) for r in rows) == [(10, 2), (2000, 1)]
    # default value = fold (sorted element list)
    rows = gremlin(
        pg, "g.V().out('works_at').group().by('size')"
    ).collect()
    assert sorted((r["size"], tuple(r["value"])) for r in rows) == [
        (10, (100, 100)), (2000, (101,)),
    ]
    # key=select(tag), value=sum over a property
    rows = gremlin(
        pg,
        "g.V().hasLabel('person').as('p').out('knows')"
        ".group().by(select('p')).by(sum('age'))",
    ).collect()
    assert sorted((r["p"], r["sum"]) for r in rows) == [
        (0, 31), (1, 32), (2, 33),
    ]
    # group() with no by(): fold by vertex id
    rows = gremlin(pg, "g.V().out('knows').group()").collect()
    assert sorted((r["v"], tuple(r["value"])) for r in rows) == [
        (1, (1,)), (2, (2,)), (3, (3,)),
    ]
    with pytest.raises(ValueError, match="at most two"):
        gremlin(pg, "g.V().group().by('age').by(count()).by(count())")


def test_gremlin_union_identity(spark):
    g = _chain_graph(spark)
    # union(out, in) == both (with multiplicity)
    a = gremlin(g, "g.V().union(out(), __.in()).count()").collect()[0]["count"]
    b = gremlin(g, "g.V().both().count()").collect()[0]["count"]
    assert a == b == 10
    rows = gremlin(g, "g.V(1).union(out(), __.in())").collect()
    assert sorted(r["id"] for r in rows) == [0, 2, 10]
    # identity is a no-op
    n = gremlin(g, "g.V().identity().out().identity().count()").collect()[0][
        "count"
    ]
    assert n == 5


def test_gremlin_projections(spark):
    pg = _pg(spark)
    rows = gremlin(pg, "g.V().hasLabel('company').id()").collect()
    assert sorted(r["id"] for r in rows) == [100, 101]
    rows = gremlin(pg, "g.V().out('works_at').label()").collect()
    assert [r["label"] for r in rows] == ["company"] * 3
    rows = gremlin(pg, "g.V().hasLabel('person').constant(7)").collect()
    assert [r["constant"] for r in rows] == [7] * 5
    rows = gremlin(pg, "g.V().hasLabel('company').elementMap('size')").collect()
    assert sorted((r["id"], r["label"], r["size"]) for r in rows) == [
        (100, "company", 10), (101, "company", 2000),
    ]
    with pytest.raises(ValueError, match="PropertyGraph"):
        gremlin(_chain_graph(spark), "g.V().label()")


def test_gremlin_pathexpand_sugar(spark):
    g = _chain_graph(spark)  # 0->1->2->3->4, 1->10
    # [1,3) hops from 0: ends {1, 2, 10}
    rows = gremlin(g, "g.V(0).out('1..3')").collect()
    assert sorted(tuple(r["path"]) for r in rows) == [
        (0, 1), (0, 1, 2), (0, 1, 10),
    ]
    rows = gremlin(
        g, "g.V(0).out('1..3').with('RESULT_OPT', 'END_V')"
    ).collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 10]
    # endV unfolds the ALL_V collection to the end vertex
    rows = gremlin(g, "g.V(0).out('1..3').endV()").collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 10]
    # chaining continues after END_V
    n = gremlin(
        g,
        "g.V(0).out('1..3').with('RESULT_OPT', 'END_V').out().count()",
    ).collect()[0]["count"]
    assert n == 3  # 1->2, 1->10, 2->3
    with pytest.raises(ValueError, match="not supported on path-collection"):
        gremlin(g, "g.V(0).out('1..3').out().count()")
    with pytest.raises(ValueError, match="must follow a PathExpand"):
        gremlin(g, "g.V(0).with('PATH_OPT', 'SIMPLE').count()")
    with pytest.raises(ValueError, match="unsupported RESULT_OPT"):
        gremlin(g, "g.V(0).out('1..3').with('RESULT_OPT', 'ALL_V_E')")


def test_gremlin_pathexpand_simple_vs_arbitrary(spark):
    # cycle 0->1->2->0: arbitrary revisits, simple does not
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)], vertices=[0, 1, 2])
    arb = gremlin(
        g,
        "g.V(0).out('3..4').with('PATH_OPT', 'ARBITRARY')"
        ".with('RESULT_OPT', 'END_V')",
    ).collect()
    assert [r["id"] for r in arb] == [0]  # 0->1->2->0
    simple = gremlin(
        g,
        "g.V(0).out('3..4').with('PATH_OPT', 'SIMPLE')"
        ".with('RESULT_OPT', 'END_V')",
    ).collect()
    assert simple == []  # the 3-hop walk repeats vertex 0
    # both(): each undirected 2-walk from 1
    n = gremlin(
        g,
        "g.V(1).both('2..3').with('RESULT_OPT', 'END_V').count()",
    ).collect()[0]["count"]
    assert n == 4  # 1->0->{1,2}, 1->2->{0,1} (via both orientations)


def test_gremlin_match_step(spark):
    g = _rand_graph(spark)
    # directed triangle via match() == the match() operator directly
    want = match(
        g, [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")]
    ).count()
    got = gremlin(
        g,
        "g.V().match(__.as('a').out().as('b'), __.as('b').out().as('c'),"
        " __.as('a').out().as('c')).count()",
    ).collect()[0]["count"]
    assert got == want
    # select projects the bindings; incoming traversers restrict the
    # first tag
    rows = gremlin(
        g,
        "g.V().hasId(0, 1, 2).match(__.as('a').out().as('b')).select('a', 'b')",
    ).collect()
    want_pairs = {
        (r["src"], r["dst"])
        for r in g.edges.filter("src in (0,1,2)").collect()
    }
    assert {(r["a"], r["b"]) for r in rows} == want_pairs
    # anonymous mid-chain vertex: 2-hop sentence
    got = gremlin(
        g, "g.V().match(__.as('a').out().out().as('c')).count()"
    ).collect()[0]["count"]
    want = match(
        g, [("a", "out", "m"), ("m", "out", "c")]
    ).count()
    assert got == want
    # in() sentences reverse
    got = gremlin(
        g, "g.V().match(__.as('a').in().as('b')).count()"
    ).collect()[0]["count"]
    assert got == g.edges.count()
    with pytest.raises(ValueError, match="end with as"):
        gremlin(g, "g.V().match(__.as('a').out()).count()")
    with pytest.raises(ValueError, match="before as"):
        gremlin(g, "g.V().as('x').match(__.as('a').out().as('b')).count()")


def test_gremlin_subgraph_step(spark):
    g = make_graph(
        spark, [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 2.0)], weights=True
    )
    rows = gremlin(g, "g.E().has('weight', gt(1.5)).subgraph('sg')").collect()
    assert sorted((r["src"], r["dst"]) for r in rows) == [(1, 2), (2, 3)]
    # bothE duplicates collapse in the subgraph edge set
    rows = gremlin(
        g, "g.V(1, 2).outE().subgraph('sg')"
    ).collect()
    assert sorted((r["src"], r["dst"]) for r in rows) == [(1, 2), (2, 3)]
    with pytest.raises(ValueError, match="edge traversers"):
        gremlin(g, "g.V().subgraph('sg')")


def test_gremlin_has_arg_forms(spark):
    pg = _pg(spark)
    # has(prop): elements carrying the property
    rows = gremlin(pg, "g.V().has('age')").collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]
    # has(label, prop, P): fused hasLabel + has
    rows = gremlin(pg, "g.V().has('person', 'age', gte(32))").collect()
    assert sorted(r["id"] for r in rows) == [2, 3, 4]
    rows = gremlin(pg, "g.V().has('company', 'size', 2000)").collect()
    assert [r["id"] for r in rows] == [101]
    # unknown property: has() drops everything (complement of hasNot)
    assert gremlin(pg, "g.V().has('salary').count()").collect()[0]["count"] == 0
    with pytest.raises(ValueError, match="unknown vertex label"):
        gremlin(pg, "g.V().has('robot', 'age', 1)")


def test_gremlin_where_two_tags_and_unfold(spark):
    g = _chain_graph(spark)
    # where('a', eq('b')) closes a cycle between two tags: 2-hop returns
    # to the start only on cycles (none here)
    n = gremlin(
        g,
        "g.V().as('a').out().out().as('b').where('a', eq('b')).count()",
    ).collect()[0]["count"]
    assert n == 0
    # neq keeps the non-returning walks
    n = gremlin(
        g,
        "g.V().as('a').out().out().as('b').where('a', neq('b')).count()",
    ).collect()[0]["count"]
    assert n == 4  # 0->1->{2,10}, 1->2->3, 2->3->4
    # fold().unfold() round-trips the stream
    rows = gremlin(g, "g.V(0).out().fold().unfold()").collect()
    assert sorted(r["id"] for r in rows) == [1]
    n = gremlin(g, "g.V().fold().unfold().count()").collect()[0]["count"]
    assert n == 6
    with pytest.raises(ValueError, match="must follow fold"):
        gremlin(g, "g.V().unfold().count()")


def _modern_pg(spark):
    """TinkerPop's 'modern' graph — the fixture the reference's
    supported_gremlin_steps.md §Expression examples run on."""
    from graphscope_spark.graph.property_graph import PropertyGraph

    person = spark.createDataFrame(
        [(1, "marko", 29), (2, "vadas", 27), (4, "josh", 32),
         (6, "peter", 35)],
        "id long, name string, age long",
    )
    soft = spark.createDataFrame(
        [(3, "lop"), (5, "ripple")], "id long, name string"
    )
    created = spark.createDataFrame(
        [(1, 3), (4, 5), (4, 3), (6, 3)], "src long, dst long"
    )
    knows = spark.createDataFrame([(1, 2), (1, 4)], "src long, dst long")
    return (
        PropertyGraph()
        .add_vertices("person", person)
        .add_vertices("software", soft)
        .add_edges("created", "person", "software", created)
        .add_edges("knows", "person", "person", knows)
    )


def test_gremlin_expr_doc_examples(spark):
    """The reference doc's own §Expression running examples, verbatim."""
    pg = _modern_pg(spark)
    r = gremlin(pg, 'g.V().where(expr(_.name = "marko"))').collect()
    assert sorted(x["id"] for x in r) == [1]
    r = gremlin(
        pg, 'g.V().as("a").where(expr(a.name = "marko" OR a.age > 10))'
    ).collect()
    assert sorted(x["id"] for x in r) == [1, 2, 4, 6]
    r = gremlin(
        pg, 'g.V().as("a").where(expr(a.age IS NULL)).values("name")'
    ).collect()
    assert sorted(x["name"] for x in r) == ["lop", "ripple"]
    r = gremlin(
        pg, 'g.V().as("a").where(expr(a.age IS NOT NULL)).values("name")'
    ).collect()
    assert sorted(x["name"] for x in r) == ["josh", "marko", "peter", "vadas"]
    r = gremlin(
        pg, 'g.V().as("a").where(expr(a.name STARTS WITH "ma"))'
    ).collect()
    assert sorted(x["id"] for x in r) == [1]
    r = gremlin(pg, 'g.V().select(expr(_.name))').collect()
    assert sorted(x["value"] for x in r) == [
        "josh", "lop", "marko", "peter", "ripple", "vadas",
    ]
    # _.age ^ 1 is bitwise XOR in expr() (POWER is the exponent function)
    r = gremlin(pg, 'g.V().hasLabel("person").select(expr(_.age ^ 1))').collect()
    assert sorted(x["value"] for x in r) == [26, 28, 33, 34]
    r = gremlin(
        pg, 'g.V().hasLabel("person").select(expr(POWER(_.age, 2)))'
    ).collect()
    assert sorted(int(x["value"]) for x in r) == [729, 841, 1024, 1225]


def test_gremlin_expr_operators(spark):
    pg = _modern_pg(spark)
    # IN list, arithmetic with precedence, legacy @/&&/== spelling,
    # shifts, NOT-over-strpred, not(expr(...)) complement
    assert gremlin(
        pg, 'g.V().where(expr(_.name IN ["marko", "vadas"])).count()'
    ).collect()[0]["count"] == 2
    r = gremlin(
        pg, 'g.V().hasLabel("person").where(expr((_.age + 1) * 2 = 60))'
    ).collect()
    assert sorted(x["id"] for x in r) == [1]
    r = gremlin(
        pg, 'g.V().as("a").where(expr(@a.name == "marko" && @a.age > 10))'
    ).collect()
    assert sorted(x["id"] for x in r) == [1]
    r = gremlin(pg, 'g.V().hasLabel("person").select(expr(_.age << 1))').collect()
    assert sorted(x["value"] for x in r) == [54, 58, 64, 70]
    r = gremlin(
        pg, 'g.V().where(expr(NOT _.name STARTS WITH "ma")).values("name")'
    ).collect()
    assert sorted(x["name"] for x in r) == [
        "josh", "lop", "peter", "ripple", "vadas",
    ]
    # not(expr(..)): null outcomes (no age) are NOT true, so they stay
    assert gremlin(
        pg, 'g.V().not(expr(_.age IS NOT NULL)).count()'
    ).collect()[0]["count"] == 2
    # LABELS()/elementId() functions
    assert gremlin(
        pg, 'g.V().as("a").where(expr(LABELS(a) = "software")).count()'
    ).collect()[0]["count"] == 2
    assert gremlin(
        pg, 'g.V().as("a").where(expr(elementId(a) = 4)).count()'
    ).collect()[0]["count"] == 1


def test_gremlin_expr_errors(spark):
    pg = _modern_pg(spark)
    with pytest.raises(ValueError, match="unbound tag"):
        gremlin(pg, 'g.V().where(expr(z.age > 1))').collect()
    with pytest.raises(ValueError, match="no vertex label has property"):
        gremlin(pg, 'g.V().where(expr(_.salary > 1))').collect()
    with pytest.raises(ValueError, match="trailing tokens|unsupported"):
        gremlin(pg, 'g.V().where(expr(_.age > 1 2))').collect()
    with pytest.raises(ValueError, match="not supported in expr"):
        gremlin(pg, 'g.V().as("p").where(expr(LENGTH(p) > 1))').collect()


def test_gremlin_extended_group(spark):
    """supported_gremlin_steps.md §Aggregate (Group) — the extended
    multi-key / multi-value by()-step examples."""
    pg = _modern_pg(spark)
    r = gremlin(
        pg,
        'g.V().hasLabel("person").group()'
        '.by(values("name").as("k1"), values("age").as("k2"))',
    ).collect()
    got = sorted((x["k1"], x["k2"], list(x["value"])) for x in r)
    assert got == [
        ("josh", 32, [4]), ("marko", 29, [1]), ("peter", 35, [6]),
        ("vadas", 27, [2]),
    ]
    r = gremlin(
        pg,
        'g.V().hasLabel("person").group()'
        '.by(out().count().as("k1"), values("name").as("k2"))',
    ).collect()
    assert sorted((x["k1"], x["k2"]) for x in r) == [
        (0, "vadas"), (1, "peter"), (2, "josh"), (3, "marko"),
    ]
    r = gremlin(
        pg,
        'g.V().hasLabel("person").group().by("name")'
        '.by(count().as("v1"), values("age").sum().as("v2"))',
    ).collect()
    assert sorted((x["name"], x["v1"], x["v2"]) for x in r) == [
        ("josh", 1, 32), ("marko", 1, 29), ("peter", 1, 35), ("vadas", 1, 27),
    ]
    # legacy single-key single-value forms unchanged
    r = gremlin(pg, 'g.V().hasLabel("person").group().by("name").by(count())').collect()
    assert sorted((x["name"], x["count"]) for x in r) == [
        ("josh", 1), ("marko", 1), ("peter", 1), ("vadas", 1),
    ]
    with pytest.raises(ValueError, match="unsupported group"):
        gremlin(pg, 'g.V().group().by(out().out().as("k"))').collect()


def test_gremlin_project(spark):
    pg = _modern_pg(spark)
    r = gremlin(
        pg,
        'g.V().hasLabel("person").project("v", "deg", "nm")'
        '.by(id()).by(out().count()).by("name")',
    ).collect()
    assert sorted((x["v"], x["deg"], x["nm"]) for x in r) == [
        (1, 3, "marko"), (2, 0, "vadas"), (4, 2, "josh"), (6, 1, "peter"),
    ]
    # expr() value and select(tag) binding
    r = gremlin(
        pg,
        'g.V().hasLabel("person").project("nm", "agesq")'
        '.by("name").by(expr(_.age * _.age))',
    ).collect()
    assert sorted((x["nm"], x["agesq"]) for x in r) == [
        ("josh", 1024), ("marko", 841), ("peter", 1225), ("vadas", 729),
    ]
    r = gremlin(
        pg,
        'g.V().as("a").out("knows").project("who", "from")'
        '.by(id()).by(select("a"))',
    ).collect()
    assert sorted((x["who"], x["from"]) for x in r) == [(2, 1), (4, 1)]
    with pytest.raises(ValueError, match="one .by"):
        gremlin(pg, 'g.V().project("a", "b").by(id())').collect()
    with pytest.raises(ValueError, match="terminal"):
        gremlin(pg, 'g.V().project("a").by(id()).count()').collect()


def test_expr_bit_reverse(spark):
    """~ bit reverse in expr() (BitOpr row, reference-planned)."""
    from tests.conftest import make_graph
    from graphscope_spark.operators.gremlin import gremlin

    g = make_graph(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
        vertices=list(range(4)),
    )
    r = gremlin(g, "g.V().select(expr(~_ & 7))").collect()
    assert sorted(x[0] for x in r) == [4, 5, 6, 7]  # ~id & 7 = 7 - id
    r = gremlin(g, "g.V().where(expr(~_ = -2)).count()").collect()
    assert r[0][0] == 1  # ~1 == -2
