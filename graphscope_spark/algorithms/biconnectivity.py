"""Biconnectivity: BCC labels, bridges, articulation points — Tarjan–Vishkin.

Reference inventory: ``apps/flash/connectivity/bcc.h``, ``bridge.h``,
``cut-point.h`` (SURVEY §2.2 FLASH suite). Sequential Tarjan (DFS low-link)
does not distribute; the classic parallel formulation (Tarjan & Vishkin 1985,
as presented in JáJá's *Introduction to Parallel Algorithms*) does, and maps
cleanly onto the superstep runtime:

1. **Rooted spanning forest** — one BFS superstep loop seeded at every
   component's min-id vertex (labels from :func:`wcc`), parent = min-id
   predecessor (deterministic).
2. **Subtree sizes** ``nd`` — upward per-level DP (children of a BFS-tree
   vertex at depth d sit exactly at depth d+1), O(depth) Spark jobs.
3. **Preorder** ``pre`` — downward per-level DP; sibling offsets via a
   window ``sum(nd) over (partition by parent order by id)``; per-component
   bases from a cumulative component-size window, so subtrees are disjoint
   preorder intervals ``[pre, pre+nd)`` globally.
4. **low/high** — min/max preorder reachable from the subtree via one
   non-tree edge; upward per-level DP over base values
   ``min(pre(v), pre of non-tree neighbors)``.
5. **Auxiliary graph** on tree edges (each represented by its child
   endpoint): (A) non-tree edge {u,w} with u,w unrelated (disjoint
   intervals) → aux edge {u,w}; (B) tree edge (v,w), v non-root, with
   ``low(w) < pre(v)`` → aux {v,w}; (C) same with
   ``high(w) ≥ pre(v)+nd(v)`` → aux {v,w}. Connected components of the
   aux graph (reusing :func:`wcc`) are exactly the biconnected components.

Everything is joins/windows + O(diameter) supersteps — no per-vertex Python,
no driver loops over vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["bcc_edges", "bridges", "articulation_points"]


def _spanning_forest(graph: Graph) -> tuple[DataFrame, DataFrame, int]:
    """Returns (und_edges, tree, max_depth): tree = (id, comp, depth, parent)
    for every vertex (roots have parent null, depth 0)."""
    from graphscope_spark.algorithms.wcc import wcc

    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = und.edges.select("src", "dst").repartition(P, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    comp = wcc(graph)

    def init() -> DataFrame:
        return comp.select(
            "id",
            F.col("component").alias("comp"),
            F.when(F.col("id") == F.col("component"), 0)
            .otherwise(-1)
            .cast("int")
            .alias("depth"),
            F.lit(None).cast("long").alias("parent"),
            (F.col("id") == F.col("component")).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        frontier = state.filter("changed").select("id")
        cand = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.id)
            .groupBy("dst")
            .agg(F.min("src").alias("cand_parent"))
        )
        newly = F.col("cand_parent").isNotNull() & (F.col("depth") == -1)
        plan = state.join(
            cand.hint("shuffle_hash"), state.id == cand.dst, "left"
        ).select(
            state.id.alias("id"),
            "comp",
            F.when(newly, rnd).otherwise(F.col("depth")).cast("int").alias("depth"),
            F.when(newly, F.col("cand_parent")).otherwise(F.col("parent")).alias(
                "parent"
            ),
            newly.alias("changed"),
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    res = run_supersteps(init, body, max_rounds=100_000)
    tree = res.state.select("id", "comp", "depth", "parent").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    max_depth = tree.agg(F.max("depth")).collect()[0][0] or 0
    return edges, tree, max_depth


def _level_dp_up(tree: DataFrame, max_depth: int, base: DataFrame,
                 combine: str) -> DataFrame:
    """Upward tree DP: value(v) = combine(base(v), values of children).
    ``base``: (id, val); combine ∈ {sum1 (subtree size), min, max}.
    Returns (id, val). One join+agg per level."""
    parts = []
    cur = None
    for d in range(max_depth, -1, -1):
        level = tree.filter(F.col("depth") == d).select("id", "parent")
        lv = level.join(base, "id", "left")
        if cur is None:
            child_agg = None
        else:
            if combine == "sum1":
                agg = F.sum("val").alias("cval")
            elif combine == "min":
                agg = F.min("val").alias("cval")
            else:
                agg = F.max("val").alias("cval")
            child_agg = cur.groupBy(F.col("cparent").alias("id")).agg(agg)
        if child_agg is not None:
            lv = lv.join(child_agg, "id", "left")
        else:
            lv = lv.withColumn("cval", F.lit(None).cast("double"))
        if combine == "sum1":
            val = (F.lit(1) + F.coalesce(F.col("cval"), F.lit(0))).cast("long")
        elif combine == "min":
            val = F.least(
                F.coalesce("val", F.lit(float("inf"))),
                F.coalesce("cval", F.lit(float("inf"))),
            )
        else:
            val = F.greatest(
                F.coalesce("val", F.lit(float("-inf"))),
                F.coalesce("cval", F.lit(float("-inf"))),
            )
        # per-level eager checkpoint is mandatory: cur is referenced twice
        # (next level's child aggregate AND the final union) and Spark does
        # not dedupe the repeated subtree — lazy chaining recomputes
        # exponentially across levels (measured: 7-vertex fixture -> 4 MiB
        # task binaries and a 5-minute hang)
        cur = lv.select(
            "id", F.col("parent").alias("cparent"), val.alias("val")
        ).localCheckpoint(eager=True)
        parts.append(cur.select("id", "val"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _tree_info(graph: Graph) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Assemble per-vertex (id, comp, depth, parent, pre, nd, low, high) plus
    the undirected edge table and the non-tree directed rows."""
    edges, tree, max_depth = _spanning_forest(graph)

    # subtree sizes (upward)
    one = tree.select("id", F.lit(None).cast("double").alias("val")).limit(0)
    nd = _level_dp_up(tree, max_depth, one, "sum1").withColumnRenamed("val", "nd")
    tn = tree.join(nd, "id").persist(StorageLevel.MEMORY_AND_DISK)

    # preorder (downward): each component gets a disjoint contiguous id
    # range. Any consistent total order works, so the prefix sum runs
    # two-level (hash-bucketed) instead of one global ORDER BY window —
    # a graph with millions of components would otherwise funnel one row
    # per component through a single task (ADVICE r2).
    comp_sizes = tn.filter("depth = 0").select(
        F.col("comp"), F.col("nd").alias("csize")
    )
    n_buckets = 1024
    cs = comp_sizes.withColumn(
        "bkt", F.pmod(F.xxhash64("comp"), F.lit(n_buckets))
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("comp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cs = cs.withColumn("inoff", F.coalesce(F.sum("csize").over(w_in), F.lit(0)))
    btot = cs.groupBy("bkt").agg(F.sum("csize").alias("btot"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_buckets rows — the only serial window left is bounded and tiny
    btot = btot.withColumn(
        "boff", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    )
    bases = cs.join(F.broadcast(btot.select("bkt", "boff")), "bkt").select(
        "comp", (F.col("inoff") + F.col("boff")).cast("long").alias("base")
    )
    cur = (
        tn.filter("depth = 0")
        .join(bases, "comp")
        .select("id", F.col("base").alias("pre"))
        .localCheckpoint(eager=True)
    )
    pre_parts = [cur]
    wsib = (
        Window.partitionBy("parent")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for d in range(1, max_depth + 1):
        lvl = tn.filter(F.col("depth") == d).select("id", "parent", "nd")
        lvl = lvl.withColumn(
            "sib", F.coalesce(F.sum("nd").over(wsib), F.lit(0)).cast("long")
        )
        cur = (
            lvl.join(cur.withColumnRenamed("id", "parent"), "parent")
            .select("id", (F.col("pre") + 1 + F.col("sib")).alias("pre"))
            .localCheckpoint(eager=True)
        )
        pre_parts.append(cur)
    pre = pre_parts[0]
    for p in pre_parts[1:]:
        pre = pre.unionByName(p)
    info = tn.join(pre, "id").persist(StorageLevel.MEMORY_AND_DISK)

    # non-tree directed rows (both orientations present in `edges`)
    tree_dir = info.filter("parent IS NOT NULL").select(
        F.col("parent").alias("src"), F.col("id").alias("dst")
    )
    tree_both = tree_dir.unionByName(
        tree_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nt = edges.join(tree_both, ["src", "dst"], "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # low/high (upward) from non-tree neighbor preorders
    pre_of = info.select(F.col("id").alias("dst"), F.col("pre").alias("npre"))
    nt_pre = nt.join(pre_of, "dst").groupBy(F.col("src").alias("id")).agg(
        F.min("npre").alias("ntmin"), F.max("npre").alias("ntmax")
    )
    base_low = (
        info.select("id", "pre")
        .join(nt_pre.select("id", "ntmin"), "id", "left")
        .select(
            "id",
            F.least(
                F.col("pre").cast("double"),
                F.coalesce(F.col("ntmin").cast("double"), F.lit(float("inf"))),
            ).alias("val"),
        )
    )
    base_high = (
        info.select("id", "pre")
        .join(nt_pre.select("id", "ntmax"), "id", "left")
        .select(
            "id",
            F.greatest(
                F.col("pre").cast("double"),
                F.coalesce(F.col("ntmax").cast("double"), F.lit(float("-inf"))),
            ).alias("val"),
        )
    )
    low = _level_dp_up(info, max_depth, base_low, "min").withColumnRenamed(
        "val", "low"
    )
    high = _level_dp_up(info, max_depth, base_high, "max").withColumnRenamed(
        "val", "high"
    )
    full = (
        info.join(low, "id")
        .join(high, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    full.count()
    tn.unpersist()
    info.unpersist()
    tree.unpersist()
    return full, edges, nt


def bcc_edges(graph: Graph) -> DataFrame:
    """(src, dst, bcc) for every undirected simple edge (src < dst by
    preorder→id canonicalization... src/dst returned as (min,max) id order);
    ``bcc`` = min non-root vertex id among the component's tree-edge child
    representatives."""
    from graphscope_spark.algorithms.wcc import wcc

    info, edges, nt = _tree_info(graph)

    me = info.select(
        F.col("id").alias("u"),
        F.col("pre").alias("u_pre"),
        F.col("nd").alias("u_nd"),
        F.col("parent").alias("u_parent"),
        F.col("low").alias("u_low"),
        F.col("high").alias("u_high"),
    )
    # one orientation per non-tree edge, by preorder
    nt1 = (
        nt.join(me.withColumnRenamed("u", "src"), "src")
        .join(
            info.select(
                F.col("id").alias("dst"),
                F.col("pre").alias("w_pre"),
                F.col("nd").alias("w_nd"),
            ),
            "dst",
        )
        .filter(F.col("u_pre") < F.col("w_pre"))
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("w"),
            "u_pre", "u_nd", "w_pre", "w_nd",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    unrelated = ~(
        (F.col("w_pre") >= F.col("u_pre"))
        & (F.col("w_pre") < F.col("u_pre") + F.col("u_nd"))
    )
    rule_a = nt1.filter(unrelated).select(
        F.col("u").alias("src"), F.col("w").alias("dst")
    )
    tree_e = info.filter("parent IS NOT NULL").select(
        F.col("parent").alias("v"), F.col("id").alias("w"),
        F.col("low").alias("w_low"), F.col("high").alias("w_high"),
    )
    ve = tree_e.join(
        info.select(
            F.col("id").alias("v"), F.col("pre").alias("v_pre"),
            F.col("nd").alias("v_nd"), F.col("parent").alias("v_parent"),
        ),
        "v",
    ).filter(F.col("v_parent").isNotNull())
    rule_b = ve.filter(F.col("w_low") < F.col("v_pre")).select(
        F.col("v").alias("src"), F.col("w").alias("dst")
    )
    rule_c = ve.filter(
        F.col("w_high") >= F.col("v_pre") + F.col("v_nd")
    ).select(F.col("v").alias("src"), F.col("w").alias("dst"))

    aux_edges = rule_a.unionByName(rule_b).unionByName(rule_c)
    reps = info.filter("parent IS NOT NULL").select("id")
    aux = Graph(
        aux_edges, vertices=reps, num_partitions=graph.num_partitions
    )
    labels = wcc(aux)  # (id, component) — component = min rep id
    aux.unpersist()

    tree_lab = (
        info.filter("parent IS NOT NULL")
        .join(labels, "id")
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
            F.col("component").alias("bcc"),
        )
    )
    # non-tree edge belongs to the BCC of its deeper/later endpoint's tree
    # edge (its fundamental cycle contains (parent(w), w))
    nt_lab = nt1.join(
        labels.withColumnRenamed("id", "w"), "w"
    ).select(
        F.least("u", "w").alias("src"),
        F.greatest("u", "w").alias("dst"),
        F.col("component").alias("bcc"),
    )
    out = tree_lab.unionByName(nt_lab).localCheckpoint(eager=True)
    info.unpersist()
    edges.unpersist()
    nt.unpersist()
    nt1.unpersist()
    return out


def bridges(graph: Graph) -> DataFrame:
    """(src, dst) undirected edges whose removal disconnects their component
    = BCCs containing exactly one edge."""
    be = bcc_edges(graph)
    singles = (
        be.groupBy("bcc")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n = 1")
        .select("bcc")
    )
    return be.join(singles, "bcc", "left_semi").select("src", "dst")


def articulation_points(graph: Graph) -> DataFrame:
    """(id) vertices belonging to ≥ 2 biconnected components."""
    be = bcc_edges(graph)
    ends = be.select(F.col("src").alias("id"), "bcc").unionByName(
        be.select(F.col("dst").alias("id"), "bcc")
    )
    return (
        ends.distinct()
        .groupBy("id")
        .agg(F.countDistinct("bcc").alias("nb"))
        .filter("nb >= 2")
        .select("id")
    )
