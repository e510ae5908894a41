from __future__ import annotations

from collections import defaultdict


def _oracle(u_labels, edges, max_round):
    """Pure-python mirror of apps/lpa/lpa_u2i.h."""
    out_deg = defaultdict(int)
    in_deg = defaultdict(int)
    for u, i, w in edges:
        out_deg[u] += 1
        in_deg[i] += 1
    onids = defaultdict(float)
    for u, i, w in edges:
        onids[u] += in_deg[i]
    ul = {k: dict(v) for k, v in u_labels.items()}
    il = defaultdict(lambda: defaultdict(float))
    for step in range(2, max_round + 1):
        if step % 2 == 0:
            il = defaultdict(lambda: defaultdict(float))
            for u, i, w in edges:
                for p, val in ul[u].items():
                    il[i][p] += val * w
        else:
            tmp = defaultdict(lambda: defaultdict(float))
            for u, i, w in edges:
                for p, val in il[i].items():
                    tmp[u][p] += val * w
            new_ul = {}
            for u in ul:
                new_ul[u] = {}
                for p, val in ul[u].items():
                    if val in (0.0, 1.0):
                        new_ul[u][p] = val
                    elif onids[u] != out_deg[u]:
                        new_ul[u][p] = (tmp[u][p] - out_deg[u] * val) / (
                            onids[u] - out_deg[u]
                        )
                    else:
                        new_ul[u][p] = val
            ul = new_ul
    return ul, {k: dict(v) for k, v in il.items()}


def test_lpa_u2i_matches_oracle(spark):
    from graphscope_spark.algorithms.lpa_u2i import lpa_u2i

    edges = [(1, 101, 1.0), (1, 102, 2.0), (2, 101, 1.0), (2, 103, 1.0),
             (3, 102, 1.0), (3, 103, 3.0)]
    u_labels = {1: {0: 1.0, 1: 0.3}, 2: {0: 0.0, 1: 0.7}, 3: {0: 0.5, 1: 0.2}}

    rows = [(u, p, v) for u, props in u_labels.items() for p, v in props.items()]
    udf = spark.createDataFrame(rows, "id long, prop_id int, value double")
    edf = spark.createDataFrame(edges, "u long, i long, weight double")

    got_u, got_i = lpa_u2i(udf, edf, max_round=7)
    gu = {(r["id"], r["prop_id"]): r["value"] for r in got_u.collect()}
    gi = {(r["id"], r["prop_id"]): r["value"] for r in got_i.collect()}
    want_u, want_i = _oracle(u_labels, edges, 7)
    for (u, p), v in gu.items():
        assert abs(v - want_u[u][p]) < 1e-9, (u, p, v, want_u[u][p])
    for (i, p), v in gi.items():
        assert abs(v - want_i[i][p]) < 1e-9, (i, p)
    assert len(gu) == 6 and len(gi) == 6
