"""PageRank: distributed loop vs an independent single-machine
reference, mass conservation, dangling handling."""

import math

from walker_spark.operators.graph import pagerank


def _reference(edges, nodes, iters=5, d=0.85, q=12):
    """Plain-Python PageRank with the operator's exact quantization
    (half-away rounding per step) — an independent reference."""
    def rq(x):
        return math.floor(x * 10.0**q + 0.5) / 10.0**q

    n = len(nodes)
    out = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: rq(1.0 / n) for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for s, t in edges:
            inc[t] += rq(r[s] / out[s])
        dang = sum(r[v] for v in nodes if v not in out)
        base = (1.0 - d) / n + d * rq(dang) / n
        r = {v: rq(base + d * inc[v]) for v in nodes}
    return {v: round(r[v], 6) for v in nodes}


def test_pagerank_matches_reference(spark):
    # a graph with hubs, chains, a dangling sink, and an isolated node
    edges = (
        [(0, i) for i in range(1, 6)]          # hub out
        + [(i, 0) for i in range(1, 6)]        # hub in
        + [(5, 6), (6, 7), (7, 8)]             # chain into dangling 8
        + [(2, 9), (3, 9)]                     # 9: two in-links, dangling
    )
    nodes = list(range(11))                    # 10 is isolated
    e = spark.createDataFrame(edges, "s long, t long")
    v = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r["id"]: r["rank"] for r in pagerank(e, nodes=v, iterations=5).collect()}
    want = _reference(edges, nodes)
    assert got == want
    # mass is conserved up to quantization dust
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # structure sanity: the hub outranks chain members; 9 > isolated 10
    assert got[0] == max(got.values())
    assert got[9] > got[10] > 0


def test_pagerank_edge_derived_nodes_and_empty(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "s long, t long")
    got = {r["id"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    # symmetric 2-cycle: equal ranks, each ~0.5
    assert got[1] == got[2]
    assert abs(got[1] - 0.5) < 1e-6
    empty = spark.createDataFrame([], "s long, t long")
    assert pagerank(empty, iterations=2).collect() == []
