"""Integer fixed-point PageRank: exactness against a pure-Python
replica, partition independence, dangling redistribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.graph import SCALE, pagerank, pagerank_topk


def _py_pagerank(edges, iters=5, damping=85, scale=SCALE):
    """Reference replica of the documented integer recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    s = {v: scale for v in nodes}
    teleport = ((100 - damping) * scale) // 100
    for _ in range(iters):
        dang = sum(s[v] for v in nodes if v not in out)
        dshare = dang // n
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += s[u] // out[u]
        s = {v: teleport + (damping * (contrib[v] + dshare)) // 100 for v in nodes}
    return s


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # d has out-edges but no in-edges
    ("e", "a"),
    # f: only a destination -> dangling (no out-edges)
    ("a", "f"),
]


def test_pagerank_matches_integer_replica(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["id"]: r["score_unat"] for r in pagerank(df, iterations=5).collect()}
    assert got == _py_pagerank(EDGES, iters=5)


def test_pagerank_partition_independent(spark):
    df1 = spark.createDataFrame(EDGES, ["src", "dst"]).repartition(7)
    df8 = spark.createDataFrame(EDGES, ["src", "dst"]).coalesce(1)
    r1 = {r["id"]: r["score_unat"] for r in pagerank(df1, iterations=3).collect()}
    r8 = {r["id"]: r["score_unat"] for r in pagerank(df8, iterations=3).collect()}
    assert r1 == r8


def test_pagerank_dangling_mass_redistributes(spark):
    # Two nodes: a -> b, b dangling. Without redistribution b's mass
    # would leave the system; with it, a keeps receiving b's share.
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r["id"]: r["score_unat"] for r in pagerank(df, iterations=1).collect()}
    # dang = SCALE (b), dshare = SCALE // 2; a gets teleport + 85% of dshare
    assert got["a"] == 150000 + (85 * (SCALE // 2)) // 100
    # b gets a's full score plus the dangling share
    assert got["b"] == 150000 + (85 * (SCALE + SCALE // 2)) // 100


def test_pagerank_topk_ranks_bounded(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    top = pagerank_topk(df, k=3, iterations=2).collect()
    assert [r["rank"] for r in top] == [1, 2, 3]
    scores = [r["score_unat"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_pagerank_rejects_bad_args(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def _py_ppr(edges, seed_set, iters=3, damping=85, scale=SCALE):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    sd = {v: (1 if v in seed_set else 0) for v in nodes}
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n_t = sum(sd.values())
    s = {v: scale * sd[v] for v in nodes}
    teleport = ((100 - damping) * scale) // 100
    for _ in range(iters):
        dang = sum(s[v] for v in nodes if v not in out)
        dshare = dang // n_t
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += s[u] // out[u]
        s = {
            v: sd[v] * teleport + (damping * (contrib[v] + sd[v] * dshare)) // 100
            for v in nodes
        }
    return s


def test_personalized_pagerank_matches_replica_and_gates_mass(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["id"])
    got = {
        r["id"]: r["score_unat"]
        for r in pagerank(df, iterations=3, seeds=seeds).collect()
    }
    assert got == _py_ppr(EDGES, {"a"}, iters=3)
    # non-seed source-less nodes hold no mass: d only receives via edges
    assert got["d"] == 0  # d has no in-edges and is not a seed


def test_personalized_pagerank_ignores_unknown_seeds_and_rejects_empty(spark):
    import pytest

    df = spark.createDataFrame(EDGES, ["src", "dst"])
    both = spark.createDataFrame([("a",), ("zzz",)], ["id"])
    only_a = spark.createDataFrame([("a",)], ["id"])
    ra = {r["id"]: r["score_unat"] for r in pagerank(df, iterations=2, seeds=both).collect()}
    rb = {r["id"]: r["score_unat"] for r in pagerank(df, iterations=2, seeds=only_a).collect()}
    assert ra == rb  # "zzz" is not a graph node: ignored
    ghost = spark.createDataFrame([("zzz",)], ["id"])
    with pytest.raises(ValueError, match="no seed"):
        pagerank(df, seeds=ghost)


def test_connected_components_finds_all_components(spark):
    from cdf_spark.operators.graph import connected_components

    # two components: {a,b,c,d} (chain) and {x,y}; direction ignored
    edges = [("b", "a"), ("b", "c"), ("d", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_partition_independent_and_bounded(spark):
    import pytest

    from cdf_spark.operators.graph import connected_components

    edges = [(f"n{i}", f"n{i+1}") for i in range(12)]  # one long chain
    d1 = spark.createDataFrame(edges, ["src", "dst"]).repartition(8)
    r1 = {r["id"]: r["component"] for r in connected_components(d1).collect()}
    assert set(r1.values()) == {"n0"}
    # a diameter-12 chain cannot converge in 3 synchronous rounds
    d2 = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(d2, max_iterations=3)


def test_star_cc_long_chain_converges_past_propagation_budget(spark):
    """A 400-diameter chain converges in O(log n) star rounds — 13x
    past what min-label propagation could do in the same 30-round
    budget (it needs diameter rounds)."""
    from cdf_spark.operators.graph import connected_components_star

    rows = [(i, i + 1) for i in range(1000, 1399)] + [(1, 2), (2, 3), (3, 1), (7, 7)]
    e = spark.createDataFrame(rows, "src long, dst long")
    comp = {r["id"]: r["component"] for r in connected_components_star(e).collect()}
    assert all(comp[i] == 1000 for i in range(1000, 1400))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[7] == 7  # self-loop-only node labels itself


def test_star_cc_matches_min_label_propagation(spark):
    """Same labeling as the min-label sibling on a multi-component
    graph (both label each component by its minimum node id)."""
    from cdf_spark.operators.graph import connected_components, connected_components_star

    rows = [(1, 5), (5, 9), (2, 6), (6, 2), (10, 11), (12, 12)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = {(r["id"], r["component"]) for r in connected_components(e, max_iterations=20).collect()}
    b = {(r["id"], r["component"]) for r in connected_components_star(e).collect()}
    assert a == b


def test_star_cc_raises_past_round_budget(spark):
    import pytest as _pytest

    from cdf_spark.operators.graph import connected_components_star

    e = spark.createDataFrame([(i, i + 1) for i in range(100)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(e, max_rounds=2)


def test_cc_star_final_plan_is_checkpoint_bounded(spark):
    """Plan guard (r14): every star-contraction round localCheckpoints
    its edge set, so the FINAL plan is just nodes ⋈ star over two
    checkpointed tables — no re-derived rounds, no source scans,
    bounded exchanges regardless of how many rounds ran."""
    import tempfile

    from cdf_spark.operators.graph import connected_components_star

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, i + 1) for i in range(1, 40)] + [(100, 101)], ["src", "dst"]
        ).write.mode("overwrite").parquet(f"{tmp}/edges")
        edges = spark.read.parquet(f"{tmp}/edges")
        out = connected_components_star(edges)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "rounds must be checkpoint-truncated"
        assert plan.count("Exchange") <= 3
        comps = {r.id: r.component for r in out.collect()}
        assert comps[39] == 1 and comps[101] == 100


def test_graph_loops_release_intermediate_checkpoints(spark):
    """The iterative operators pin per-round intermediates; blocks
    behind the materialization frontier must be RELEASED as the loop
    advances (r15, guide §5) — only the pins the returned frame's
    lineage still needs may survive."""
    from cdf_spark.operators.graph import (
        connected_components,
        connected_components_star,
        pagerank,
    )

    def stored():
        sc = spark.sparkContext._jsc.sc()
        return {i.id() for i in sc.getRDDStorageInfo()}

    n = 10
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(1, n)], ["src", "dst"]
    )

    before = stored()
    out = connected_components(chain)
    assert {r.component for r in out.collect()} == {"n01"}
    leaked = stored() - before
    # surviving: the final label pin + the result still references it
    assert len(leaked) <= 1, f"connected_components leaked {leaked}"

    before = stored()
    out = connected_components_star(chain)
    assert {r.component for r in out.collect()} == {"n01"}
    leaked = stored() - before
    # surviving: the final edge pin + the nodes pin (in the result's lineage)
    assert len(leaked) <= 2, f"connected_components_star leaked {leaked}"

    before = stored()
    out = pagerank(chain, iterations=4)
    assert out.count() == n
    leaked = stored() - before
    # surviving: the last round's score pin + nodes/e2 (in the lineage)
    assert len(leaked) <= 3, f"pagerank leaked {leaked}"


def test_bradley_terry_releases_intermediate_checkpoints(spark):
    from cdf_spark.operators.preference import bradley_terry_strengths

    def stored():
        sc = spark.sparkContext._jsc.sc()
        return {i.id() for i in sc.getRDDStorageInfo()}

    duels = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 0), ("c", "a", 1)] * 3,
        ["i", "j", "win"],
    )
    before = stored()
    out = bradley_terry_strengths(duels, iterations=4)
    assert out.count() == 3
    leaked = stored() - before
    # surviving: the final round's raw pin only
    assert len(leaked) <= 1, f"bradley_terry leaked {leaked}"
