"""PageRank: distributed result pinned to the serial reference on known
graphs; stochastic invariants (ranks sum to 1, dangling handled)."""

from __future__ import annotations

from apsviz_timeseriesdb_ingest_spark.llm.graph import _pagerank_py, pagerank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_serial_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"),            # d has no in-links
             ("c", "e")]            # e is dangling (no out-links)
    got = _run(spark, edges, iters=15)
    exp = _pagerank_py(edges, iters=15)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9  # stochastic: mass conserved
    # the hub everything points at outranks the unreferenced node
    assert got["c"] > got["d"]


def test_pagerank_classic_cycle_uniform(spark):
    # a→b→c→a: perfect symmetry ⇒ uniform ranks
    got = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")], iters=10)
    assert all(abs(r - 1 / 3) < 1e-9 for r in got.values())


def test_pagerank_duplicate_edges_and_empty(spark):
    # duplicate edges count once
    g1 = _run(spark, [("a", "b"), ("a", "b"), ("b", "a")], iters=8)
    g2 = _run(spark, [("a", "b"), ("b", "a")], iters=8)
    assert g1 == g2
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_pagerank_all_dangling(spark):
    # one edge, dst dangling: teleport + dangling redistribution keeps
    # the distribution proper
    got = _run(spark, [("a", "b")], iters=30)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["b"] > got["a"]


def test_pagerank_weighted(spark):
    """Weighted walk: duplicate (src,dst) weights sum, rank flows
    proportional to weight, serial parity holds, and a heavier in-link
    buys a higher rank."""
    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
             ("c", "a", 1.0), ("a", "b", 1.0)]  # a→b total weight 4
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r.node: r.rank
           for r in pagerank(df, weight_col="w", iters=12).collect()}
    exp = _pagerank_py(edges, iters=12)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["b"] > got["c"]  # 4/5 of a's rank vs 1/5

    # weight 1.0 everywhere == unweighted
    uni = spark.createDataFrame([(s, d, 1.0) for s, d in
                                 [("a", "b"), ("b", "c"), ("c", "a")]],
                                "src string, dst string, w double")
    w1 = {r.node: r.rank
          for r in pagerank(uni, weight_col="w", iters=8).collect()}
    u = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")], iters=8)
    assert all(abs(w1[v] - u[v]) < 1e-12 for v in u)


def test_pagerank_serial_rejects_mixed_arity():
    """A list mixing (src,dst) and (src,dst,w) tuples is ambiguous —
    an unweighted duplicate would reset an accumulated weight
    (ADVICE r3). Uniform arity is required."""
    import pytest

    with pytest.raises(ValueError, match="mixed edge tuple arities"):
        _pagerank_py([("a", "b", 2.0), ("a", "b")])


def test_pagerank_partitioning_independent(spark):
    """Decimal-summed contributions make the distributed result
    bit-identical across partition layouts (ADVICE r3): the same graph
    through 1 partition and 16 partitions produces EXACTLY equal
    ranks, not merely within tolerance."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)] + \
        [("hub", f"n{i}") for i in range(23)] + \
        [(f"n{i}", "hub") for i in range(0, 23, 3)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r.node: r.rank
          for r in pagerank(df.coalesce(1), iters=20).collect()}
    r16 = {r.node: r.rank
           for r in pagerank(df.repartition(16), iters=20).collect()}
    assert r1 == r16
    exp = _pagerank_py(edges, iters=20)
    for v in exp:
        assert abs(r1[v] - exp[v]) < 1e-9
