"""Connected-components / dup-cluster tests: chain, triangle, multiple
components, determinism, convergence failure on an adversarial budget."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.cluster import connected_components, dup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_1 long, id_2 long")


def _comp_map(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, needs multiple propagation rounds
    comps = _comp_map(
        connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    )
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_triangle(spark):
    comps = _comp_map(
        connected_components(
            _pairs(spark, [(10, 20), (20, 30), (10, 30), (7, 8)])
        )
    )
    assert comps == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_edge_direction_irrelevant(spark):
    a = _comp_map(connected_components(_pairs(spark, [(5, 1), (2, 5)])))
    b = _comp_map(connected_components(_pairs(spark, [(1, 5), (5, 2)])))
    assert a == b == {1: 1, 2: 1, 5: 1}


def test_dup_clusters_sizes_and_keep(spark):
    out = dup_clusters(_pairs(spark, [(1, 2), (2, 3), (9, 8)])).collect()
    rows = {r["id"]: (r["cluster_id"], r["cluster_size"], r["keep"]) for r in out}
    assert rows == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        8: (8, 2, True),
        9: (8, 2, False),
    }


def test_long_chain_converges_within_default_budget(spark):
    """Pathological 50-link chain (diameter 50): pointer jumping must
    collapse it within the default max_iter=25 — O(log d) rounds, where
    plain min-propagation would need 50."""
    comps = _comp_map(
        connected_components(_pairs(spark, [(i, i + 1) for i in range(50)]))
    )
    assert comps == {i: 0 for i in range(51)}


def test_long_chain_converges_in_log_rounds(spark):
    # even a tight budget of 8 rounds covers diameter 50 via path halving
    comps = _comp_map(
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(50)]), max_iter=8
        )
    )
    assert set(comps.values()) == {0}


def test_nonconvergence_raises(spark):
    # a 6-chain cannot converge in 1 round (initial tightening + 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(1, 8)]), max_iter=1
        )


def test_keep_best_in_cluster_prefers_score(spark):
    from topnotch_spark.operators.cluster import keep_best_in_cluster

    pairs = _pairs(spark, [(1, 2), (2, 3), (8, 9)])
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (8, 0.4), (9, 0.4)],
        "id long, q double",
    )
    out = {r["id"]: r for r in keep_best_in_cluster(pairs, scores, "q").collect()}
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    # tie on score -> min id wins
    assert out[8]["keep"] and not out[9]["keep"]
    assert out[2]["cluster_id"] == 1 and out[9]["cluster_id"] == 8


def test_keep_best_unscored_members_rank_last(spark):
    from topnotch_spark.operators.cluster import keep_best_in_cluster

    pairs = _pairs(spark, [(1, 2), (2, 3)])
    # doc 3 has no score row: it must still appear, and never win
    scores = spark.createDataFrame([(1, 0.2), (2, 0.9)], "id long, q double")
    out = {r["id"]: r for r in keep_best_in_cluster(pairs, scores, "q").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    assert out[3]["q"] is None
