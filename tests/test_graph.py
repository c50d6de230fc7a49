"""Graph analytics (operators/graph.py): fixed-point PageRank and
ordered-wedge triangle counting. PageRank expectations are computed by a
pure-Python replay of the SAME integer recurrence (the spec is the
arithmetic, not a float approximation); triangles against hand-counted
graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.dedup import dedup_scope
from topnotch_spark.operators.graph import (
    cooccurrence_edges,
    pagerank,
    triangle_counts,
)


def _py_pagerank(uedges, iters, scale=10**12, dn=17, dd=20):
    """Driver-side replay of the fixed-point recurrence over undirected
    unique edges: the independent expectation for the Spark plan."""
    adj: dict[int, set[int]] = {}
    for a, b in uedges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    tp_of = lambda: (scale * (dd - dn) // dd) // n  # noqa: E731
    rank = {v: scale // n for v in adj}
    for _ in range(iters):
        contrib = {v: 0 for v in adj}
        for v, nbrs in adj.items():
            share = (rank[v] * dn // dd) // len(nbrs)
            for u in nbrs:
                contrib[u] += share
        rank = {v: tp_of() + contrib[v] for v in adj}
    return rank


TRIANGLE_PLUS_TAIL = [(1, 2), (1, 3), (2, 3), (3, 4)]  # K3 + pendant


def test_pagerank_matches_python_replay(spark):
    edges = spark.createDataFrame(TRIANGLE_PLUS_TAIL, "src long, dst long")
    with dedup_scope():
        got = {
            r["node"]: (r["out_degree"], r["rank_scaled"])
            for r in pagerank(edges, iters=5).collect()
        }
    want = _py_pagerank(TRIANGLE_PLUS_TAIL, iters=5)
    degs = {1: 2, 2: 2, 3: 3, 4: 1}
    assert got == {v: (degs[v], want[v]) for v in want}
    # node 3 (highest degree, on every path) must outrank the pendant
    assert got[3][1] > got[4][1]


def test_pagerank_star_center_dominates(spark):
    star = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(star, "src long, dst long")
    with dedup_scope():
        rows = {r["node"]: r["rank_scaled"] for r in pagerank(edges, iters=6).collect()}
    want = _py_pagerank(star, iters=6)
    assert rows == want
    leaves = [rows[i] for i in range(1, 6)]
    assert rows[0] > max(leaves)
    assert len(set(leaves)) == 1  # symmetry: all leaves identical


def test_pagerank_disconnected_components_independent(spark):
    """Two disjoint K2s: every node is symmetric, so all four ranks are
    equal and each equals the 4-node uniform fixed point."""
    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    with dedup_scope():
        rows = {r["node"]: r["rank_scaled"] for r in pagerank(edges, iters=4).collect()}
    assert len(set(rows.values())) == 1
    assert rows == _py_pagerank([(1, 2), (3, 4)], iters=4)


def test_triangle_counts_k3_plus_tail(spark):
    edges = spark.createDataFrame(TRIANGLE_PLUS_TAIL, "src long, dst long")
    with dedup_scope():
        rows = {
            r["node"]: (r["degree"], r["tri_count"], r["clustering_coeff"])
            for r in triangle_counts(edges).collect()
        }
    assert rows[1] == (2, 1, 1.0)
    assert rows[2] == (2, 1, 1.0)
    assert rows[3] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert rows[4] == (1, 0, 0.0)


def test_triangle_counts_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4, "src long, dst long")
    with dedup_scope():
        rows = {
            r["node"]: (r["degree"], r["tri_count"], r["clustering_coeff"])
            for r in triangle_counts(edges).collect()
        }
    assert rows == {v: (3, 3, 1.0) for v in range(4)}


def test_cooccurrence_edges_support_and_basket_valve(spark):
    rows = [
        # basket 1+2 both contain {10, 20} -> support 2
        (1, 10), (1, 20), (2, 10), (2, 20),
        # {10, 30} co-occur once
        (1, 30),
        # duplicate (basket,item) rows count once (set semantics)
        (2, 10),
        # a mega-basket that must be dropped by the valve
        (9, 10), (9, 20), (9, 30), (9, 40),
    ]
    df = spark.createDataFrame(rows, "b long, i long")
    got = {
        (r["src"], r["dst"]): r["pair_count"]
        for r in cooccurrence_edges(
            df, "b", "i", max_basket_items=3, min_support=1
        ).collect()
    }
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
    sup2 = cooccurrence_edges(df, "b", "i", max_basket_items=3, min_support=2)
    assert [(r["src"], r["dst"]) for r in sup2.collect()] == [(10, 20)]


def test_pagerank_plan_has_no_cartesian_beyond_count_frame(spark):
    """The only nominal cross join is the broadcast 1-row node-count
    frame; the physical plan must not contain a CartesianProduct."""
    edges = spark.createDataFrame(TRIANGLE_PLUS_TAIL, "src long, dst long")
    with dedup_scope():
        plan = pagerank(edges, iters=1)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_graph_plan_command_both_methods(spark, tmp_path):
    """The `graph` plan command: pagerank over built co-occurrence
    edges, triangles over a direct edge-list input — results must match
    calling the operators directly."""
    import json

    from topnotch_spark.engine import TnEngine

    sf = "/root/testdata/sf0.001"
    plan = {
        "commands": [
            {
                "command": "graph",
                "input": {"ref": f"{sf}/lineitem.parquet", "onDisk": True},
                "params": {
                    "method": "pagerank",
                    "basketColumn": "l_orderkey",
                    "itemColumn": "l_partkey",
                    "maxBasketItems": 12,
                    "iters": 3,
                },
                "outputKey": "partRank",
            },
            {
                "command": "graph",
                "input": {"ref": f"{sf}/lineitem.parquet", "onDisk": True},
                "params": {
                    "method": "triangles",
                    "basketColumn": "l_orderkey",
                    "itemColumn": "l_partkey",
                    "minSupport": 2,
                },
                "outputKey": "partTris",
            },
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    pr = engine.registry["partRank"]
    assert {"node", "out_degree", "rank_scaled"} == set(pr.columns)
    got = pr.count()
    from topnotch_spark.catalog import load

    n_parts = (
        load(spark, sf, "lineitem").select("l_partkey").distinct().count()
    )
    assert 0 < got <= n_parts
    tris = engine.registry["partTris"]
    assert {"node", "degree", "tri_count", "clustering_coeff"} == set(
        tris.columns
    )


def test_graph_plan_requires_edge_or_basket_columns(spark, tmp_path):
    import json

    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "graph",
                "input": {
                    "ref": "/root/testdata/sf0.001/lineitem.parquet",
                    "onDisk": True,
                },
                "params": {"method": "pagerank"},
                "outputKey": "x",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    with pytest.raises(ValueError, match="srcColumn"):
        TnEngine(spark).run(str(p))


def _py_ppr(wedges, seeds, iters, scale=10**12, dn=17, dd=20):
    """Driver-side replay of the personalized weighted recurrence:
    wedges = [(a, b, w)] undirected; teleport only to seeds."""
    adj: dict[int, dict[int, int]] = {}
    for a, b, w in wedges:
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    seeds = [v for v in seeds if v in adj]
    ns = len(seeds)
    base = scale * (dd - dn) // dd
    rank = {v: (scale // ns if v in seeds else 0) for v in adj}
    for _ in range(iters):
        contrib = {v: 0 for v in adj}
        for v, nbrs in adj.items():
            damped = rank[v] * dn // dd
            wout = sum(nbrs.values())
            for u, w in nbrs.items():
                contrib[u] += damped * w // wout
        rank = {
            v: (base // ns if v in seeds else 0) + contrib[v] for v in adj
        }
    return rank


def test_ppr_matches_python_replay_weighted(spark):
    from topnotch_spark.operators.graph import personalized_pagerank

    wedges = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 4, 5)]
    edges = spark.createDataFrame(wedges, "src long, dst long, pair_count long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")  # 99 not in graph
    with dedup_scope():
        got = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(
                edges, seeds, iters=5, weight_col="pair_count"
            ).collect()
        }
    assert got == _py_ppr(wedges, [1, 99], iters=5)
    # mass concentrates around the seed: the far node ranks last, and
    # the seed's heavy-edge neighbor beats its light-edge neighbor
    assert got[4] == min(got.values())
    assert got[2] > got[3]


def test_ppr_unreachable_component_ranks_zero(spark):
    from topnotch_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    with dedup_scope():
        got = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(edges, seeds, iters=4).collect()
        }
    assert got[3] == 0 and got[4] == 0
    assert got[1] > 0 and got[2] > 0
    assert got == _py_ppr([(1, 2, 1), (3, 4, 1)], [1], iters=4)


def test_ppr_unweighted_equals_weight_one(spark):
    from topnotch_spark.operators.graph import personalized_pagerank

    e = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    w1 = spark.createDataFrame(
        [(a, b, 1) for a, b in e], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(2,)], "node long")
    with dedup_scope():
        plain = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(edges, seeds, iters=3).collect()
        }
        weighted = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(
                w1, seeds, iters=3, weight_col="w"
            ).collect()
        }
    assert plain == weighted


def test_graph_plan_ppr_method(spark, tmp_path):
    import json

    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "graph",
                "input": {
                    "ref": "/root/testdata/sf0.001/lineitem.parquet",
                    "onDisk": True,
                },
                "params": {
                    "method": "ppr",
                    "basketColumn": "l_orderkey",
                    "itemColumn": "l_partkey",
                    "minSupport": 2,
                    "weightColumn": "pairCount",
                    "seeds": [1, 2, 3],
                    "iters": 3,
                },
                "outputKey": "related",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rel = engine.registry["related"]
    assert {"node", "out_degree", "rank_scaled"} == set(rel.columns)


def test_graph_plan_ppr_requires_seeds(spark, tmp_path):
    import json

    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "graph",
                "input": {
                    "ref": "/root/testdata/sf0.001/lineitem.parquet",
                    "onDisk": True,
                },
                "params": {
                    "method": "ppr",
                    "basketColumn": "l_orderkey",
                    "itemColumn": "l_partkey",
                },
                "outputKey": "x",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    with pytest.raises(ValueError, match="requires param 'seeds'"):
        TnEngine(spark).run(str(p))


def test_graph_plan_components_method(spark, tmp_path):
    import json

    from topnotch_spark.engine import TnEngine

    edges_pq = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a long, b long"
    ).write.parquet(edges_pq)
    plan = {
        "commands": [
            {
                "command": "graph",
                "input": {"ref": edges_pq, "onDisk": True},
                "params": {"method": "components",
                           "srcColumn": "a", "dstColumn": "b"},
                "outputKey": "comps",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    got = {
        r["id"]: r["component_id"]
        for r in engine.registry["comps"].collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
