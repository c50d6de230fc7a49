"""Property-based tests (hypothesis): round-10 session-2 operators vs
the pure-Python replays in test_round10b, on randomized inputs. Each
example runs whole-batch Spark jobs (the test_properties convention);
generated values stay on coarse grids so fixed-point snaps never sit on
rounding knife-edges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_round10b import (
    _backoff_replay,
    _kcenter_replay,
    _lpa_replay,
    _nb_replay,
    _t_replay,
    _w1_replay,
)

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# coarse-grid floats: two decimals, away from fixed-point tie points
GRID = st.integers(-300, 300).map(lambda i: i / 4.0)


@settings(**SETTINGS)
@given(
    ref=st.lists(GRID, min_size=2, max_size=60).filter(
        lambda v: max(v) > min(v)
    ),
    cur=st.lists(GRID, min_size=0, max_size=60),
    buckets=st.integers(2, 16),
)
def test_wasserstein_matches_replay(spark, ref, cur, buckets):
    from topnotch_spark.operators.drift import wasserstein_binned

    rdf = spark.createDataFrame([(v,) for v in ref], "x double")
    cdf = spark.createDataFrame([(v,) for v in cur], "x double")
    row = wasserstein_binned(rdf, cdf, "x", n_buckets=buckets).collect()[0]
    if not cur:
        assert row["w1"] is None
        return
    w1, w1n = _w1_replay(ref, cur, buckets)
    assert abs(row["w1"] - w1) < 1e-6
    assert abs(row["w1_norm"] - w1n) < 1e-6


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from("ABC")),
        min_size=1,
        max_size=80,
    )
)
def test_t_closeness_matches_replay(spark, rows):
    from topnotch_spark.operators.integrity import t_closeness

    df = spark.createDataFrame(
        [(f"g{g}", s) for g, s in rows], "q string, s string"
    )
    got = {
        r["q"]: r["t_distance"]
        for r in t_closeness(df, ["q"], "s", risky_only=False).collect()
    }
    exp = _t_replay([(f"g{g}", s) for g, s in rows], 1)
    assert set(got) == {q for (q,) in exp}
    for (q,), t in exp.items():
        assert abs(got[q] - t) < 2e-6, q


@settings(**SETTINGS)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=60,
    ).map(
        lambda ps: sorted({(min(a, b), max(a, b)) for a, b in ps if a != b})
    ).filter(lambda e: e),
    iters=st.integers(1, 3),
    weighted=st.booleans(),
)
def test_label_propagation_matches_replay(spark, raw, iters, weighted):
    from topnotch_spark.operators.graph import label_propagation

    weights = [((s * 7 + d) % 4) + 1 for s, d in raw] if weighted else None
    df = spark.createDataFrame(
        [
            (s, d, (weights[i] if weights else 1))
            for i, (s, d) in enumerate(raw)
        ],
        "src long, dst long, w long",
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            df, iters=iters, weight_col="w" if weighted else None
        ).collect()
    }
    assert got == _lpa_replay(raw, iters, weights)


@settings(**SETTINGS)
@given(
    ref=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    ),
    tgt=st.lists(
        st.lists(st.sampled_from("abcdez"), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_stupid_backoff_matches_replay(spark, ref, tgt):
    from topnotch_spark.operators.textqc import stupid_backoff

    tdf = spark.createDataFrame(
        list(enumerate(tgt)), "doc_id long, text string"
    )
    rdf = spark.createDataFrame([(t,) for t in ref], "text string")
    got = {
        r["doc_id"]: (
            r["n_trigrams"],
            r["n_tri_hit"],
            r["n_bi_backoff"],
            r["n_uni_backoff"],
            r["n_unseen"],
        )
        for r in stupid_backoff(tdf, rdf, "doc_id", "text").collect()
    }
    exp = _backoff_replay(ref, tgt)
    for i, e in exp.items():
        assert got[i] == e[:5], i


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.lists(st.sampled_from("pqrs"), min_size=1, max_size=6).map(
                " ".join
            ),
            st.booleans(),
        ),
        min_size=2,
        max_size=30,
    ).filter(
        lambda rs: any(y for _, y in rs) and any(not y for _, y in rs)
    )
)
def test_nb_weights_match_replay(spark, rows):
    from topnotch_spark.operators.textqc import nb_token_weights

    labeled = [(i, t, y) for i, (t, y) in enumerate(rows)]
    df = spark.createDataFrame(
        labeled, "doc_id long, text string, y boolean"
    )
    got = {
        r["token"]: r["weight_milli"]
        for r in nb_token_weights(df, "text", "y").collect()
    }
    wm, _, _ = _nb_replay(labeled)
    assert got == wm


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.lists(st.integers(1, 9), min_size=4, max_size=4),
        min_size=2,
        max_size=15,
    ),
    k=st.integers(1, 6),
)
def test_kcenter_matches_replay(spark, vecs, k):
    from topnotch_spark.operators.similarity import kcenter_select

    corpus = {i: [float(x) for x in v] for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        [(i, v) for i, v in corpus.items()],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r["pick_rank"], r["vec_id"], r["dist_to_selected_micro"])
        for r in kcenter_select(df, k=k, dim=4).collect()
    )
    assert got == sorted(_kcenter_replay(corpus, k))
