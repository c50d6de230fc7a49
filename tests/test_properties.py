"""Property-based tests (hypothesis): round-2 operators vs pure-Python
references on randomized inputs. Each example runs ONE Spark job over a
whole generated batch (not per-row jobs), so examples stay cheap."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topnotch_spark.operators.chunking import chunk_documents
from topnotch_spark.operators.cluster import connected_components
from topnotch_spark.operators.curation import pack_token_shards

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


def _py_chunks(
    text: str, size: int, step: int, overlap: int
) -> list[tuple[int, int, str]]:
    last_start = max(len(text) - overlap - 1, 0)
    return [
        (i, s, text[s : s + size])
        for i, s in enumerate(range(0, last_start + 1, step))
    ]


@settings(**SETTINGS)
@given(texts=st.lists(ASCII, min_size=1, max_size=15),
       size=st.integers(2, 12), overlap_frac=st.integers(0, 99))
def test_chunking_matches_python_reference(spark, texts, size, overlap_frac):
    overlap = (size - 1) * overlap_frac // 100  # any overlap < size
    step = size - overlap
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", size, overlap).collect()
    }
    want = {
        (i, ci): (s, c)
        for i, t in enumerate(texts)
        if len(t) > 0
        for ci, s, c in _py_chunks(t, size, step, overlap)
    }
    assert got == want


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # second pass: label every node with the component MIN
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, r), n)
    return {n: comp_min[find(n)] for n in parent}


@settings(**SETTINGS)
@given(edges=st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1, max_size=40,
))
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_1 long, id_2 long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _py_components(edges)


@settings(**SETTINGS)
@given(token_counts=st.lists(st.integers(0, 30), min_size=1, max_size=25),
       budget=st.integers(1, 50))
def test_pack_shards_matches_prefix_sum(spark, token_counts, budget):
    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_token_shards(df, "doc_id", "text", budget=budget).collect()
    }
    cum = 0
    for i, n in enumerate(token_counts):
        assert got[i] == (n, cum // budget)
        cum += n


# ---- empty-input robustness (not hypothesis; plain edge fixtures) ---------

def test_empty_inputs_do_not_crash(spark):
    from pyspark.sql import functions as F

    from topnotch_spark.operators.cluster import connected_components, dup_clusters
    from topnotch_spark.operators.curation import (
        cross_corpus_overlap,
        pii_scrub,
        quality_filter,
        stratified_sample,
        stratified_topn,
    )
    from topnotch_spark.operators.temporal import latest_per_key, resample_timeseries
    from topnotch_spark.operators.textqc import tfidf_keywords, vocab_topk

    docs = spark.createDataFrame([], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_1 long, id_2 long")
    events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert connected_components(pairs).count() == 0
    assert dup_clusters(pairs).count() == 0
    assert chunk_documents(docs, "doc_id", "text").count() == 0
    assert pii_scrub(docs, "doc_id", "text").count() == 0
    assert quality_filter(docs, "doc_id", "text").count() == 0
    assert stratified_sample(docs, "doc_id", "text", {"en": 0.5}).count() == 0
    assert stratified_topn(docs, "doc_id", "text", 5).count() == 0
    assert vocab_topk(docs, "doc_id", "text").count() == 0
    assert tfidf_keywords(docs, "doc_id", "text").count() == 0
    assert pack_token_shards(docs, "doc_id", "text").count() == 0
    assert latest_per_key(events, ["user_id"], "ts", "event_id").count() == 0
    assert resample_timeseries(events, "ts", "user_id", "value").count() == 0
    assert cross_corpus_overlap(docs, docs, "doc_id", "text").count() == 0
