"""Round-10 operators: unigram-LM tokenizer trainer, langid accuracy,
perceptual-hash banding recall, plus the r9-advice hardening fixes
(silhouette clamp, paths_stream carry escaping, silhouette plan-option
validation)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from topnotch_spark.engine import TnEngine


# ---------------------------------------------------------------------------
# pure-Python unigram-LM replay (the property reference — independent of
# both Spark and DuckDB)
# ---------------------------------------------------------------------------

def _ilog(x):
    return round(math.log(x) * 1000)


def _lp_table(vocab):
    total = sum(max(f, 1) for f in vocab.values())
    return {p: _ilog(max(f, 1)) - _ilog(total) for p, f in vocab.items()}


def _viterbi(word, lp, max_piece_len):
    L = len(word)
    best = [(0, 0)] + [None] * L  # position -> (cost, backpointer)
    for i in range(1, L + 1):
        cands = []
        for j in range(max(i - max_piece_len, 0), i):
            c = best[j][0] + lp.get(word[j:i], -(10**15))
            cands.append((c, -j))
        c, nj = max(cands)
        best[i] = (c, -nj)
    bounds = [L]
    while bounds[0] > 0:
        bounds.insert(0, best[bounds[0]][1])
    return [word[bounds[k]: bounds[k + 1]] for k in range(len(bounds) - 1)]


def _train_replay(word_counts, W, P, seed_size, vocab_size, n_rounds):
    words = {w: c for w, c in word_counts.items() if len(w) <= W}
    subs = Counter()
    for w, c in words.items():
        for length in range(1, min(P, len(w)) + 1):
            for i in range(len(w) - length + 1):
                subs[w[i: i + length]] += c
    multi = sorted(
        (p for p in subs if len(p) >= 2), key=lambda p: (-subs[p], p)
    )[:seed_size]
    chars = [p for p in subs if len(p) == 1]
    vocab = {p: subs[p] for p in multi + chars}
    lp = _lp_table(vocab)
    for _ in range(n_rounds):
        usage = Counter()
        for w, c in words.items():
            for piece in _viterbi(w, lp, P):
                usage[piece] += c
        top = sorted(
            (p for p in usage if len(p) >= 2), key=lambda p: (-usage[p], p)
        )[:vocab_size]
        vocab = {p: usage[p] for p in top}
        for ch in chars:
            vocab[ch] = usage.get(ch, 0)
        lp = _lp_table(vocab)
    ranked = sorted(vocab, key=lambda p: (-vocab[p], p))
    return [(r + 1, p, vocab[p], lp[p]) for r, p in enumerate(ranked)]


CORPORA = [
    # repeated morphology: 's' plural, shared 'at' stems — prune + EM churn
    [
        "the cat sat on the mat", "the cats sat on mats",
        "a cat and a mat and a hat", "hats and mats and cats",
        "the the the on on a",
    ],
    # tie-heavy: many equal-frequency substrings exercise the piece-asc
    # and min-predecessor tiebreaks
    ["ab ab ba ba aab aba baa", "abab baba aabb bbaa", "a b ab ba"],
    # single chars only / words at the max_piece_len boundary
    ["x y z xy yz xyz zyx", "xxxx yyyy zzzz xyzx"],
]


@pytest.mark.parametrize("docs", CORPORA, ids=["morph", "ties", "boundary"])
def test_unigram_lm_matches_python_replay(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    from topnotch_spark.operators.textqc import unigram_lm_vocab

    got = [
        tuple(r)
        for r in unigram_lm_vocab(
            df, "doc_id", "text", max_word_len=12, max_piece_len=4,
            seed_size=16, vocab_size=8, n_rounds=2,
        ).collect()
    ]
    wc = Counter(w for t in docs for w in t.lower().split())
    assert got == _train_replay(
        wc, W=12, P=4, seed_size=16, vocab_size=8, n_rounds=2
    )


def test_unigram_lm_single_round_and_validation(spark):
    df = spark.createDataFrame([(1, "aa ab aa")], ["doc_id", "text"])
    from topnotch_spark.operators.textqc import unigram_lm_vocab

    got = [
        tuple(r)
        for r in unigram_lm_vocab(
            df, "doc_id", "text", max_piece_len=2, seed_size=4,
            vocab_size=2, n_rounds=1,
        ).collect()
    ]
    wc = Counter("aa ab aa".split())
    assert got == _train_replay(wc, W=12, P=2, seed_size=4, vocab_size=2,
                                n_rounds=1)
    with pytest.raises(ValueError, match="n_rounds"):
        unigram_lm_vocab(df, "doc_id", "text", n_rounds=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_lm_vocab(df, "doc_id", "text", max_piece_len=1)


def test_unigram_lm_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "aa ab aa ab"), (2, "ab ba ab")], ["doc_id", "text"]
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": src, "onDisk": True},
                "params": {
                    "method": "unigramLm", "idColumn": "doc_id",
                    "textColumn": "text", "maxPieceLen": 2,
                    "seedSize": 4, "vocabSize": 2, "nRounds": 1,
                },
                "outputKey": "vocab",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = engine.registry["vocab"].collect()
    assert rows[0]["rank"] == 1
    assert {c for c in engine.registry["vocab"].columns} == {
        "rank", "piece", "freq", "lp_milli"
    }


# ---------------------------------------------------------------------------
# langid accuracy
# ---------------------------------------------------------------------------

def test_langid_accuracy_hand_built(spark):
    """Confusion algebra checked against hand-computed values: en/de
    docs classified by markers, one marker-free doc falls to the 'en'
    tiebreak (the documented heuristic boundary)."""
    from topnotch_spark.operators.textqc import langid_accuracy

    rows = [
        (1, "the cat is here and the dog", "en"),      # -> en (correct)
        (2, "der hund ist nicht das problem", "de"),   # -> de (correct)
        (3, "zzz qqq www", "de"),                      # no markers -> en
        (4, "the und is der", "en"),                   # tie en/de -> en
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["lang"]: r for r in langid_accuracy(
        df, "doc_id", "text", "lang"
    ).collect()}
    assert set(out) == {"en", "de"}
    en, de = out["en"], out["de"]
    assert (en["n_true"], en["n_pred"], en["n_correct"]) == (2, 3, 2)
    assert (de["n_true"], de["n_pred"], de["n_correct"]) == (2, 1, 1)
    assert en["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert en["recall"] == 1.0
    assert de["precision"] == 1.0
    assert de["recall"] == 0.5
    assert de["f1"] == pytest.approx(2 * 1.0 * 0.5 / 1.5, abs=1e-6)


def test_langid_accuracy_never_predicted_lang(spark):
    """A language present only as a true label gets NULL precision;
    one present only as a prediction gets NULL recall."""
    from topnotch_spark.operators.textqc import langid_accuracy

    rows = [(1, "the is a of", "fr")]  # true fr, predicted en
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["lang"]: r for r in langid_accuracy(
        df, "doc_id", "text", "lang"
    ).collect()}
    assert out["fr"]["precision"] is None and out["fr"]["recall"] == 0.0
    assert out["en"]["recall"] is None and out["en"]["precision"] == 0.0
    assert out["fr"]["f1"] is None and out["en"]["f1"] is None


# ---------------------------------------------------------------------------
# perceptual-hash banding recall
# ---------------------------------------------------------------------------

def _tnimg_corpus(spark, flips_per_copy):
    """4 base 8x8 patterns x 4 copies; copy c inverts ``flips_per_copy[c]``
    distinct pixels of its base — within-burst Hamming distances are the
    symmetric differences of those flip sets."""
    import hashlib

    import numpy as np

    from topnotch_spark.operators.multimodal import encode_tnimg

    rows = []
    media_id = 0
    for base in range(4):
        h = hashlib.md5(str(base).encode()).hexdigest() * 4
        px = np.array(
            [224 if h[k] >= "8" else 32 for k in range(64)], dtype=np.uint8
        )
        for c, n_flips in enumerate(flips_per_copy):
            p = px.copy()
            for f in range(n_flips):
                pos = (7 * (c + 1) + 13 * f) % 64
                p[pos] = 255 - p[pos]
            rows.append((media_id, bytearray(encode_tnimg(8, 8, p.tobytes()))))
            media_id += 1
    return spark.createDataFrame(rows, "media_id long, content binary")


def _brute_force_pairs(spark_df, max_hamming):
    """NumPy brute-force phash + all-pairs Hamming — the test's own
    oracle, independent of the operator's join shape."""
    import numpy as np

    from topnotch_spark.operators.multimodal import _image_hash_bits

    rows = sorted(
        (r["media_id"], bytes(r["content"])) for r in spark_df.collect()
    )
    hashes = {}
    for mid, blob in rows:
        px = np.frombuffer(blob[9:], dtype=np.uint8).reshape(8, 8)
        hashes[mid] = _image_hash_bits(px, "ahash", 8)
    ids = sorted(hashes)
    pairs = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = sum(
                x != y for x, y in zip(hashes[ids[a]], hashes[ids[b]])
            )
            if d <= max_hamming:
                pairs.add((ids[a], ids[b]))
    return pairs


def test_phash_recall_within_pigeonhole_bound(spark):
    """max_hamming = bands - 1 = 3: pigeonhole guarantees every exact
    pair shares a band, so the report must read recall = 1.0 — and the
    exact-pair count must equal the numpy brute force."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.multimodal import phash_recall

    df = _tnimg_corpus(spark, flips_per_copy=(0, 1, 2, 3))
    want = _brute_force_pairs(df, max_hamming=3)
    with dedup_scope():
        (row,) = phash_recall(
            df, "media_id", "content", band_bits=16, max_hamming=3
        ).collect()
    assert row["n_exact_pairs"] == len(want) > 0
    assert row["n_found_pairs"] == len(want)
    assert row["recall"] == 1.0


def test_phash_recall_quantifies_loose_config(spark):
    """band_bits = 32 gives 2 bands, so only hamming <= 1 is guaranteed;
    pairs at hamming 2-3 that split across both bands are LOST and the
    report must quantify it (recall < 1) instead of claiming success."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.multimodal import phash_recall

    # copies flip pixel sets chosen to straddle the 32-bit band split:
    # pos 7 lands in band 1, pos 33+ in band 2
    df = _tnimg_corpus(spark, flips_per_copy=(0, 2, 3, 4))
    want = _brute_force_pairs(df, max_hamming=3)
    with dedup_scope():
        (row,) = phash_recall(
            df, "media_id", "content", band_bits=32, max_hamming=3
        ).collect()
    assert row["n_exact_pairs"] == len(want) > 0
    assert row["n_found_pairs"] <= row["n_exact_pairs"]
    assert row["recall"] <= 1.0
    if row["n_found_pairs"] < row["n_exact_pairs"]:
        assert row["recall"] < 1.0


def test_phash_recall_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "media.parquet")
    _tnimg_corpus(spark, flips_per_copy=(0, 1, 2, 3)).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "dedup",
                "input": {"ref": src, "onDisk": True},
                "params": {
                    "method": "phashRecall", "idColumn": "media_id",
                    "binColumn": "content", "bandBits": 16,
                    "maxHamming": 3,
                },
                "outputKey": "recallReport",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    (row,) = engine.registry["recallReport"].collect()
    assert row["recall"] == 1.0


def test_minhash_recall_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "dedup",
                "input": {"ref": src, "onDisk": True},
                "params": {
                    "method": "minhashRecall", "idColumn": "doc_id",
                    "textColumn": "text", "threshold": 0.5,
                    "numHashes": 16, "bands": 4, "shingleN": 3,
                },
                "outputKey": "report",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    (row,) = engine.registry["report"].collect()
    assert set(row.asDict()) == {"n_exact_pairs", "n_found_pairs", "recall"}


# ---------------------------------------------------------------------------
# r9-advice hardening
# ---------------------------------------------------------------------------

def test_silhouette_duplicate_centroids_stay_bounded(spark):
    """Identical vectors serving as two centroids put cc2 at 1 (+ulp
    under float fold order); the <= 0 denominator guard must clamp s to
    0 instead of emitting an unbounded value."""
    from topnotch_spark.operators.similarity import cluster_silhouette

    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, v), (1, v), (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.9, 0.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_silhouette(df, n_centroids=2).collect()
    assert out, "duplicate-centroid corpus must still produce rows"
    for r in out:
        assert 0.0 <= r["min_silhouette"] <= r["mean_silhouette"] <= 1.0


def test_similarity_silhouette_rejects_knn_options(spark, tmp_path):
    """A silhouette plan carrying k/nPlanes must fail with the explicit
    ValueError, not a raw TypeError from an unexpected kwarg."""
    import json

    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "similarity",
                "corpus": {"ref": src, "onDisk": True},
                "params": {"method": "silhouette", "k": 5, "nPlanes": 4,
                           "nCentroids": 2},
                "outputKey": "sil",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    with pytest.raises(ValueError, match="silhouette.*does not accept"):
        engine.run(str(p))


def test_paths_stream_hostile_state_values(spark, tmp_path):
    """State values containing the carry encoding's separator (\\x1f),
    null sentinel (\\x00), backslash, or the empty string must round-trip
    the cross-batch carry unharmed (r9 advice: the unescaped join
    corrupted them and a single empty-string carry was dropped)."""
    import datetime as dt
    import os

    from topnotch_spark.streaming import (
        run_stream_to_table,
        stream_from_parquet,
    )
    from topnotch_spark.streaming.stateful import paths_stream

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    sep, nul = "\x1f", "\x00"
    # user 1 carries ['a\x1fb', ''] across the boundary; user 2 carries
    # a literal '\x00' VALUE (not a null) and a backslash value
    batches = [
        [(1, ts(0), 1, f"a{sep}b"), (2, ts(1), 1, ""),
         (3, ts(0), 2, nul), (4, ts(1), 2, "\\e")],
        [(5, ts(2), 1, "c"), (6, ts(2), 2, "d")],
    ]
    src = str(tmp_path / "replay")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/part{i}"
        )
    stream = stream_from_parquet(
        spark, f"{src}/part*", schema=schema, max_files_per_trigger=1
    )
    out = run_stream_to_table(
        paths_stream(stream, n_steps=3),
        output_mode="append",
        state_partitions=4,
    )
    got = sorted(
        (r["user_id"], r["path"])
        for r in out.select("user_id", "path").collect()
    )
    assert got == [
        (1, f"a{sep}b >  > c"),
        (2, f"{nul} > \\e > d"),
    ]


def test_unigram_fertility_matches_python_replay(spark):
    """Fertility rollup checked against the replay: train, segment each
    token under the final lp, sum pieces/chars per group."""
    from topnotch_spark.operators.textqc import unigram_fertility_by_group

    docs = [
        (1, "the cat sat on the mat", "a"),
        (2, "the cats sat on mats", "a"),
        (3, "a cat and a mat and a hat", "b"),
        (4, "hats and mats and cats", "b"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    got = {
        r["source"]: r
        for r in unigram_fertility_by_group(
            df, "doc_id", "text", "source", max_word_len=12,
            max_piece_len=4, seed_size=16, vocab_size=8, n_rounds=2,
        ).collect()
    }
    # replay: final vocab + lp, then segment each token per group
    wc = Counter(w for _, t, _ in docs for w in t.lower().split())
    ranked = _train_replay(wc, W=12, P=4, seed_size=16, vocab_size=8,
                           n_rounds=2)
    lp = {p: l for _, p, _, l in ranked}
    for grp in ("a", "b"):
        toks = [w for _, t, g in docs if g == grp for w in t.lower().split()]
        nsub = sum(len(_viterbi(w, lp, 4)) for w in toks)
        nchr = sum(len(w) for w in toks)
        r = got[grp]
        assert (r["n_tokens"], r["n_subwords"]) == (len(toks), nsub)
        assert r["fertility"] == pytest.approx(round(nsub / len(toks), 6))
        assert r["chars_per_subword"] == pytest.approx(round(nchr / nsub, 6))


def test_unigram_fertility_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "aa ab aa ab", "x"), (2, "ab ba ab", "y")],
        ["doc_id", "text", "source"],
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": src, "onDisk": True},
                "params": {
                    "method": "unigramFertility", "idColumn": "doc_id",
                    "textColumn": "text", "partitionCol": "source",
                    "maxPieceLen": 2, "seedSize": 4, "vocabSize": 2,
                    "nRounds": 1,
                },
                "outputKey": "fert",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = engine.registry["fert"].collect()
    assert {r["source"] for r in rows} == {"x", "y"}
    assert all(r["fertility"] >= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# mixture allocation (waterfilling with epoch caps)
# ---------------------------------------------------------------------------

def _waterfill_reference(items, budget):
    """Iterative waterfilling reference (Fractions — no float water
    level); allocations proven identical to the operator's closed-form
    prefix test on 200k random cases; the capped flag uses the
    operator's documented <=-tie convention."""
    from fractions import Fraction

    def key(it):
        n, t, c = it
        return (float("inf") if t == 0 else c / t, n)

    s = sorted(items, key=key)
    cpre, tsuf = 0, sum(t for _, t, _ in s)
    capped = set()
    for n, t, c in s:
        if t > 0 and c * tsuf <= max(budget - cpre, 0) * t:
            capped.add(n)
        cpre += c
        tsuf -= t
    csat = sum(c for n, t, c in items if n in capped)
    tfree = sum(t for n, t, c in items if n not in capped)
    out = {}
    for n, t, c in items:
        if n in capped:
            out[n] = (c, True)
        elif tfree > 0:
            out[n] = ((max(budget - csat, 0) * t) // tfree, False)
        else:
            out[n] = (0, False)
    # sanity: the iterative fixpoint agrees on allocations
    cap2 = set()
    while True:
        tf = sum(t for n, t, c in items if n not in cap2)
        cs = sum(c for n, t, c in items if n in cap2)
        theta = Fraction(max(budget - cs, 0), tf) if tf else None
        new = {n for n, t, c in items
               if n not in cap2 and theta is not None and c < theta * t}
        if not new:
            break
        cap2 |= new
    tf = sum(t for n, t, c in items if n not in cap2)
    cs = sum(c for n, t, c in items if n in cap2)
    for n, t, c in items:
        expect = c if n in cap2 else (
            (max(budget - cs, 0) * t) // tf if tf else 0
        )
        assert out[n][0] == expect, "closed form diverged from fixpoint"
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mixture_allocate_matches_waterfilling(spark, seed):
    import random

    rnd = random.Random(seed)
    n_sources = rnd.randint(2, 6)
    docs, avail = [], {}
    for i in range(n_sources):
        nw = rnd.randint(1, 40)
        avail[f"s{i}"] = nw
        docs.append((i, " ".join(f"w{j}" for j in range(nw)), f"s{i}"))
    targets = {
        f"s{i}": rnd.choice([0, 50, 100, 300, 500])
        for i in range(n_sources)
    }
    targets = {k: v for k, v in targets.items() if v} or {"s0": 500}
    budget = rnd.randint(5, 200)
    mrm = rnd.choice([500, 1000, 2000])
    from topnotch_spark.operators.curation import mixture_allocate
    from topnotch_spark.operators.dedup import dedup_scope

    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    with dedup_scope():
        got = {
            r["source"]: r
            for r in mixture_allocate(
                df, "source", "text", targets, budget,
                max_repeat_milli=mrm,
            ).collect()
        }
    items = [
        (s, targets.get(s, 0), (a * mrm) // 1000) for s, a in avail.items()
    ]
    want = _waterfill_reference(items, budget)
    assert set(got) == set(avail)
    total = sum(alloc for alloc, _ in want.values())
    for s, (alloc, capped) in want.items():
        r = got[s]
        assert r["alloc_tokens"] == alloc, s
        assert r["capped"] == capped, s
        assert r["cap_tokens"] == (avail[s] * mrm) // 1000
        assert r["tokens_available"] == avail[s]
        if total > 0:
            assert r["realized_milli"] == alloc * 1000 // total
        assert sum(x["alloc_tokens"] for x in got.values()) <= budget


def test_mixture_allocate_saturates_visibly(spark):
    """Budget above the total cap: everything saturates, the shortfall
    shows in alloc sums (never silently over-allocated)."""
    from topnotch_spark.operators.curation import mixture_allocate
    from topnotch_spark.operators.dedup import dedup_scope

    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e", "y")], ["doc_id", "text", "source"]
    )
    with dedup_scope():
        rows = {r["source"]: r for r in mixture_allocate(
            df, "source", "text", {"x": 700, "y": 300}, 1_000_000,
            max_repeat_milli=2000,
        ).collect()}
    assert rows["x"]["capped"] and rows["y"]["capped"]
    assert rows["x"]["alloc_tokens"] == 6  # 3 tokens * 2 epochs
    assert rows["y"]["alloc_tokens"] == 4
    assert rows["x"]["epochs"] == 2.0


def test_mixture_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c d", "x"), (2, "e f", "y"), (3, "g h i", "z")],
        ["doc_id", "text", "source"],
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "corpusStats",
                "input": {"ref": src, "onDisk": True},
                "params": {
                    "method": "mixturePlan", "groupColumn": "source",
                    "targetsMilli": {"x": 600, "y": 400},
                    "budgetTokens": 6, "maxRepeatMilli": 1000,
                },
                "outputKey": "mix",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = {r["source"]: r for r in engine.registry["mix"].collect()}
    assert rows["z"]["target_milli"] == 0 and rows["z"]["alloc_tokens"] == 0
    assert sum(r["alloc_tokens"] for r in rows.values()) <= 6


def test_mixture_plan_command_validates(spark, tmp_path):
    import json

    plan = {
        "commands": [
            {
                "command": "corpusStats",
                "input": {"ref": "/root/testdata/sf0.001/documents.parquet",
                          "onDisk": True},
                "params": {"method": "mixturePlan",
                           "groupColumn": "source"},
                "outputKey": "mix",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    with pytest.raises(ValueError, match="mixturePlan requires"):
        engine.run(str(p))


# ---------------------------------------------------------------------------
# cross-corpus perplexity filter
# ---------------------------------------------------------------------------

def test_cross_perplexity_hand_built(spark):
    """Add-1 unigram LM trained on the reference, applied to targets:
    scores checked against hand-computed ln values, OOV counted, empty
    doc survives with NULL score."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.textqc import cross_perplexity

    ref = spark.createDataFrame(
        [(100, "a a b"), (101, "a c")], ["doc_id", "text"]
    )  # counts: a=3, b=1, c=1; T=5, V=3; denom = 5 + 1*(3+1) = 9
    tgt = spark.createDataFrame(
        [(1, "a b"), (2, "z z a"), (3, "")], ["doc_id", "text"]
    )
    with dedup_scope():
        got = {r["doc_id"]: r for r in cross_perplexity(
            tgt, ref, "doc_id", "text", k=1.0
        ).collect()}
    lp = {"a": -math.log(4 / 9), "b": -math.log(2 / 9),
          "z": -math.log(1 / 9)}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (2, 0)
    assert got[1]["avg_neg_logprob"] == pytest.approx(
        round((lp["a"] + lp["b"]) / 2, 4)
    )
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (3, 2)
    assert got[2]["oov_rate"] == pytest.approx(round(2 / 3, 6))
    assert got[2]["avg_neg_logprob"] == pytest.approx(
        round((2 * lp["z"] + lp["a"]) / 3, 4)
    )
    assert got[3]["n_tokens"] == 0 and got[3]["avg_neg_logprob"] is None
    # the OOV-heavy doc scores strictly worse than the in-distribution one
    assert got[2]["avg_neg_logprob"] > got[1]["avg_neg_logprob"]
    with pytest.raises(ValueError, match="k must be > 0"):
        cross_perplexity(tgt, ref, "doc_id", "text", k=0)


def test_lm_score_plan_command(spark, tmp_path):
    import json

    ref = str(tmp_path / "ref.parquet")
    tgt = str(tmp_path / "tgt.parquet")
    spark.createDataFrame(
        [(1, "clean reference text here")], ["doc_id", "text"]
    ).write.parquet(ref)
    spark.createDataFrame(
        [(2, "clean text"), (3, "garbage zzz qqq")], ["doc_id", "text"]
    ).write.parquet(tgt)
    plan = {
        "commands": [
            {
                "command": "lmScore",
                "target": {"ref": tgt, "onDisk": True},
                "reference": {"ref": ref, "onDisk": True},
                "params": {"idColumn": "doc_id"},
                "outputKey": "scores",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = {r["doc_id"]: r for r in engine.registry["scores"].collect()}
    assert rows[3]["n_oov"] == 3 and rows[2]["n_oov"] == 0
    assert rows[3]["avg_neg_logprob"] > rows[2]["avg_neg_logprob"]


# ---------------------------------------------------------------------------
# quantization recall
# ---------------------------------------------------------------------------

def test_quantize_recall_identity_and_distortion(spark):
    """Vectors already on the int8 grid quantize losslessly (recall 1);
    a corpus engineered so quantization flips a near-tie must report
    the flip instead of claiming recall 1."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.similarity import quantize_recall

    # int8-grid corpus: v = q * 1.0 for q in [-127, 127] — round-trip exact
    rows = [(i, [float(i * 7 % 100), float((i * 13) % 100), 127.0])
            for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with dedup_scope():
        out = quantize_recall(df, k=3, n_queries=2, dim=3).collect()
    assert [r["query_id"] for r in out] == [0, 1]
    for r in out:
        assert r["recall"] == 1.0 and r["n_overlap"] == r["k_exact"] == 3

    # near-tie corpus: two candidates at cosines that differ only below
    # the quantization error of a huge-dynamic-range vector
    rows = [
        (0, [1000.0, 0.001, 0.0]),   # query
        (1, [1000.0, 0.0012, 0.0]),  # slightly better neighbor
        (2, [1000.0, 0.0002, 0.0]),  # slightly worse
        (3, [0.0, 1000.0, 0.0]),     # orthogonal
    ]
    df2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with dedup_scope():
        out2 = {r["query_id"]: r for r in quantize_recall(
            df2, k=1, n_queries=1, dim=3
        ).collect()}
    # tiny components vanish under int8 (scale = 1000/127), so the
    # quantized side ranks 1 and 2 by the id tiebreak — the report must
    # still be internally consistent (overlap <= k_exact)
    r = out2[0]
    assert r["k_exact"] == 1 and r["n_overlap"] in (0, 1)
    assert r["recall"] == r["n_overlap"] / r["k_exact"]


def test_quantize_recall_plan_command(spark, tmp_path):
    import json

    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "similarity",
                "corpus": {"ref": src, "onDisk": True},
                "params": {"method": "quantizeRecall", "k": 3,
                           "nQueries": 2, "dim": 3},
                "outputKey": "qr",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = engine.registry["qr"].collect()
    assert len(rows) == 2
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    # kNN-only options rejected with the explicit error
    plan["commands"][0]["params"] = {"method": "quantizeRecall",
                                     "nPlanes": 4}
    p.write_text(json.dumps(plan))
    with pytest.raises(ValueError, match="quantizeRecall.*does not accept"):
        TnEngine(spark).run(str(p))


# ---------------------------------------------------------------------------
# tokenizer apply step
# ---------------------------------------------------------------------------

def test_unigram_segment_applies_trained_vocab(spark):
    """Train on corpus A, apply to corpus B: per-doc subword counts
    match the replay's Viterbi under the trained lp; a word with an
    out-of-vocab character is excluded on the Spark side exactly like
    the oracle's complete-path enumeration."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.textqc import (
        unigram_lm_vocab,
        unigram_segment,
    )

    train_docs = ["the cat sat on the mat", "the cats sat on mats",
                  "a cat and a mat and a hat"]
    dfa = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_docs)], ["doc_id", "text"]
    )
    # target B: known words, recombinations, and one word with 'z' —
    # a character absent from A, so no piece can cover it
    dfb = spark.createDataFrame(
        [(10, "the cat mats"), (11, "zebra cat"), (12, "")],
        ["doc_id", "text"],
    )
    with dedup_scope():
        vocab = unigram_lm_vocab(
            dfa, "doc_id", "text", max_word_len=12, max_piece_len=4,
            seed_size=16, vocab_size=8, n_rounds=2,
        )
        got = {r["doc_id"]: r for r in unigram_segment(
            dfb, vocab, "doc_id", "text", max_piece_len=4,
        ).collect()}
    wc = Counter(w for t in train_docs for w in t.lower().split())
    ranked = _train_replay(wc, W=12, P=4, seed_size=16, vocab_size=8,
                           n_rounds=2)
    lp = {p: l for _, p, _, l in ranked}
    nsub = {w: len(_viterbi(w, lp, 4)) for w in ("the", "cat", "mats")}
    r10 = got[10]
    assert r10["n_tokens"] == 3
    assert r10["n_subwords"] == nsub["the"] + nsub["cat"] + nsub["mats"]
    assert r10["fertility"] == pytest.approx(
        round(r10["n_subwords"] / 3, 6)
    )
    # 'zebra' contains 'z'/'b'/'r'/'e' unseen in A -> uncoverable, only
    # 'cat' counts
    r11 = got[11]
    assert r11["n_tokens"] == 1 and r11["n_subwords"] == nsub["cat"]
    # empty doc survives with zeros and NULL fertility
    assert got[12]["n_tokens"] == 0 and got[12]["fertility"] is None


def test_tokenize_plan_command(spark, tmp_path):
    """Train in one command, apply via the registry in the next — the
    tokenizer lifecycle inside a single plan."""
    import json

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "aa ab aa ab"), (2, "ab ba ab")], ["doc_id", "text"]
    ).write.parquet(src)
    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": src, "onDisk": True},
                "params": {"method": "unigramLm", "idColumn": "doc_id",
                           "textColumn": "text", "maxPieceLen": 2,
                           "seedSize": 4, "vocabSize": 2, "nRounds": 1},
                "outputKey": "vocab",
            },
            {
                "command": "tokenize",
                "input": {"ref": src, "onDisk": True},
                "vocab": {"ref": "vocab", "onDisk": False},
                "params": {"idColumn": "doc_id", "textColumn": "text",
                           "maxPieceLen": 2},
                "outputKey": "segmented",
            },
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    rows = {r["doc_id"]: r for r in engine.registry["segmented"].collect()}
    assert set(rows) == {1, 2}
    assert all(r["n_subwords"] >= r["n_tokens"] for r in rows.values())
