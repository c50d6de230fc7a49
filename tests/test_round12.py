"""Round-12 additions: ADVICE r11 hardening (upsert staging lineage
break, minhash-index signature-width guard, REST timeouts), the REST
plan-READER retry (verdict #6), the WordPiece fertility audit
(verdict #2), and the wordpiece_vocab distributed top-N (verdict #4)."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# REST plan reader: bounded retry (verdict r11 #6) + timeout
# ---------------------------------------------------------------------------


class _FlakyGetHandler(BaseHTTPRequestHandler):
    plans: dict[str, bytes] = {}
    attempts: dict[str, int] = {}
    fail_first: int = 1
    fail_status: int = 503

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        n = self.attempts.get(self.path, 0)
        self.attempts[self.path] = n + 1
        if n < self.fail_first:
            self.send_response(self.fail_status)
            self.end_headers()
            return
        body = self.plans.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def flaky_get_server():
    servers = []

    def make(fail_first: int, fail_status: int = 503):
        _FlakyGetHandler.plans = {}
        _FlakyGetHandler.attempts = {}
        _FlakyGetHandler.fail_first = fail_first
        _FlakyGetHandler.fail_status = fail_status
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyGetHandler)
        servers.append(srv)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return f"http://127.0.0.1:{srv.server_address[1]}", _FlakyGetHandler

    yield make
    for srv in servers:
        srv.shutdown()
        srv.server_close()


class TestRestReaderRetry:
    def test_reader_retries_transient_5xx(self, flaky_get_server):
        from topnotch_spark.plans.readers import RESTReader

        base, handler = flaky_get_server(fail_first=1, fail_status=503)
        handler.plans["/plans/p.json"] = json.dumps({"ok": 1}).encode()
        r = RESTReader(base, retries=2, backoff_base_s=0.05)
        assert r.read_configuration("plans/p.json") == {"ok": 1}
        assert handler.attempts["/plans/p.json"] == 2  # 1 failure + 1 ok

    def test_reader_does_not_retry_404(self, flaky_get_server):
        from topnotch_spark.plans.readers import RESTReader

        base, handler = flaky_get_server(fail_first=0)
        r = RESTReader(base, retries=3, backoff_base_s=0.05)
        with pytest.raises(ValueError, match="Cant find configurations"):
            r.read_configuration("plans/nope.json")
        assert handler.attempts["/plans/nope.json"] == 1  # no retry on 4xx

    def test_reader_exhausts_retries_then_raises(self, flaky_get_server):
        import urllib.error

        from topnotch_spark.plans.readers import RESTReader

        base, handler = flaky_get_server(fail_first=10, fail_status=503)
        r = RESTReader(base, retries=2, backoff_base_s=0.05)
        with pytest.raises(urllib.error.HTTPError):
            r.read_configuration("plans/p.json")
        assert handler.attempts["/plans/p.json"] == 3  # 1 + 2 retries

    def test_variables_substituted_through_retry_path(
        self, flaky_get_server
    ):
        from topnotch_spark.plans.readers import RESTReader

        base, handler = flaky_get_server(fail_first=1, fail_status=503)
        handler.plans["/v.json"] = b'{"key": "${name}"}'
        r = RESTReader(
            base, variables={"name": "val"}, retries=1,
            backoff_base_s=0.05,
        )
        assert r.read_configuration("v.json") == {"key": "val"}


class TestHttpHelperTimeout:
    def test_hung_endpoint_times_out_and_retries(self):
        """A socket that accepts and never answers must raise (not hang)
        per attempt — the ADVICE r11 RESTWriter finding — and the
        timeout must count as retryable (attempted again)."""
        import socket

        from topnotch_spark.net import http_request_with_retry

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(5)  # accepts connections, never responds
        port = srv.getsockname()[1]
        try:
            with pytest.raises(Exception):
                http_request_with_retry(
                    f"http://127.0.0.1:{port}/x",
                    retries=1,
                    backoff_base_s=0.01,
                    timeout_s=0.3,
                )
        finally:
            srv.close()

    def test_writer_timeout_config_plumbed(self):
        from topnotch_spark.reports.writers import RESTWriter, get_writer

        w = get_writer(
            {"io": {"writer": "rest", "dest": "http://x/",
                    "timeoutS": 7.5}}
        )
        assert isinstance(w, RESTWriter)
        assert w.timeout_s == 7.5


# ---------------------------------------------------------------------------
# upsert_dedup_index: staging lineage break (ADVICE r11)
# ---------------------------------------------------------------------------


class TestUpsertStaging:
    def test_staging_dir_removed_after_upsert(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import upsert_dedup_index

        idx = str(tmp_path / "idx")
        first = spark.createDataFrame(
            [("00aa", 1), ("01bb", 2)], "dup_key string, index_id long"
        )
        upsert_dedup_index(spark, idx, first).collect()
        second = spark.createDataFrame(
            [("00cc", 3)], "dup_key string, index_id long"
        )
        upsert_dedup_index(spark, idx, second).collect()
        assert not os.path.exists(idx + "__staging__")
        got = {
            (r["dup_key"], r["index_id"])
            for r in spark.read.parquet(idx).collect()
        }
        assert got == {("00aa", 1), ("01bb", 2), ("00cc", 3)}

    def test_bucket_values_round_trip_as_strings(self, spark, tmp_path):
        """All-numeric hex buckets ("00", "12") must survive the staging
        round trip as 2-char strings — partition-value type inference
        on a partitioned staging dir would turn "00" into 0."""
        from topnotch_spark.operators.dedup import upsert_dedup_index

        idx = str(tmp_path / "idx")
        first = spark.createDataFrame(
            [("00xx", 1), ("12yy", 2)], "dup_key string, index_id long"
        )
        upsert_dedup_index(spark, idx, first).collect()
        # second upsert into the SAME numeric buckets exercises staging
        second = spark.createDataFrame(
            [("00zz", 3), ("12ww", 4)], "dup_key string, index_id long"
        )
        upsert_dedup_index(spark, idx, second).collect()
        buckets = sorted(
            d.split("=")[1]
            for d in os.listdir(idx)
            if d.startswith("bucket=")
        )
        assert buckets == ["00", "12"]
        assert spark.read.parquet(idx).count() == 4


# ---------------------------------------------------------------------------
# upsert_minhash_index (verdict r11 #1): partition-pruned near-dup
# index growth
# ---------------------------------------------------------------------------


def _mh_entries(spark, rows):
    """(index_id, band_idx, bucket, sigs) literal frame."""
    return spark.createDataFrame(
        rows,
        "index_id long, band_idx int, bucket string, "
        "sigs array<bigint>",
    )


class TestUpsertMinhashIndex:
    def test_create_then_grow_and_replay_idempotent(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import (
            _read_partitioned_index,
            upsert_minhash_index,
        )

        idx = str(tmp_path / "mhidx")
        first = _mh_entries(
            spark,
            [(1, 0, "aa111", [1, 2]), (1, 1, "bb222", [1, 2])],
        )
        s0 = upsert_minhash_index(spark, idx, first).collect()[0]
        assert s0["n_partitions_touched"] == 2
        assert s0["n_entries_written"] == 2
        second = _mh_entries(spark, [(2, 0, "aa333", [3, 4])])
        s1 = upsert_minhash_index(spark, idx, second).collect()[0]
        assert s1["n_partitions_touched"] == 1  # only pfx "aa"
        assert s1["n_entries_written"] == 2  # merged rows IN that pfx
        # replaying the same batch is a no-op on contents
        upsert_minhash_index(spark, idx, second).collect()
        got = {
            (r["index_id"], r["band_idx"], r["bucket"], tuple(r["sigs"]))
            for r in _read_partitioned_index(spark, idx).collect()
        }
        assert got == {
            (1, 0, "aa111", (1, 2)),
            (1, 1, "bb222", (1, 2)),
            (2, 0, "aa333", (3, 4)),
        }
        assert not os.path.exists(idx + "__staging__")

    def test_untouched_partitions_not_rewritten(self, spark, tmp_path):
        """The pruning contract: an upsert touching pfx 'aa' must leave
        the pfx 'bb' directory byte-untouched (mtime check — the same
        guarantee upsert_dedup_index's exact-key layout has)."""
        import time

        from topnotch_spark.operators.dedup import upsert_minhash_index

        idx = str(tmp_path / "mhidx")
        base = _mh_entries(
            spark,
            [(1, 0, "aa111", [1]), (2, 0, "bb222", [2])],
        )
        upsert_minhash_index(spark, idx, base).collect()
        bb_dir = os.path.join(idx, "pfx=bb")
        before = {
            f: os.path.getmtime(os.path.join(bb_dir, f))
            for f in os.listdir(bb_dir)
        }
        time.sleep(1.1)  # mtime granularity
        one = _mh_entries(spark, [(3, 0, "aa333", [3])])
        stats = upsert_minhash_index(spark, idx, one).collect()[0]
        assert stats["n_partitions_touched"] == 1
        after = {
            f: os.path.getmtime(os.path.join(bb_dir, f))
            for f in os.listdir(bb_dir)
        }
        assert after == before

    def test_empty_batch_is_noop(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import upsert_minhash_index

        idx = str(tmp_path / "mhidx")
        upsert_minhash_index(
            spark, idx, _mh_entries(spark, [(1, 0, "aa111", [1])])
        ).collect()
        stats = upsert_minhash_index(
            spark, idx, _mh_entries(spark, [])
        ).collect()[0]
        assert stats["n_partitions_touched"] == 0
        assert stats["n_entries_written"] == 0

    def test_screen_sees_upserted_rows(self, spark, tmp_path):
        """End-to-end loop: a doc accepted and upserted in round N must
        be FOUND as a near-dup match by round N+1's screen."""
        from topnotch_spark.operators.dedup import (
            _read_partitioned_index,
            build_minhash_index,
            dedup_batch_against_minhash_index,
            upsert_minhash_index,
        )

        idx = str(tmp_path / "mhidx")
        text = "alpha beta gamma delta epsilon zeta eta theta"
        r1 = spark.createDataFrame(
            [(10, text)], "doc_id long, text string"
        )
        upsert_minhash_index(
            spark, idx, build_minhash_index(r1, "doc_id", "text")
        ).collect()
        r2 = spark.createDataFrame(
            [(21, text), (22, "completely different words entirely here")],
            "doc_id long, text string",
        )
        index = _read_partitioned_index(spark, idx).select(
            "index_id", "band_idx", "bucket", "sigs"
        )
        out = {
            r["doc_id"]: r
            for r in dedup_batch_against_minhash_index(
                r2, index, "doc_id", "text", threshold=0.5
            ).collect()
        }
        assert out[21]["best_match_id"] == 10
        assert out[21]["keep"] is False
        assert out[22]["keep"] is True


# ---------------------------------------------------------------------------
# dedup_batch_against_minhash_index: signature-width guard (ADVICE r11)
# ---------------------------------------------------------------------------


class TestMinhashIndexWidthGuard:
    def test_mismatched_num_hashes_raises(self, spark):
        """The dangerous mismatch is one where the BUCKETS still
        collide (otherwise the join is empty and nothing is silently
        wrong): an index built with 32 hashes × 8 bands shares its
        first 4 band buckets with a 16×4 screen (same rows_per_band,
        same deterministic coeff prefix), so candidates DO form — and
        zip_with would null-pad the 32-long index sigs against the
        16-long batch sigs, deflating every estimate. The guard must
        raise instead."""
        from topnotch_spark.operators.dedup import (
            build_minhash_index,
            dedup_batch_against_minhash_index,
        )

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "the quick brown fox jumps over the lazy cat")],
            "doc_id long, text string",
        )
        index = build_minhash_index(docs, "doc_id", "text",
                                    num_hashes=32, bands=8)
        out = dedup_batch_against_minhash_index(
            docs, index, "doc_id", "text", num_hashes=16, bands=4
        )
        with pytest.raises(Exception, match="sigs length"):
            out.collect()

    def test_matching_num_hashes_passes(self, spark):
        from topnotch_spark.operators.dedup import (
            build_minhash_index,
            dedup_batch_against_minhash_index,
        )

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        index = build_minhash_index(docs, "doc_id", "text", num_hashes=16,
                                    bands=4)
        out = dedup_batch_against_minhash_index(
            docs, index, "doc_id", "text", num_hashes=16, bands=4
        ).collect()
        assert len(out) == 1 and out[0]["n_candidates"] >= 1


# ---------------------------------------------------------------------------
# Incremental semantic screen (verdict r11 #3)
# ---------------------------------------------------------------------------


class TestSemanticIndexScreen:
    def _frames(self, spark):
        import math

        def unit(theta):
            return [math.cos(theta), math.sin(theta)] + [0.0] * 2

        corpus = spark.createDataFrame(
            [(0, unit(0.0)), (2, unit(1.5)), (4, unit(3.0)),
             (6, unit(0.05))],
            "vec_id long, embedding array<double>",
        )
        batch = spark.createDataFrame(
            [(1, unit(0.01)),   # near-dup of vec 0 (cos ~ 1.0)
             (3, unit(2.2))],   # not near anything at 0.9
            "vec_id long, embedding array<double>",
        )
        return corpus, batch

    def test_screen_routes_and_keeps_correctly(self, spark):
        from topnotch_spark.operators.dedup import (
            build_semantic_index,
            dedup_batch_against_semantic_index,
        )
        from topnotch_spark.operators.similarity import (
            kmeans_centroids_exact,
        )

        corpus, batch = self._frames(spark)
        cents, assigns = kmeans_centroids_exact(
            corpus, "vec_id", "embedding", n_centroids=2, n_rounds=1
        )
        index = build_semantic_index(
            corpus, assigns, "vec_id", "embedding"
        )
        out = {
            r["vec_id"]: r
            for r in dedup_batch_against_semantic_index(
                batch, index, cents, "vec_id", "embedding",
                threshold=0.9,
            ).collect()
        }
        assert out[1]["keep"] is False
        assert out[1]["best_match_id"] == 0
        assert out[1]["best_cosine"] >= 0.99
        assert out[3]["keep"] is True
        # every batch row got routed and screened
        assert set(out) == {1, 3}
        assert all(r["n_candidates"] >= 1 for r in out.values())

    def test_empty_cluster_keeps(self, spark):
        """A batch vector routed to a centroid with no members must
        survive with n_candidates=0 and NULL best columns."""
        from topnotch_spark.operators.dedup import (
            dedup_batch_against_semantic_index,
        )

        centroids = spark.createDataFrame(
            [(0, [1.0, 0.0], 0), (1, [-1.0, 0.0], 0)],
            "centroid_id int, centroid array<double>, n_members long",
        )
        index = spark.createDataFrame(
            [], "index_id long, vec array<double>, nrm double, "
                "centroid_id int",
        )
        batch = spark.createDataFrame(
            [(7, [0.9, 0.1])], "vec_id long, embedding array<double>"
        )
        out = dedup_batch_against_semantic_index(
            batch, index, centroids, "vec_id", "embedding",
            threshold=0.35,
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["keep"] is True
        assert r["n_candidates"] == 0
        assert r["best_match_id"] is None and r["best_cosine"] is None


# ---------------------------------------------------------------------------
# WordPiece fertility audit (verdict r11 #2)
# ---------------------------------------------------------------------------


class TestWordpieceFertility:
    def test_fertility_by_group_tiny(self, spark):
        """Hand-checkable corpus: with every word in the trained vocab's
        char floor plus top substrings, fertility per group is exact."""
        from topnotch_spark.operators.textqc import (
            wordpiece_fertility_by_group,
        )

        df = spark.createDataFrame(
            [(1, "aa aa bb", "g1"), (2, "aa", "g2")],
            "doc_id long, text string, source string",
        )
        rows = {
            r["source"]: r
            for r in wordpiece_fertility_by_group(
                df, "doc_id", "text", "source",
                max_piece_len=2, vocab_size=2,
            ).collect()
        }
        # vocab: chars {a, b} + top-2 multi {"aa" (3 occ-weighted), "bb"}
        # → every word segments in ONE piece: fertility 1.0
        assert rows["g1"]["n_tokens"] == 3
        assert rows["g1"]["n_subwords"] == 3
        assert rows["g1"]["fertility"] == 1.0
        assert rows["g1"]["chars_per_subword"] == 2.0
        assert rows["g2"]["n_tokens"] == 1
        assert rows["g2"]["fertility"] == 1.0

    def test_group_sums_match_segment_totals(self, spark):
        """The audit's corpus-wide sums must equal the per-doc apply
        step's sums — same trained vocab, same walk, different rollup."""
        from topnotch_spark.operators.textqc import (
            wordpiece_fertility_by_group,
            wordpiece_segment,
            wordpiece_vocab,
        )

        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text", "source")
            .limit(120)
        )
        fert = wordpiece_fertility_by_group(
            docs, "doc_id", "text", "source"
        )
        tot = fert.agg(
            F.sum("n_tokens").alias("t"), F.sum("n_subwords").alias("s")
        ).collect()[0]
        vocab = wordpiece_vocab(docs, "doc_id", "text")
        seg = wordpiece_segment(docs, vocab, "doc_id", "text")
        tot2 = seg.agg(
            F.sum("n_tokens").alias("t"), F.sum("n_subwords").alias("s")
        ).collect()[0]
        assert (tot["t"], tot["s"]) == (tot2["t"], tot2["s"])


# ---------------------------------------------------------------------------
# wordpiece_vocab: distributed top-N (verdict r11 #4)
# ---------------------------------------------------------------------------


class TestWordpieceVocabTopN:
    def test_plan_has_no_single_partition_sort_before_limit(self, spark):
        """The multi-char candidate selection must compile to
        TakeOrderedAndProject (per-partition heaps), not a global
        row_number window's single-partition sort."""
        from topnotch_spark.operators.textqc import wordpiece_vocab

        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
        vocab = wordpiece_vocab(docs, "doc_id", "text")
        plan = vocab._sc._jvm.PythonSQLUtils.explainString(
            vocab._jdf.queryExecution(), "extended"
        )
        assert "TakeOrderedAndProject" in plan

    def test_vocab_size_and_rank_contract(self, spark):
        from topnotch_spark.operators.textqc import wordpiece_vocab

        df = spark.createDataFrame(
            [(1, "abc abd abc")], "doc_id long, text string"
        )
        rows = wordpiece_vocab(
            df, "doc_id", "text", max_piece_len=3, vocab_size=3
        ).collect()
        multi = [r for r in rows if r["piece_len"] >= 2]
        assert len(multi) == 3
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # rank order = (n_occurrences desc, piece asc)
        by_rank = sorted(rows, key=lambda r: r["rank"])
        key = [(-r["n_occurrences"], r["piece"]) for r in by_rank]
        assert key == sorted(key)
