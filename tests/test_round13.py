"""Round-13 surface: the shared staged-upsert core's ``_tn_meta.json``
layout sidecar (pfx/bucket-width, signature-width, and centroid-matrix
guards), the video leg of incremental ingestion (frame-signature index
+ batch screen + on-disk upsert), and the generic bitsig index upsert.
"""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators import multimodal as mm
from topnotch_spark.operators.dedup import (
    build_bitsig_index,
    dedup_batch_against_bitsig_index,
    dedup_scope,
    read_bitsig_index,
    read_index_meta,
    read_video_index,
    upsert_bitsig_index,
    upsert_dedup_index,
    upsert_minhash_index,
    upsert_video_index,
    write_index_meta,
)


def _key_entries(spark, texts):
    return spark.createDataFrame(
        list(texts.items()), ["doc_id", "text"]
    ).select(
        F.md5(F.coalesce("text", F.lit(""))).alias("dup_key"),
        F.col("doc_id").alias("index_id"),
    )


class TestIndexMeta:
    def test_sidecar_written_and_read(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        with dedup_scope():
            upsert_dedup_index(
                spark, idx,
                _key_entries(spark, {i: f"t{i}" for i in range(5)}),
                bucket_chars=1,
            ).collect()
        assert os.path.exists(f"{idx}/_tn_meta.json")
        meta = read_index_meta(spark, idx)
        assert meta["family"] == "exact"
        assert meta["part_col"] == "bucket"
        assert meta["bucket_chars"] == 1
        # the sidecar is invisible to the parquet reader
        assert spark.read.parquet(idx).count() == 5

    def test_exact_bucket_width_mismatch_raises(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        with dedup_scope():
            upsert_dedup_index(
                spark, idx, _key_entries(spark, {1: "a"}), bucket_chars=1
            ).collect()
            with pytest.raises(ValueError, match="bucket_chars"):
                upsert_dedup_index(
                    spark, idx, _key_entries(spark, {2: "b"}),
                    bucket_chars=2,
                )

    def test_minhash_pfx_width_mismatch_raises(self, spark, tmp_path):
        """The r12-verdict hazard: a pfx_chars=1 index re-upserted with
        the default 2 must raise, not silently fragment the layout."""
        from topnotch_spark.operators.dedup import build_minhash_index

        idx = str(tmp_path / "mh")
        docs = spark.createDataFrame(
            [(i, f"some document text number {i}") for i in range(6)],
            ["doc_id", "text"],
        )
        with dedup_scope():
            seed = build_minhash_index(
                docs.filter("doc_id < 3"), "doc_id", "text"
            )
            upsert_minhash_index(spark, idx, seed, pfx_chars=1).collect()
            more = build_minhash_index(
                docs.filter("doc_id >= 3"), "doc_id", "text"
            )
            with pytest.raises(ValueError, match="pfx_chars"):
                upsert_minhash_index(spark, idx, more)  # default 2

    def test_minhash_num_hashes_mismatch_raises(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import build_minhash_index

        idx = str(tmp_path / "mh")
        docs = spark.createDataFrame(
            [(i, f"some document text number {i}") for i in range(6)],
            ["doc_id", "text"],
        )
        with dedup_scope():
            upsert_minhash_index(
                spark, idx,
                build_minhash_index(
                    docs.filter("doc_id < 3"), "doc_id", "text",
                    num_hashes=16,
                ),
                pfx_chars=1,
            ).collect()
            with pytest.raises(ValueError, match="num_hashes"):
                upsert_minhash_index(
                    spark, idx,
                    build_minhash_index(
                        docs.filter("doc_id >= 3"), "doc_id", "text",
                        num_hashes=8, bands=4,
                    ),
                    pfx_chars=1,
                )

    def test_missing_sidecar_is_lenient(self, spark, tmp_path):
        """Pre-meta indexes (no sidecar on disk) keep working: the
        guard validates only what the index recorded."""
        idx = str(tmp_path / "idx")
        with dedup_scope():
            upsert_dedup_index(
                spark, idx, _key_entries(spark, {1: "a"}), bucket_chars=2
            ).collect()
            os.remove(f"{idx}/_tn_meta.json")
            upsert_dedup_index(
                spark, idx, _key_entries(spark, {2: "b"}), bucket_chars=2
            ).collect()
        assert spark.read.parquet(idx).count() == 2

    def test_meta_roundtrip_unicode(self, spark, tmp_path):
        p = str(tmp_path / "any")
        os.makedirs(p)
        write_index_meta(spark, p, {"family": "x", "note": "π≈3.14159"})
        assert read_index_meta(spark, p)["note"] == "π≈3.14159"


class TestSemanticCentroidPinning:
    def _emb(self, spark):
        # three well-separated 4-dim axis clusters
        rows = [
            (i, [float(j == i % 2) * 10 + (i % 5) * 0.01 for j in range(4)])
            for i in range(20)
        ]
        return spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    def test_pinned_centroids_roundtrip_and_screen(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import (
            build_semantic_index,
            dedup_batch_against_semantic_index,
            read_semantic_centroids,
            read_semantic_index,
            screen_batch_against_semantic_index,
            upsert_semantic_index,
        )
        from topnotch_spark.operators.similarity import (
            kmeans_centroids_exact,
        )

        idx = str(tmp_path / "sem")
        emb = self._emb(spark)
        corpus = emb.filter("vec_id % 2 = 0")
        with dedup_scope():
            cents, assigns = kmeans_centroids_exact(
                corpus, "vec_id", "embedding", n_centroids=2, n_rounds=2
            )
            upsert_semantic_index(
                spark, idx,
                build_semantic_index(corpus, assigns, "vec_id", "embedding"),
                centroids=cents,
            ).collect()
            # the pinned matrix round-trips exactly
            got = {
                r["centroid_id"]: r["centroid"]
                for r in read_semantic_centroids(spark, idx).collect()
            }
            want = {
                r["centroid_id"]: r["centroid"] for r in cents.collect()
            }
            assert got == want
            # centroid-free screen == explicit-centroid screen
            batch = emb.filter("vec_id % 2 = 1")
            a = sorted(
                map(
                    tuple,
                    screen_batch_against_semantic_index(
                        spark, idx, batch, "vec_id", "embedding",
                        threshold=0.9,
                    ).collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    dedup_batch_against_semantic_index(
                        batch, read_semantic_index(spark, idx), cents,
                        "vec_id", "embedding", threshold=0.9,
                    ).collect(),
                )
            )
            assert a == b

    def test_retrained_centroids_raise_on_upsert(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import (
            build_semantic_index,
            upsert_semantic_index,
        )
        from topnotch_spark.operators.similarity import (
            kmeans_centroids_exact,
        )

        idx = str(tmp_path / "sem")
        emb = self._emb(spark)
        corpus = emb.filter("vec_id % 2 = 0")
        with dedup_scope():
            cents, assigns = kmeans_centroids_exact(
                corpus, "vec_id", "embedding", n_centroids=2, n_rounds=2
            )
            upsert_semantic_index(
                spark, idx,
                build_semantic_index(corpus, assigns, "vec_id", "embedding"),
                centroids=cents,
            ).collect()
            # a RE-TRAIN on different data produces a different matrix
            cents2, assigns2 = kmeans_centroids_exact(
                emb.filter("vec_id % 2 = 1"), "vec_id", "embedding",
                n_centroids=2, n_rounds=2,
            )
            entries = build_semantic_index(
                emb.filter("vec_id % 2 = 1"), assigns2, "vec_id", "embedding"
            )
            with pytest.raises(ValueError, match="centroids"):
                upsert_semantic_index(spark, idx, entries, centroids=cents2)

    def test_screen_without_pinned_matrix_raises(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import (
            build_semantic_index,
            screen_batch_against_semantic_index,
            upsert_semantic_index,
        )
        from topnotch_spark.operators.similarity import (
            kmeans_centroids_exact,
        )

        idx = str(tmp_path / "sem")
        emb = self._emb(spark)
        corpus = emb.filter("vec_id % 2 = 0")
        with dedup_scope():
            cents, assigns = kmeans_centroids_exact(
                corpus, "vec_id", "embedding", n_centroids=2, n_rounds=2
            )
            upsert_semantic_index(
                spark, idx,
                build_semantic_index(corpus, assigns, "vec_id", "embedding"),
            ).collect()  # no centroids= -> nothing pinned
            with pytest.raises(ValueError, match="centroid matrix"):
                screen_batch_against_semantic_index(
                    spark, idx, emb.filter("vec_id % 2 = 1"),
                    "vec_id", "embedding",
                )


def _vids(spark, specs):
    """specs: {vid_id: [frame_seed, ...]} — each frame is a
    deterministic 8x8 pattern from its seed; equal seeds give equal
    frames (hence equal signatures)."""
    rows = []
    for vid, seeds in specs.items():
        # one high pixel at position seed%64 over a flat background:
        # ahash = exactly that bit set, so distinct seeds (mod 64) give
        # distinct signatures and equal seeds give equal ones
        frames = [
            bytes((224 if k == s % 64 else 32) for k in range(64))
            for s in seeds
        ]
        rows.append((vid, mm.encode_tnvid(8, 8, frames)))
    return spark.createDataFrame(rows, "media_id int, content binary")


class TestVideoIncremental:
    def test_screen_matches_overlap_rule(self, spark):
        with dedup_scope():
            corpus = _vids(spark, {0: [1, 2, 3, 4], 2: [9, 9, 8, 8]})
            index = mm.build_video_index(corpus)
            # 11: full copy of 0; 13: half-overlap with 0 (frames 0-1);
            # 15: one shared frame (below 0.5); 17: disjoint
            batch = _vids(
                spark,
                {
                    11: [1, 2, 3, 4],
                    13: [1, 2, 30, 40],
                    15: [1, 50, 60, 70],
                    17: [5, 6, 7, 77],
                },
            )
            got = {
                r["media_id"]: (
                    r["n_candidates"],
                    r["best_match_id"],
                    r["best_match_frac"],
                    r["keep"],
                )
                for r in mm.dedup_batch_against_video_index(
                    batch, index, min_match_frac=0.5
                ).collect()
            }
        assert got[11] == (1, 0, 1.0, False)
        assert got[13] == (1, 0, 0.5, False)
        assert got[15] == (1, 0, 0.25, True)
        assert got[17] == (0, None, None, True)

    def test_mismatched_grid_raises(self, spark):
        with dedup_scope():
            corpus = _vids(spark, {0: [1, 2]})
            index = mm.build_video_index(corpus, grid=4)
            batch = _vids(spark, {1: [1, 2]})
            with pytest.raises(Exception, match="signature width"):
                mm.dedup_batch_against_video_index(
                    batch, index, grid=8
                ).collect()

    def test_upsert_grow_probe_and_pruning(self, spark, tmp_path):
        idx = str(tmp_path / "vid")
        with dedup_scope():
            r0 = _vids(spark, {0: [1, 2, 3, 4], 2: [9, 9, 8, 8]})
            stats = upsert_video_index(
                spark, idx, mm.build_video_index(r0), pfx_chars=1
            ).collect()[0]
            assert stats["n_entries_written"] == 8
            meta = read_index_meta(spark, idx)
            assert (meta["family"], meta["bits"], meta["pfx_chars"]) == (
                "video", 64, 1,
            )
            before = {
                f: os.path.getmtime(f)
                for f in glob.glob(f"{idx}/pfx=*/*.parquet")
            }
            # on-disk probe == in-memory probe
            batch = _vids(spark, {11: [1, 2, 3, 4], 17: [5, 6, 7, 77]})
            disk = sorted(
                map(
                    tuple,
                    mm.dedup_batch_against_video_index(
                        batch, read_video_index(spark, idx)
                    ).collect(),
                )
            )
            mem = sorted(
                map(
                    tuple,
                    mm.dedup_batch_against_video_index(
                        batch, mm.build_video_index(r0)
                    ).collect(),
                )
            )
            assert disk == mem
            # grow with a video whose frames all hash into pfx=1 (high
            # pixel at position 0 -> sh starts '1'); replay idempotent
            acc = _vids(spark, {19: [0, 64, 128, 192]})
            time.sleep(1.1)
            for _ in range(2):
                upsert_video_index(
                    spark, idx, mm.build_video_index(acc), pfx_chars=1
                ).collect()
            assert read_video_index(spark, idx).count() == 12
            # the grow touched ONLY pfx=1: every pre-existing pfx=0
            # file survives byte-for-byte (partition pruning)
            touched = {
                os.path.dirname(f)
                for f, m in before.items()
                if not os.path.exists(f) or os.path.getmtime(f) != m
            }
            assert not touched
            grown = {
                os.path.basename(os.path.dirname(f))
                for f in glob.glob(f"{idx}/pfx=*/*.parquet")
            }
            assert grown == {"pfx=0", "pfx=1"}
            # wrong pfx width raises
            with pytest.raises(ValueError, match="pfx_chars"):
                upsert_video_index(
                    spark, idx, mm.build_video_index(acc), pfx_chars=2
                )


class TestDeleteFromIndex:
    def test_retire_reaccept_and_pruning(self, spark, tmp_path):
        """The full retirement lifecycle on the exact-key index: delete
        removes every row of the retired owners, touches only the
        buckets holding them (mtime), and the retired content becomes
        re-acceptable to the next screen."""
        from topnotch_spark.operators.dedup import (
            dedup_against_index,
            delete_from_index,
        )

        idx = str(tmp_path / "idx")
        texts = {i: f"doc body {i}" for i in range(30)}
        with dedup_scope():
            upsert_dedup_index(
                spark, idx, _key_entries(spark, texts), bucket_chars=1
            ).collect()
            before = {
                f: os.path.getmtime(f)
                for f in glob.glob(f"{idx}/bucket=*/*.parquet")
            }
            assert len({os.path.dirname(f) for f in before}) > 4
            # retire one owner
            rid = spark.createDataFrame([(7,)], ["index_id"])
            time.sleep(1.1)
            stats = delete_from_index(spark, idx, rid).collect()[0]
            assert (
                stats["n_partitions_touched"],
                stats["n_entries_deleted"],
            ) == (1, 1)
            assert spark.read.parquet(idx).count() == 29
            touched = {
                os.path.dirname(f)
                for f, m in before.items()
                if not os.path.exists(f) or os.path.getmtime(f) != m
            }
            assert len(touched) <= 1
            # the retired content is re-acceptable: a new batch holding
            # it now keeps (no index owner remains)
            batch = spark.createDataFrame(
                [(107, "doc body 7"), (108, "doc body 8")],
                ["doc_id", "text"],
            )
            index = spark.read.parquet(idx).select("dup_key", "index_id")
            got = {
                r["doc_id"]: (r["in_index"], r["keep"])
                for r in dedup_against_index(
                    batch, index, "doc_id", "text"
                ).collect()
            }
            assert got[107] == (False, True)   # owner retired
            assert got[108] == (True, False)   # owner still live
            # deleting an absent id is a no-op
            stats2 = delete_from_index(
                spark, idx, spark.createDataFrame([(7,)], ["index_id"])
            ).collect()[0]
            assert (
                stats2["n_partitions_touched"],
                stats2["n_entries_deleted"],
            ) == (0, 0)

    def test_fully_retired_partition_directory_removed(
        self, spark, tmp_path
    ):
        from topnotch_spark.operators.dedup import delete_from_index

        idx = str(tmp_path / "idx")
        texts = {i: f"unique body {i}" for i in range(40)}
        with dedup_scope():
            upsert_dedup_index(
                spark, idx, _key_entries(spark, texts), bucket_chars=1
            ).collect()
            dirs = glob.glob(f"{idx}/bucket=*")
            assert len(dirs) > 4
            # retire EVERY owner in one bucket -> its dir must vanish
            victim = os.path.basename(dirs[0]).split("=", 1)[1]
            owners = [
                (r["index_id"],)
                for r in spark.read.parquet(idx)
                .filter(F.col("bucket") == victim)
                .collect()
            ]
            assert owners
            delete_from_index(
                spark, idx, spark.createDataFrame(owners, ["index_id"])
            ).collect()
            assert not os.path.exists(dirs[0])
            assert (
                spark.read.parquet(idx).count() == 40 - len(owners)
            )

    def test_delete_removes_all_band_rows(self, spark, tmp_path):
        """On the minhash layout a doc owns one row per band — retiring
        the doc must remove them ALL, across every pfx partition they
        landed in."""
        from topnotch_spark.operators.dedup import (
            build_minhash_index,
            delete_from_index,
        )

        idx = str(tmp_path / "mh")
        docs = spark.createDataFrame(
            [(i, f"the quick brown document number {i}") for i in range(8)],
            ["doc_id", "text"],
        )
        with dedup_scope():
            upsert_minhash_index(
                spark, idx,
                build_minhash_index(docs, "doc_id", "text"),
                pfx_chars=1,
            ).collect()
            total = spark.read.parquet(idx).count()
            assert total == 8 * 4  # 4 bands per doc
            delete_from_index(
                spark, idx, spark.createDataFrame([(3,), (5,)], ["index_id"])
            ).collect()
            left = spark.read.parquet(idx)
            assert left.count() == total - 8
            assert left.filter(F.col("index_id").isin([3, 5])).count() == 0


class TestBitsigUpsert:
    def test_upsert_and_probe(self, spark, tmp_path):
        idx = str(tmp_path / "bs")
        sigs = spark.createDataFrame(
            [
                (0, "00110011"),
                (1, "00110000"),
                (2, "11111111"),
            ],
            "id long, sh string",
        )
        with dedup_scope():
            upsert_bitsig_index(
                spark, idx, build_bitsig_index(sigs, 8, 4), pfx_chars=1
            ).collect()
            batch = spark.createDataFrame(
                [(10, "00110010"), (11, "01010101")], "id long, sh string"
            )
            got = {
                r["id"]: (r["best_match_id"], r["best_hamming"], r["keep"])
                for r in dedup_batch_against_bitsig_index(
                    batch, read_bitsig_index(spark, idx), 8, 4, 1
                ).collect()
            }
        assert got[10] == (0, 1, False)
        assert got[11] == (None, None, True)

    def test_replay_idempotent_and_width_guard(self, spark, tmp_path):
        idx = str(tmp_path / "bs")
        sigs = spark.createDataFrame(
            [(0, "00110011")], "id long, sh string"
        )
        with dedup_scope():
            ent = build_bitsig_index(sigs, 8, 4)
            upsert_bitsig_index(spark, idx, ent, pfx_chars=1).collect()
            upsert_bitsig_index(spark, idx, ent, pfx_chars=1).collect()
            assert read_bitsig_index(spark, idx).count() == 2  # 2 bands
            wide = build_bitsig_index(
                spark.createDataFrame(
                    [(1, "0011001111110000")], "id long, sh string"
                ),
                16, 4,
            )
            with pytest.raises(ValueError, match="bits"):
                upsert_bitsig_index(spark, idx, wide, pfx_chars=1)


class TestPlanMediaLifecycle:
    def test_video_lifecycle_plan(self, spark, tmp_path):
        """Plan-declarative media ingestion lifecycle (r13): buildVideo
        → incrementalVideo screen → upsertVideo → delete → stats, all
        through the JSON plan engine."""
        import json

        from topnotch_spark.engine import TnEngine

        corpus = _vids(spark, {0: [1, 2, 3, 4], 2: [9, 9, 8, 8]})
        batch = _vids(spark, {11: [1, 2, 3, 4], 17: [5, 6, 7, 77]})
        cpath = str(tmp_path / "corpus.parquet")
        bpath = str(tmp_path / "batch.parquet")
        rpath = str(tmp_path / "retired.parquet")
        corpus.write.parquet(cpath)
        batch.write.parquet(bpath)
        spark.createDataFrame([(0,)], ["index_id"]).write.parquet(rpath)
        idx = str(tmp_path / "vidx")
        plan = {
            "commands": [
                {
                    "command": "index",
                    "input": {"ref": cpath, "onDisk": True},
                    "params": {"method": "buildVideo",
                               "idColumn": "media_id",
                               "textColumn": "content"},
                    "outputKey": "vidIndex",
                },
                {
                    "command": "dedup",
                    "input": {"ref": bpath, "onDisk": True},
                    "index": {"ref": "vidIndex", "onDisk": False},
                    "params": {"method": "incrementalVideo",
                               "idColumn": "media_id",
                               "binColumn": "content",
                               "minMatchFrac": 0.5},
                    "outputKey": "screen",
                },
                {
                    "command": "index",
                    "input": {"ref": "vidIndex", "onDisk": False},
                    "params": {"method": "upsertVideo",
                               "idColumn": "media_id",
                               "indexPath": idx,
                               "pfxChars": 1},
                    "outputKey": "upserted",
                },
                {
                    "command": "index",
                    "input": {"ref": rpath, "onDisk": True},
                    "params": {"method": "delete",
                               "idColumn": "index_id",
                               "indexPath": idx},
                    "outputKey": "retired",
                },
                {
                    "command": "index",
                    "params": {"method": "stats", "indexPath": idx},
                    "outputKey": "layout",
                },
            ]
        }
        p = tmp_path / "plan.json"
        p.write_text(json.dumps(plan))
        eng = TnEngine(spark)
        assert eng.run(str(p)) == 0
        reg = eng.registry
        screen = {
            r["media_id"]: (r["best_match_id"], r["keep"])
            for r in reg["screen"].collect()
        }
        assert screen[11] == (0, False)
        assert screen[17] == (None, True)
        assert reg["upserted"].collect()[0]["n_entries_written"] == 8
        assert reg["retired"].collect()[0]["n_entries_deleted"] == 4
        # video 0's 4 frame rows are gone; video 2's remain
        from topnotch_spark.operators.dedup import read_video_index

        left = read_video_index(spark, idx)
        assert left.count() == 4
        assert left.filter("index_id = 0").count() == 0
        assert sum(r["n_rows"] for r in reg["layout"].collect()) == 4

    def test_incremental_phash_plan_method(self, spark, tmp_path):
        """The image leg through the plan surface: incrementalPhash
        screens a blob batch against raw snapshot blobs (index built
        in-flight)."""
        import json

        from topnotch_spark.engine import TnEngine

        def imgs(specs):
            rows = [
                (i, mm.encode_tnimg(
                    8, 8,
                    bytes((224 if k == s % 64 else 32) for k in range(64)),
                ))
                for i, s in specs.items()
            ]
            return spark.createDataFrame(rows, "media_id int, content binary")

        cpath = str(tmp_path / "imgs.parquet")
        bpath = str(tmp_path / "imgb.parquet")
        imgs({0: 5, 2: 9}).write.parquet(cpath)
        imgs({11: 5, 13: 40}).write.parquet(bpath)
        plan = {
            "commands": [
                {
                    "command": "dedup",
                    "input": {"ref": bpath, "onDisk": True},
                    "index": {"ref": cpath, "onDisk": True},
                    "params": {"method": "incrementalPhash",
                               "idColumn": "media_id",
                               "binColumn": "content",
                               "maxHamming": 1},
                    "outputKey": "screen",
                },
            ]
        }
        p = tmp_path / "plan.json"
        p.write_text(json.dumps(plan))
        eng = TnEngine(spark)
        assert eng.run(str(p)) == 0
        got = {
            r["media_id"]: (r["best_match_id"], r["keep"])
            for r in eng.registry["screen"].collect()
        }
        assert got[11] == (0, False)   # same single-pixel hash as 0
        # 13 shares the all-zero bands with everything (candidates
        # exist) but its best hamming (2) exceeds maxHamming=1 -> keep
        assert got[13] == (0, True)


class TestCompactIndex:
    def test_compacts_only_fat_partitions(self, spark, tmp_path):
        from topnotch_spark.operators.dedup import compact_index

        idx = str(tmp_path / "idx")
        with dedup_scope():
            upsert_dedup_index(
                spark, idx,
                _key_entries(spark, {i: f"body {i}" for i in range(30)}),
                bucket_chars=1,
            ).collect()
            # fatten ONE partition with appended small files (what an
            # interrupted job / external writer leaves behind)
            victim = os.path.basename(
                glob.glob(f"{idx}/bucket=*")[0]
            ).split("=", 1)[1]
            extra = spark.createDataFrame(
                [(f"{victim}{'f' * 31}", 1000 + i, victim) for i in range(3)],
                ["dup_key", "index_id", "bucket"],
            )
            for _ in range(2):
                extra.repartition(2).write.mode("append").partitionBy(
                    "bucket"
                ).parquet(idx)
            pre_rows = spark.read.parquet(idx).count()
            fat_files = glob.glob(f"{idx}/bucket={victim}/*.parquet")
            assert len(fat_files) > 1
            before = {
                f: os.path.getmtime(f)
                for f in glob.glob(f"{idx}/bucket=*/*.parquet")
                if f"bucket={victim}/" not in f
            }
            time.sleep(1.1)
            stats = compact_index(spark, idx).collect()[0]
            assert stats["n_partitions_compacted"] == 1
            assert stats["n_files_before"] == len(fat_files)
            assert stats["n_files_after"] == 1
            # rows byte-stable, compliant partitions untouched (mtime)
            assert spark.read.parquet(idx).count() == pre_rows
            assert len(glob.glob(f"{idx}/bucket={victim}/*.parquet")) == 1
            untouched = all(
                os.path.exists(f) and os.path.getmtime(f) == m
                for f, m in before.items()
            )
            assert untouched
            # already-compact index: no-op
            stats2 = compact_index(spark, idx).collect()[0]
            assert stats2["n_partitions_compacted"] == 0

    def test_plan_method(self, spark, tmp_path):
        import json

        from topnotch_spark.engine import TnEngine

        idx = str(tmp_path / "idx")
        with dedup_scope():
            upsert_dedup_index(
                spark, idx,
                _key_entries(spark, {i: f"x{i}" for i in range(10)}),
                bucket_chars=1,
            ).collect()
        plan = {
            "commands": [
                {
                    "command": "index",
                    "params": {"method": "compactFiles",
                               "indexPath": idx,
                               "maxFilesPerPartition": 1},
                    "outputKey": "compacted",
                },
            ]
        }
        p = tmp_path / "plan.json"
        p.write_text(json.dumps(plan))
        eng = TnEngine(spark)
        assert eng.run(str(p)) == 0
        row = eng.registry["compacted"].collect()[0]
        assert row["n_partitions_compacted"] == 0  # fresh upsert: 1 file/dir


class TestSrpMultiprobeExpression:
    """r13 §14: the multiprobe flip set is now built as ONE parsed SQL
    expression over a NAMED bucket column (construction-cost fix). Pin
    its semantics: per query, the probe set must be exactly the base
    bucket plus the n_planes single-bit flips of it, in order."""

    def test_probe_set_is_base_plus_single_bit_flips(self, spark):
        import random

        from pyspark.sql import functions as F

        from topnotch_spark.functions.vectors import srp_bucket

        rng = random.Random(13)
        dim, n_planes = 8, 6
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(20)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        base = {
            r["vec_id"]: r["b"]
            for r in emb.select(
                "vec_id", srp_bucket("embedding", n_planes, dim).alias("b")
            ).collect()
        }

        # drive the operator's probe generation via its join column:
        # corpus = queries, so every emitted (query_id, bucket) pair of
        # the pre-join projection is observable through the fan-out —
        # reproduce it by re-deriving the probe column exactly as
        # srp_ann_topk does, through the public entry
        from topnotch_spark.operators.similarity import srp_ann_topk

        out = srp_ann_topk(
            emb, emb.filter("vec_id < 3"), k=5, n_planes=n_planes, dim=dim,
            hamming_probes=1,
        )
        # semantic pin: with probes=1 every returned neighbor's bucket
        # is within Hamming distance 1 of the query's base bucket
        nbr_bucket = {
            r["vec_id"]: r["b"]
            for r in emb.select(
                "vec_id", srp_bucket("embedding", n_planes, dim).alias("b")
            ).collect()
        }
        for r in out.collect():
            qb, nb = base[r["query_id"]], nbr_bucket[r["neighbor_id"]]
            ham = sum(1 for a, b in zip(qb, nb) if a != b)
            assert ham <= 1, (r["query_id"], r["neighbor_id"], qb, nb)

    def test_flip_expressions_match_python_reference(self, spark):
        """The parsed flip strings equal Python-computed single-bit
        flips of the same bucket, for every position."""
        from pyspark.sql import functions as F

        n_planes = 7
        df = spark.createDataFrame(
            [("1010011",), ("0000000",), ("1111111",)], "b0 string"
        )
        flips = ", ".join(
            f"concat(substring(b0, 1, {i}), "
            f"if(substring(b0, {i + 1}, 1) = '1', '0', '1'), "
            f"substring(b0, {i + 2}, {n_planes - i - 1}))"
            for i in range(n_planes)
        )
        got = {
            r["b0"]: r["probes"]
            for r in df.select(
                "b0", F.expr(f"array({flips})").alias("probes")
            ).collect()
        }
        for b0, probes in got.items():
            expect = [
                b0[:i] + ("0" if b0[i] == "1" else "1") + b0[i + 1:]
                for i in range(n_planes)
            ]
            assert probes == expect, (b0, probes, expect)
