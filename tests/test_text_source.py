"""Raw-text input format (sources/inputs.py): line-per-row and
whole-file-per-row corpus ingestion, standalone and through a plan."""

from __future__ import annotations

import json

from topnotch_spark.sources.inputs import Input, load_input


def _write_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha one\nbeta two\ngamma three\n")
    (d / "b.txt").write_text("delta four\n")
    return str(d)


def test_text_source_line_mode(spark, tmp_path):
    path = _write_corpus(tmp_path)
    df = load_input(spark, Input(ref=path, format="text"))
    assert set(df.columns) == {"text", "doc_path", "line_no"}
    rows = df.collect()
    assert len(rows) == 4
    by_file = {}
    for r in rows:
        by_file.setdefault(r["doc_path"].rsplit("/", 1)[-1], []).append(
            (r["line_no"], r["text"])
        )
    assert sorted(by_file["a.txt"]) == [
        (1, "alpha one"), (2, "beta two"), (3, "gamma three")
    ]
    assert by_file["b.txt"] == [(1, "delta four")]


def test_text_source_wholetext_mode(spark, tmp_path):
    path = _write_corpus(tmp_path)
    df = load_input(spark, Input(ref=path, format="text", wholetext=True))
    assert set(df.columns) == {"text", "doc_path"}
    docs = {
        r["doc_path"].rsplit("/", 1)[-1]: r["text"] for r in df.collect()
    }
    assert docs["a.txt"] == "alpha one\nbeta two\ngamma three\n"
    assert docs["b.txt"] == "delta four\n"


def test_text_source_feeds_a_text_command(spark, tmp_path):
    """The ingest shape end-to-end: raw .txt corpus -> text.tokenStats
    through a plan, doc_path as the id column."""
    from topnotch_spark.engine import TnEngine

    path = _write_corpus(tmp_path)
    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": path, "onDisk": True,
                          "format": "text", "wholetext": True},
                "params": {"method": "tokenStats", "idColumn": "doc_path",
                           "textColumn": "text"},
                "outputKey": "stats",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    stats = {
        r["doc_path"].rsplit("/", 1)[-1]: r["n_tokens"]
        for r in engine.registry["stats"].collect()
    }
    assert stats == {"a.txt": 6, "b.txt": 2}


def test_text_source_line_no_survives_multisplit_file(spark, tmp_path):
    """A file larger than one split scans as several partitions whose
    indices do NOT follow byte order (FileSourceScanExec packs splits by
    length, not offset) — line_no must still be the true in-file order,
    via the (input_file_block_start, monotonically_increasing_id) sort."""
    d = tmp_path / "bigcorpus"
    d.mkdir()
    n = 3000
    (d / "big.txt").write_text(
        "".join(f"line-{i:05d}\n" for i in range(1, n + 1))
    )
    before_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    before_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        n_splits = spark.read.text(str(d)).rdd.getNumPartitions()
        assert n_splits > 1, "file must actually split"
        df = load_input(spark, Input(ref=str(d), format="text"))
        rows = df.select("line_no", "text").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", before_open)
    assert len(rows) == n
    for r in rows:
        assert r["text"] == f"line-{r['line_no']:05d}"
