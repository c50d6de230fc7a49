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
