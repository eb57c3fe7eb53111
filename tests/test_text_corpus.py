"""Raw-text corpus ingest (sources/text_corpus.py): both grains, glob
and recursion options, unicode round-trip, and the content-addressed
document annotation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sources.text_corpus import (
    read_text_corpus,
    to_documents,
)


def test_file_grain_whole_documents(spark, tmp_path):
    (tmp_path / "a.txt").write_text("first doc\nwith two lines")
    (tmp_path / "b.txt").write_text("hällo — ünïcode ✓", encoding="utf-8")
    (tmp_path / "notes.md").write_text("skipped by glob")
    rows = read_text_corpus(spark, str(tmp_path), grain="file").collect()
    got = {r.source_file.rsplit("/", 1)[-1]: r.text for r in rows}
    assert got == {
        "a.txt": "first doc\nwith two lines",
        "b.txt": "hällo — ünïcode ✓",
    }


def test_line_grain_splits_records(spark, tmp_path):
    (tmp_path / "c.txt").write_text("l1\nl2\nl3\n")
    rows = read_text_corpus(spark, str(tmp_path), grain="line").collect()
    assert sorted(r.text for r in rows) == ["l1", "l2", "l3"]
    assert all(r.source_file.endswith("c.txt") for r in rows)


def test_recursive_and_glob_options(spark, tmp_path):
    sub = tmp_path / "shard-0"
    sub.mkdir()
    (sub / "d.txt").write_text("nested")
    (tmp_path / "top.txt").write_text("top")
    flat = read_text_corpus(spark, str(tmp_path), grain="file").collect()
    assert [r.text for r in flat] == ["top"]
    deep = read_text_corpus(
        spark, str(tmp_path), grain="file", recursive=True
    ).collect()
    assert sorted(r.text for r in deep) == ["nested", "top"]
    with pytest.raises(ValueError, match="grain"):
        read_text_corpus(spark, str(tmp_path), grain="word")


def test_to_documents_content_addressing(spark, tmp_path):
    """Identical payloads collide on doc_id (exact-dedup-ready);
    distinct payloads don't; n_chars counts CHARACTERS (unicode), and
    blank docs drop."""
    (tmp_path / "x.txt").write_text("same payload")
    (tmp_path / "y.txt").write_text("same payload")
    (tmp_path / "z.txt").write_text("öther")
    (tmp_path / "blank.txt").write_text("   ")
    docs = to_documents(
        read_text_corpus(spark, str(tmp_path), grain="file")
    )
    rows = docs.collect()
    assert len(rows) == 3  # blank dropped
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, set()).add(r.doc_id)
    assert len(by_text["same payload"]) == 1  # collide by construction
    assert by_text["same payload"] != by_text["öther"]
    assert {r.text: r.n_chars for r in rows}["öther"] == 5
    # doc_id matches the engine-wide hash convention exactly
    expect = spark.sql("SELECT xxhash64('öther')").first()[0]
    assert by_text["öther"] == {expect}
    kept = to_documents(
        read_text_corpus(spark, str(tmp_path), grain="file"),
        drop_empty=False,
    )
    assert kept.count() == 4


def test_plan_is_map_only_scan(spark, tmp_path):
    """to_documents ∘ read_text_corpus is one codegen scan: no
    exchange, no Python eval in the plan."""
    (tmp_path / "p.txt").write_text("payload")
    df = to_documents(read_text_corpus(spark, str(tmp_path), grain="line"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FileScan text" in plan
