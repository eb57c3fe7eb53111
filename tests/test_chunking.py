"""Document chunking (operators/chunking.py): round-trip coverage,
clamping, edge grains."""

import pytest

from data_pipeline_demo_spark.operators import chunking


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_char_chunks_reconstruct_document(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(1000))
    out = chunking.chunk_by_chars(
        _docs(spark, [text]), size=128, overlap=32
    ).orderBy("chunk_id")
    rows = out.collect()
    # stitch: first chunk whole, then strip the 32-char overlap
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][32:] for r in rows[1:]
    )
    assert rebuilt == text
    # every chunk but the last is exactly `size`; the last is clamped
    assert all(len(r["chunk_text"]) == 128 for r in rows[:-1])
    assert 0 < len(rows[-1]["chunk_text"]) <= 128
    # starts advance by the stride
    assert [r["chunk_start"] for r in rows] == [
        1 + 96 * i for i in range(len(rows))
    ]


def test_token_chunks_match_python_reference(spark):
    text = " ".join(f"tok{i}" for i in range(100))
    out = chunking.chunk_by_tokens(
        _docs(spark, [text]), size=16, overlap=4
    ).orderBy("chunk_id")
    toks = text.split(" ")
    stride = 12
    expect_n = max(1, -(-(len(toks) - 4) // stride))
    rows = out.collect()
    assert len(rows) == expect_n
    for r in rows:
        start = (r["chunk_id"]) * stride
        assert r["chunk_text"] == " ".join(toks[start : start + 16])
    # union of chunk tokens covers every token
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert seen == set(toks)


def test_short_and_empty_docs_yield_one_chunk(spark):
    out = chunking.chunk_by_chars(
        _docs(spark, ["tiny", ""]), size=512, overlap=64
    ).collect()
    by_id = {(r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out}
    assert by_id == {(0, 0): "tiny", (1, 0): ""}
    tout = chunking.chunk_by_tokens(
        _docs(spark, ["a b", ""]), size=8, overlap=2
    ).collect()
    tby = {(r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in tout}
    assert tby == {(0, 0): "a b", (1, 0): ""}


def test_overlap_must_be_smaller_than_size(spark):
    with pytest.raises(ValueError):
        chunking.chunk_by_chars(_docs(spark, ["x"]), size=64, overlap=64)


def test_chunking_plan_is_map_only(spark):
    df = chunking.chunk_by_chars(_docs(spark, ["abc" * 100]), size=32, overlap=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: generate + project only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
