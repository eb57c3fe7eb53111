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


def test_tfidf_top_terms_hand_computed(spark):
    # 3 docs; "rare" appears only in doc 0, "the" in all docs
    from data_pipeline_demo_spark.operators.textstats import tfidf_top_terms

    docs = _docs(
        spark,
        [
            "the rare gem",          # doc 0: rare & gem score 1/3 * 3/1 = 1.0
            "the the common word",   # doc 1
            "the common word word",  # doc 2
        ],
    )
    out = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["tfidf"]))
    for v in by_doc.values():
        v.sort()
    # doc 0: gem and rare tie at (1/3)*(3/1)=1.0 -> term asc tie-break
    assert [(t, s) for _, t, s in by_doc[0]] == [("gem", 1.0), ("rare", 1.0)]
    # doc 1: "the" tf=2/4, df=3 -> 0.5; common/word tf=1/4, df=2 -> 0.375
    assert by_doc[1][0][1:] == ("the", 0.5)
    assert by_doc[1][1][1:] == ("common", 0.375)
    # doc 2: "word" tf=2/4 df=2 -> 0.75 beats the=0.25, common=0.375
    assert by_doc[2][0][1:] == ("word", 0.75)
    assert by_doc[2][1][1:] == ("common", 0.375)


def test_cdc_chunks_reconstruct_and_realign(spark):
    """Content-defined chunks must (a) round-trip the document exactly
    and (b) REALIGN after an edit: inserting tokens near the head of a
    doc leaves the chunk multiset of the untouched tail mostly
    identical — the property fixed-window chunking provably lacks."""
    base_tokens = [f"w{i % 97}x{i % 13}" for i in range(400)]
    base = " ".join(base_tokens)
    edited = " ".join(["INS0", "INS1", "INS2"] + base_tokens)
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    out = chunking.content_defined_chunks(docs).collect()
    by_doc = {0: [], 1: []}
    for r in out:
        by_doc[r["doc_id"]].append(r)
    for did, text in ((0, base), (1, edited)):
        rows = sorted(by_doc[did], key=lambda r: r["chunk_id"])
        # consecutive ids, exact reconstruction, n_tokens consistent
        assert [r["chunk_id"] for r in rows] == list(
            range(rows[0]["chunk_id"], rows[0]["chunk_id"] + len(rows))
        )
        assert " ".join(r["chunk_text"] for r in rows) == text
        assert all(
            r["n_tokens"] == len(r["chunk_text"].split(" ")) for r in rows
        )
    # realignment: every base chunk except possibly the first reappears
    # verbatim among the edited doc's chunks
    c0 = [r["chunk_text"] for r in sorted(by_doc[0], key=lambda r: r["chunk_id"])]
    c1 = {r["chunk_text"] for r in by_doc[1]}
    assert len(c0) >= 3  # the threshold actually split this doc
    shared = sum(1 for c in c0[1:] if c in c1)
    assert shared == len(c0) - 1


def test_cdc_chunk_boundaries_match_scalar_md5(spark):
    """Boundary rule is exactly substr(md5(tok),1,2) < '08' — verified
    against hashlib per token."""
    import hashlib

    text = " ".join(f"t{i}" for i in range(200))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        chunking.content_defined_chunks(docs).collect(),
        key=lambda r: r["chunk_id"],
    )
    # rebuild expected chunking in pure python
    chunks, cur = [], []
    for tok in text.split(" "):
        if hashlib.md5(tok.encode()).hexdigest()[:2] < "08" and cur:
            chunks.append(" ".join(cur))
            cur = []
        cur.append(tok)
    chunks.append(" ".join(cur))
    got = [r["chunk_text"] for r in rows]
    assert got == chunks
