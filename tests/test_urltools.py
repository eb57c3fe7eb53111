"""URL canonicalization (operators/urltools.py): edge-case table the
q247 synthesis recipe doesn't reach."""

from __future__ import annotations

from data_pipeline_demo_spark.operators.urltools import (
    canonical_url,
    url_dedup_groups,
)
from pyspark.sql import functions as F

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/a/?b=2&a=1&utm_source=x#f",
     "http://example.com/a?a=1&b=2"),
    ("https://h.io:443/p", "https://h.io/p"),
    ("https://h.io:8443/p", "https://h.io:8443/p"),  # non-default kept
    ("http://h.io/", "http://h.io"),
    ("http://h.io", "http://h.io"),
    ("http://h.io/x?utm_source=a&utm_medium=b&fbclid=z&gclid=q",
     "http://h.io/x"),
    ("http://h.io/x?z=1&y=2&x=3", "http://h.io/x?x=3&y=2&z=1"),
    ("http://h.io/deep/path/?k=v#frag", "http://h.io/deep/path?k=v"),
    ("HTTPS://H.IO/UPPER/Path", "https://h.io/UPPER/Path"),  # path case kept
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    ).select("doc_id", canonical_url("url").alias("c"))
    got = {r.doc_id: r.c for r in df.collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_url_dedup_groups_and_plan_is_codegen(spark):
    rows = [(i, CASES[i % 3][0]) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup_groups(df)
    res = {r.canonical_url: (r.n_docs, r.min_doc) for r in out.collect()}
    assert res["http://example.com/a?a=1&b=2"] == (3, 0)
    assert res["https://h.io/p"] == (3, 1)
    # no python evaluation anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
