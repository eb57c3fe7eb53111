"""UDF/UDAF surface (SURVEY.md §2.2): grouped-map ``applyInPandas``,
grouped-aggregate ``pandas_udf``, and the batch ``approx_count_distinct``
sketch — the three shapes the scalar-pandas_udf/mapInPandas pair in
``operators/multimodal.py`` doesn't cover.

Rules of engagement stay the engine's: Python only where built-ins can't
express the semantics, always Arrow-batched (never row-at-a-time), and
each query oracle-checked where its math is deterministic across engines.
Median is an order statistic — ``(a+b)/2`` on the two middle doubles in
both pandas and DuckDB — so the grouped-map query hash-matches exactly;
the grouped-agg query floors to int64 before summing, making its
reduction order-insensitive.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table
from .registry import register


@register(
    "q54_applyinpandas_center",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           c_acctbal - MEDIAN(c_acctbal) OVER (PARTITION BY c_mktsegment)
             AS bal_centered
    FROM customer
    """,
)
def q54_applyinpandas_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-segment median-centering.

    Each market segment arrives as ONE pandas DataFrame (Arrow batch);
    the group computes its own median and subtracts it. At scale the
    shuffle is the groupBy's — the same exchange a SQL window over the
    segment would need — and each group must fit one executor's memory:
    the documented contract of grouped-map (use window functions when a
    single group can outgrow an executor).
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["c_acctbal"].median()
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_centered": pdf["c_acctbal"] - med,
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(
        center, "c_custkey long, c_mktsegment string, bal_centered double"
    )


@register(
    "q55_grouped_agg_pandas_udf",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(FLOOR(c_acctbal) AS BIGINT)) AS BIGINT)
             AS sum_floor_bal,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q55_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf inside a normal ``groupBy().agg``.
    Floor-to-int64 before summing keeps the reduction exact and
    order-insensitive (float sums would be partition-order dependent and
    could never hash-match an oracle). Spark disallows mixing
    group-aggregate pandas UDFs with built-in aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a second pandas
    aggregate rather than ``F.count``.
    """
    import numpy as np

    @F.pandas_udf("long")
    def sum_floor(s: pd.Series) -> int:
        return int(np.floor(s).astype("int64").sum())

    @F.pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return len(s)

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        sum_floor("c_acctbal").alias("sum_floor_bal"),
        n_rows("c_custkey").alias("n_customers"),
    )


def q56_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch HyperLogLog++ distinct-user sketch per event type (rows-only,
    registered in plans/approx.py:
    the sketch estimate is implementation-specific, so no cross-engine
    oracle exists by construction; the ±5%-of-exact bound is unit-tested
    in tests/test_llm_ops.py). At 100 TB this is THE distinct-count
    shape: constant-memory sketches merge map-side, no exact-distinct
    shuffle of raw user ids. The quantile sketch (percentile_approx,
    Greenwald-Khanna) is the same story for order statistics: bounded
    state per partition instead of a per-group sort; its error bound vs
    the exact percentile is unit-tested alongside the HLL bound.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
    )


_DUCK_UDTF_TOKENIZE = """
    SELECT d.doc_id, CAST(u.i - 1 AS BIGINT) AS pos, d.arr[u.i] AS term
    FROM (
      SELECT doc_id, string_split(text, ' ') AS arr
      FROM documents WHERE doc_id % 50 = 0
    ) d, UNNEST(range(1, len(d.arr) + 1)) AS u(i)
"""


def q100_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: a ``@udtf`` class emitting
    one (pos, term) row per token, applied per document through SQL's
    ``LATERAL udtf(col)`` correlated-table-function join — the
    one-row-to-many-rows API shape (Spark 4's pyspark.sql.functions.udtf).

    A UDTF evaluates per row in Python — the engine's slow path, kept
    off every hot query (the same tokenization is one codegen
    ``explode(split())`` in q51/q84; that built-in form is the 100 TB
    path). ``useArrow=True`` keeps the transfer vectorized
    (ArrowEvalPythonUDTF — the plan-properties suite rejects any
    BatchEvalPython fallback). This query exists to certify the API
    surface: the filter sits below the lateral join so only selected
    rows cross into Python, and the UDTF remains embarrassingly
    parallel (no state, no shuffle). Oracle-checked
    exactly: Python's split(' ') and DuckDB's string_split are
    byte-identical on single-space separators."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, term: string", useArrow=True)
    class TokenizeTerms:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield i, w

    spark.udtf.register("tokenize_terms", TokenizeTerms)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM documents d, LATERAL tokenize_terms(d.text) t
        WHERE d.doc_id % 50 = 0
        """
    )
