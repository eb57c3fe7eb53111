"""The reference's end-to-end pipeline, Spark-native (SURVEY.md §3).

EP2/EP3 (`/root/reference/data_pipeline.py:106-161`, `:352-572`)
re-expressed as a declarative batch job:

    landing CSVs ──read(schema)──▶ good / quarantine
        good ──clean_transactions──▶ typed rows
        ledger anti-join ──▶ only new files          (dedup guard, P4)
        upsert_parquet(on id) ──▶ target             (K3)
        append_ledger ──▶ ledger                     (K5)
        qa_aggregates ──▶ run report                 (A1-A4)

Ordering preserved from EP2 step 5: notify-start → write → ledger →
notify-complete — notifications are injected callables (side channels
stay out of the data plane; the reference gated the DB write on email
success via a mutable global, `data_pipeline.py:154`).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_transactions, qa_aggregates
from ..sinks.upsert import append_ledger, new_files, upsert_parquet, write_quarantine
from ..sources.csv_ingest import (
    DEALER_TRANSACTIONS_SCHEMA,
    TRANSACTION_LOG_SCHEMA,
    read_csv_with_quarantine,
)


@dataclass
class PipelineConfig:
    """Injected config — replaces the reference's env-var prints + XML
    fetch (`data_pipeline.py:26-41`, `:170-211`). Credentials never live
    in code and are never logged."""

    landing_dir: str
    target_path: str
    ledger_path: str
    quarantine_path: str
    key: str = "id"
    notify_start: Callable[[str, int], None] = field(default=lambda f, n: None)
    notify_complete: Callable[[str, int], None] = field(default=lambda f, n: None)


def run_ingest(spark: SparkSession, cfg: PipelineConfig) -> dict[str, object]:
    """Process every not-yet-ingested CSV under ``landing_dir``.

    Returns a run report: per-file row counts + QA aggregate row.
    """
    files = sorted(
        f for f in os.listdir(cfg.landing_dir) if f.endswith(".csv")
    )
    if os.path.isdir(cfg.ledger_path):
        ledger = spark.read.schema(TRANSACTION_LOG_SCHEMA).parquet(cfg.ledger_path)
    else:
        ledger = spark.createDataFrame([], TRANSACTION_LOG_SCHEMA)

    candidates = spark.createDataFrame(
        [(f, f.rsplit(".", 1)[0][-10:].replace("-", "/"), ) for f in files],
        "filename string, filedate string",
    )
    todo = [r.filename for r in new_files(candidates, ledger).collect()]

    report: dict[str, object] = {"processed": [], "skipped": len(files) - len(todo)}
    for fname in todo:
        path = os.path.join(cfg.landing_dir, fname)
        good, quarantine = read_csv_with_quarantine(
            spark, path, DEALER_TRANSACTIONS_SCHEMA
        )
        cleaned = clean_transactions(good).withColumn(
            "id", F.col("id").try_cast("long")
        )
        n = cleaned.count()
        cfg.notify_start(fname, n)

        n_bad = quarantine.count()
        if n_bad:
            write_quarantine(quarantine, cfg.quarantine_path, reason=f"csv:{fname}")
        total = upsert_parquet(
            spark, cleaned.drop("_all_money_null"), cfg.target_path, key=cfg.key
        )
        filedate = fname.rsplit(".", 1)[0][-10:].replace("-", "/")
        append_ledger(spark, cfg.ledger_path, fname, filedate, n, subject=fname)
        cfg.notify_complete(fname, n)
        qa = qa_aggregates(cleaned).collect()[0].asDict()
        report["processed"].append(
            {"file": fname, "rows": n, "quarantined": n_bad, "target_total": total, "qa": qa}
        )
    return report
