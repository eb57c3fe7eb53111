"""Sink semantics: upsert idempotency + update-wins (FIXTURES.md §B),
ledger anti-join dedup, quarantine capture, end-to-end reference ETL."""

import os

from pyspark.sql import functions as F

from data_pipeline_demo_spark.plans.reference_etl import PipelineConfig, run_ingest
from data_pipeline_demo_spark.sinks.upsert import (
    append_ledger,
    new_files,
    upsert_parquet,
    upsert_sql,
)
from data_pipeline_demo_spark.sources.csv_ingest import (
    DEALER_TRANSACTIONS_SCHEMA,
    read_csv_with_quarantine,
)

CSV_HEADER = (
    "id,TransactionDatetime,Amount,TotalAmount,Surcharge,MSF,Tip,Cashout,"
    "Extras,Levy,ServiceFee,TxnFee,Rebate"
)


def test_upsert_idempotent_and_update_wins(spark, tmp_path):
    target = str(tmp_path / "target")
    batch1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, amount double"
    )
    assert upsert_parquet(spark, batch1, target) == 2
    # re-delivery of the same batch: same count (idempotent, K3)
    assert upsert_parquet(spark, batch1, target) == 2
    # changed non-key value must win (MERGE update path)
    batch2 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "id long, amount double")
    assert upsert_parquet(spark, batch2, target) == 3
    rows = {
        r["id"]: r["amount"] for r in spark.read.parquet(target).collect()
    }
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}


def test_upsert_sql_render():
    sql = upsert_sql("transactions", ["id", "amount", "msf"])
    assert "ON CONFLICT (id) DO UPDATE" in sql
    assert "amount = EXCLUDED.amount" in sql
    assert "id = EXCLUDED.id" not in sql


def test_ledger_dedup_guard(spark, tmp_path):
    ledger_path = str(tmp_path / "ledger")
    append_ledger(spark, ledger_path, "a.csv", "2025/04/30", 10, "subj")
    ledger = spark.read.parquet(ledger_path)
    cands = spark.createDataFrame(
        [("a.csv", "2025/04/30"), ("b.csv", "2025/05/01")],
        "filename string, filedate string",
    )
    fresh = new_files(cands, ledger).collect()
    assert [r["filename"] for r in fresh] == ["b.csv"]


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    good = "10001,30/04/2025 19:36," + ",".join(["$1.00"] * 11)
    # 30 comma-separated fields: cannot fit the 13-column schema
    bad = ",".join(["x"] * 30)
    p.write_text(f"{CSV_HEADER}\n{good}\n{bad}\n")
    good_df, quarantine = read_csv_with_quarantine(
        spark, str(p), DEALER_TRANSACTIONS_SCHEMA
    )
    assert good_df.count() == 1
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["raw_record"].startswith("x,x,")


def test_reference_etl_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    row1 = "1,30/04/2025 19:36,$10.00,$100.00,$1.00,-$5.00,,,,,,,"
    row2 = "2,12/4/25 20:46,$20.00,$200.00,$2.00,$6.00,,,,,,,"
    (landing / "dealer_2025-04-30.csv").write_text(f"{CSV_HEADER}\n{row1}\n{row2}\n")

    events = []
    cfg = PipelineConfig(
        landing_dir=str(landing),
        target_path=str(tmp_path / "target"),
        ledger_path=str(tmp_path / "ledger"),
        quarantine_path=str(tmp_path / "quarantine"),
        notify_start=lambda f, n: events.append(("start", f, n)),
        notify_complete=lambda f, n: events.append(("done", f, n)),
    )
    report = run_ingest(spark, cfg)
    assert len(report["processed"]) == 1
    assert report["processed"][0]["rows"] == 2
    assert report["processed"][0]["qa"]["checksum_total"] == 300.0
    # EP2 step-5 ordering: notify-start before notify-complete
    assert [e[0] for e in events] == ["start", "done"]
    target = {r["id"]: r for r in spark.read.parquet(cfg.target_path).collect()}
    assert target[1]["MSF"] == 5.0  # abs-normalized

    # second run: ledger guard skips the already-ingested file (O1/P4)
    report2 = run_ingest(spark, cfg)
    assert report2["processed"] == [] and report2["skipped"] == 1
