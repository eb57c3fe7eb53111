"""Sink semantics: upsert idempotency + update-wins (FIXTURES.md §B),
incremental bucket rewrites, the JDBC executor, ledger anti-join dedup,
quarantine capture, end-to-end reference ETL."""

import glob
import hashlib
import json
import os
import uuid

from pyspark.sql import functions as F

from data_pipeline_demo_spark.plans.reference_etl import PipelineConfig, run_ingest
from data_pipeline_demo_spark.sinks.upsert import (
    append_ledger,
    new_files,
    upsert_jdbc,
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


def test_upsert_file_uri_target(spark, tmp_path):
    """The sink must work against a qualified file:// URI (all metadata
    and commit renames go through the Hadoop FS API, not os.path)."""
    target = "file://" + str(tmp_path / "target")
    b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double")
    assert upsert_parquet(spark, b1, target) == 2
    b2 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "id long, amount double")
    assert upsert_parquet(spark, b2, target) == 3
    rows = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}
    # sidecar landed inside the target through the FS API
    assert (tmp_path / "target" / "_upsert_bucket_spec.json").is_file()


def test_upsert_null_key_superseded_not_duplicated(spark, tmp_path):
    """Null keys are one key: successive batches must replace the
    null-keyed row (null-safe supersede join), not accumulate copies."""
    target = str(tmp_path / "target")
    b1 = spark.createDataFrame([(None, 1.0), (7, 70.0)], "id long, amount double")
    assert upsert_parquet(spark, b1, target) == 2
    b2 = spark.createDataFrame([(None, 2.0)], "id long, amount double")
    assert upsert_parquet(spark, b2, target) == 2
    rows = {(r["id"], r["amount"]) for r in spark.read.parquet(target).collect()}
    assert rows == {(7, 70.0), (None, 2.0)}


def test_upsert_no_staging_leftovers(spark, tmp_path):
    """The staging directory must be gone after a successful publish."""
    target = str(tmp_path / "target")
    b = spark.createDataFrame([(1, 1.0)], "id long, amount double")
    upsert_parquet(spark, b, target)
    upsert_parquet(spark, b, target)
    leftovers = [p for p in os.listdir(tmp_path) if "staging" in p]
    assert leftovers == []
    inside = [p for p in os.listdir(target) if "staging" in p or ".replaced" in p]
    assert inside == []


def _bucket_of_key(spark, key_val, num_buckets=32):
    return (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(key_val).cast("long")), F.lit(num_buckets)))
        .collect()[0][0]
    )


def test_upsert_untouched_buckets_not_rewritten(spark, tmp_path):
    """A disjoint-key batch must leave other buckets' files byte-identical
    (incremental merge is O(touched buckets), not O(table))."""
    target = str(tmp_path / "target")
    # find two keys landing in different buckets
    k1 = 1
    k2 = next(
        k for k in range(2, 200)
        if _bucket_of_key(spark, k) != _bucket_of_key(spark, k1)
    )
    upsert_parquet(spark, spark.createDataFrame([(k1, 10.0)], "id long, amount double"), target)
    b1_dir = os.path.join(target, f"__bucket={_bucket_of_key(spark, k1)}")

    def snapshot(d):
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(os.path.join(d, "*.parquet")))
        }

    before = snapshot(b1_dir)
    assert before, "bucket dir for k1 should exist"
    upsert_parquet(spark, spark.createDataFrame([(k2, 20.0)], "id long, amount double"), target)
    assert snapshot(b1_dir) == before  # same files, same bytes
    rows = {r["id"]: r["amount"] for r in spark.read.parquet(target).collect()}
    assert rows == {k1: 10.0, k2: 20.0}


class RecordingConnectionFactory:
    """Picklable DB-API stand-in: each connection journals executemany
    calls to a unique JSONL file under `dir_path` (executor-side), so the
    driver-side test can read back exactly what would hit Postgres."""

    def __init__(self, dir_path):
        self.dir_path = dir_path

    def __call__(self):
        return _RecordingConnection(self.dir_path)


class _RecordingConnection:
    def __init__(self, dir_path):
        self.path = os.path.join(dir_path, f"conn_{uuid.uuid4().hex}.jsonl")
        self.calls = []
        self.committed = False

    def cursor(self):
        return _RecordingCursor(self)

    def commit(self):
        self.committed = True
        with open(self.path, "w") as f:
            for sql, params in self.calls:
                f.write(json.dumps({"sql": sql, "params": params}) + "\n")

    def rollback(self):
        self.calls.clear()

    def close(self):
        pass


class _RecordingCursor:
    def __init__(self, conn):
        self.conn = conn

    def executemany(self, sql, seq):
        self.conn.calls.append((sql, [list(p) for p in seq]))


def test_upsert_jdbc_executes_batched_statements(spark, tmp_path):
    # the factory unpickles inside executor Python workers, which don't
    # have pytest's rootdir on sys.path — ship this module to them
    spark.sparkContext.addPyFile(os.path.abspath(__file__))
    rec_dir = str(tmp_path / "rec")
    os.makedirs(rec_dir)
    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(10)], "id long, amount double"
    ).repartition(2)
    upsert_jdbc(df, "transactions", RecordingConnectionFactory(rec_dir), batch_size=3)

    files = glob.glob(os.path.join(rec_dir, "*.jsonl"))
    assert len(files) == 2  # one connection per non-empty partition
    all_params, sqls, batch_sizes = [], set(), []
    for p in files:
        for line in open(p):
            call = json.loads(line)
            sqls.add(call["sql"])
            batch_sizes.append(len(call["params"]))
            all_params.extend(call["params"])
    assert sqls == {upsert_sql("transactions", ["id", "amount"])}
    assert sorted(all_params) == [[i, i * 1.5] for i in range(10)]
    assert max(batch_sizes) <= 3  # chunking honored


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


def test_json_scan_explicit_schema(spark, sf_dir, tmp_path):
    """S5: JSON-lines scan with explicit schema round-trips the same rows
    the parquet source holds (no inference drift)."""
    from data_pipeline_demo_spark.sources.csv_ingest import read_json
    from data_pipeline_demo_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").limit(100)
    p = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(p)
    back = read_json(spark, p, docs.schema)
    assert back.schema == docs.schema
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_json_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from data_pipeline_demo_spark.sources.csv_ingest import (
        read_json_with_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{broken json!!\n"
        '{"id": 2, "v": "b"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, quarantine = read_json_with_quarantine(spark, str(p), schema)
    assert {r["id"] for r in good.collect()} == {1, 2}
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["raw_record"].startswith("{broken")


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


def test_reference_etl_multifile_batch(spark, tmp_path):
    """N landing files are ONE Spark read; per-file rows/QA/ledger and
    notification ordering survive the batching."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "dealer_2025-05-01.csv").write_text(
        f"{CSV_HEADER}\n1,30/04/2025 19:36,$10.00,$100.00,,,,,,,,,\n"
        f"2,30/04/2025 19:37,$20.00,$200.00,,,,,,,,,\n"
    )
    (landing / "dealer_2025-05-02.csv").write_text(
        f"{CSV_HEADER}\n3,01/05/2025 08:00,$30.00,$300.00,,,,,,,,,\n"
    )
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
    by_file = {p["file"]: p for p in report["processed"]}
    assert by_file["dealer_2025-05-01.csv"]["rows"] == 2
    assert by_file["dealer_2025-05-02.csv"]["rows"] == 1
    assert by_file["dealer_2025-05-01.csv"]["qa"]["checksum_total"] == 300.0
    assert by_file["dealer_2025-05-02.csv"]["qa"]["checksum_total"] == 300.0
    # every start precedes every complete (write happens between)
    starts = [i for i, e in enumerate(events) if e[0] == "start"]
    dones = [i for i, e in enumerate(events) if e[0] == "done"]
    assert max(starts) < min(dones)
    assert {r["id"] for r in spark.read.parquet(cfg.target_path).collect()} == {1, 2, 3}
    ledger = {r["filename"]: r["num_rows"] for r in spark.read.parquet(cfg.ledger_path).collect()}
    assert ledger == {"dealer_2025-05-01.csv": 2, "dealer_2025-05-02.csv": 1}
    # rerun: everything skipped
    report2 = run_ingest(spark, cfg)
    assert report2["processed"] == [] and report2["skipped"] == 2


REFERENCE_XML = """<config>
  <supabase><bucketName>dealer-data</bucketName><tableName>transactions</tableName></supabase>
  <mail><sender>ops@example.com</sender><to>finance@example.com</to>
        <subject>Daily ingest</subject><message_text>done</message_text></mail>
</config>"""


def test_xml_config_parse_and_dispatch(spark, tmp_path):
    """S6/O2: the reference's XML config shape parses strictly, loads
    through the Hadoop FS API (file:// URI), and dispatches the ETL."""
    import pytest

    from data_pipeline_demo_spark.sources.xml_config import (
        load_reference_config,
        parse_reference_config,
        to_pipeline_config,
    )

    cfg = parse_reference_config(REFERENCE_XML)
    assert cfg.bucket_name == "dealer-data"
    assert cfg.table_name == "transactions"
    assert cfg.to == "finance@example.com"

    # missing element raises with the path named (no silent None)
    with pytest.raises(ValueError, match="supabase/tableName"):
        parse_reference_config("<config><supabase><bucketName>x</bucketName></supabase></config>")
    with pytest.raises(ValueError, match="not well-formed"):
        parse_reference_config("<config><broken")

    p = tmp_path / "config.xml"
    p.write_text(REFERENCE_XML)
    loaded = load_reference_config(spark, "file://" + str(p))
    assert loaded == cfg

    # config-driven dispatch: end-to-end run over the mapped layout
    landing = tmp_path / "dealer-data" / "Data"
    landing.mkdir(parents=True)
    (landing / "dealer_2025-04-30.csv").write_text(
        f"{CSV_HEADER}\n1,30/04/2025 19:36,$10.00,$100.00,,,,,,,,,\n"
    )
    pcfg = to_pipeline_config(loaded, str(tmp_path))
    assert pcfg.landing_dir.endswith("dealer-data/Data")
    report = run_ingest(spark, pcfg)
    assert report["processed"][0]["rows"] == 1
    assert spark.read.parquet(str(tmp_path / "transactions")).count() == 1


def test_compact_buckets(spark, tmp_path):
    """Compaction coalesces multi-file buckets to their size-appropriate
    file count, preserves every row, and skips already-compact buckets."""
    from data_pipeline_demo_spark.sinks.upsert import compact_buckets

    target = str(tmp_path / "target")
    big = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "id long, amount double"
    ).repartition(16)
    upsert_parquet(spark, big, target, num_buckets=4)

    def bucket_files():
        out = {}
        for d in glob.glob(os.path.join(target, "__bucket=*")):
            out[os.path.basename(d)] = sorted(
                os.path.basename(p) for p in glob.glob(os.path.join(d, "*.parquet"))
            )
        return out

    before = bucket_files()
    assert any(len(v) >= 2 for v in before.values()), before  # fragmented
    rows_before = sorted(
        (r["id"], r["amount"]) for r in spark.read.parquet(target).collect()
    )
    n = compact_buckets(spark, target)  # huge default target size -> 1 file each
    assert n == sum(1 for v in before.values() if len(v) >= 2)
    after = bucket_files()
    assert all(len(v) == 1 for v in after.values()), after
    rows_after = sorted(
        (r["id"], r["amount"]) for r in spark.read.parquet(target).collect()
    )
    assert rows_after == rows_before
    # second pass: nothing left to do, no staging debris
    assert compact_buckets(spark, target) == 0
    assert not glob.glob(os.path.join(target, ".compact_*"))
    # table still upserts correctly post-compaction
    assert upsert_parquet(
        spark, spark.createDataFrame([(0, 999.0)], "id long, amount double"), target
    ) == 2000


def test_upsert_schema_evolution_new_column(spark, tmp_path):
    """A batch carrying a new column must merge: old rows surface null
    for it, new rows carry it, and the key merge semantics hold."""
    target = str(tmp_path / "target")
    upsert_parquet(
        spark, spark.createDataFrame([(1, 10.0)], "id long, amount double"), target
    )
    evolved = spark.createDataFrame(
        [(1, 11.0, "AUD"), (2, 20.0, "NZD")],
        "id long, amount double, currency string",
    )
    assert upsert_parquet(spark, evolved, target) == 2
    rows = {
        r["id"]: (r["amount"], r["currency"])
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {1: (11.0, "AUD"), 2: (20.0, "NZD")}
    # reverse direction: a narrow batch against the evolved table
    assert upsert_parquet(
        spark, spark.createDataFrame([(3, 30.0)], "id long, amount double"), target
    ) == 3
    rows = {
        r["id"]: (r["amount"], r["currency"])
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {1: (11.0, "AUD"), 2: (20.0, "NZD"), 3: (30.0, None)}


def test_run_ingest_batch_qa_observation(spark, tmp_path):
    """Whole-batch QA metrics ride the upsert scan via df.observe: the
    report's batch_qa matches the per-file QA rows summed."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "dealer_2025-06-01.csv").write_text(
        f"{CSV_HEADER}\n1,30/04/2025 19:36,$10.00,$100.00,,,,,,,,,\n"
        f"2,30/04/2025 19:37,$20.00,$200.00,,,,,,,,,\n"
    )
    (landing / "dealer_2025-06-02.csv").write_text(
        f"{CSV_HEADER}\n3,01/05/2025 08:00,$30.00,$300.00,,,,,,,,,\n"
    )
    cfg = PipelineConfig(
        landing_dir=str(landing),
        target_path=str(tmp_path / "target"),
        ledger_path=str(tmp_path / "ledger"),
        quarantine_path=str(tmp_path / "quarantine"),
    )
    report = run_ingest(spark, cfg)
    qa = report["batch_qa"]
    per_file = [p["qa"] for p in report["processed"]]
    assert qa["n_rows"] == sum(p["n_rows"] for p in per_file) == 3
    assert qa["checksum_total"] == sum(p["checksum_total"] for p in per_file)
    assert qa["n_dates_parsed"] == 3 and qa["n_dates_null"] == 0
    assert qa["date_min"] == min(p["date_min"] for p in per_file)
    assert qa["date_max"] == max(p["date_max"] for p in per_file)
