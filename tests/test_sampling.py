"""Deterministic sampling / mixing / packing invariants."""

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import sampling, textstats
from data_pipeline_demo_spark.sources.tables import table


def test_deterministic_sample_stable_and_sized(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    s1 = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.3).collect()}
    s2 = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.3).collect()}
    assert s1 == s2  # replayable
    n = docs.count()
    assert 0.2 * n < len(s1) < 0.4 * n  # hash-uniform sizing
    # nested fractions: a smaller sample with the same salt is a subset
    s_small = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.1).collect()}
    assert s_small <= s1
    # different salt draws an (essentially) independent sample
    s_other = {
        r["doc_id"] for r in sampling.deterministic_sample(docs, 0.3, salt=1).collect()
    }
    assert s_other != s1


def test_stratified_sample_mixing(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    mixed = sampling.stratified_sample(
        ev, {"click": 1.0, "view": 0.2}, stratum_col="event_type", key_col="event_id"
    )
    by_type = {
        r["event_type"]: r["n"]
        for r in mixed.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type["click"] == totals["click"]  # keep-all stratum intact
    assert 0.1 * totals["view"] < by_type.get("view", 0) < 0.3 * totals["view"]
    assert set(by_type) == {"click", "view"}  # default_fraction=0 drops the rest


def test_train_holdout_split_disjoint_covering_stable(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    train, hold = sampling.train_holdout_split(docs, 0.2)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert t | h == {r["doc_id"] for r in docs.collect()}
    # stability under increments: the split of a subset agrees
    sub = docs.filter(F.col("doc_id") % 3 == 0)
    t2, h2 = sampling.train_holdout_split(sub, 0.2)
    assert {r["doc_id"] for r in h2.collect()} == h & {
        r["doc_id"] for r in sub.collect()
    }


def test_pack_sequences_budget_and_coverage(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", textstats.token_count("text").alias("n_tokens")
    )
    budget = 256
    packed = sampling.pack_sequences(docs, budget=budget, num_shards=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pack in by_pack.values():
        toks = sorted((r["pack_offset"], r["n_tokens"]) for r in pack)
        # offsets are a contiguous token layout within the pack
        pos = toks[0][0]
        assert pos < budget  # a pack starts within budget
        for off, n in toks:
            assert off == pos
            pos += n
        # overshoot is at most the last doc (contiguous packing contract)
        total = sum(n for _, n in toks)
        assert total - toks[-1][1] < budget
    # deterministic
    again = sorted(
        (r["doc_id"], r["pack_id"], r["pack_offset"])
        for r in sampling.pack_sequences(docs, budget=budget, num_shards=8).collect()
    )
    assert again == sorted((r["doc_id"], r["pack_id"], r["pack_offset"]) for r in rows)


def test_weighted_sample_k_properties(spark):
    """A-Res weighted sampling: exact k, deterministic per salt,
    non-positive weights excluded, and inclusion frequency tracks
    weight (exercised over 60 deterministic salts: the heavy item must
    appear far more often than any light one)."""
    from data_pipeline_demo_spark.operators.sampling import weighted_sample_k

    rows = [(i, 10.0 if i == 0 else 1.0) for i in range(40)]
    rows += [(100, 0.0), (101, -5.0), (102, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    s0 = sorted(r["doc_id"] for r in weighted_sample_k(df, 5, "w", salt=7).collect())
    assert len(s0) == 5
    assert sorted(
        r["doc_id"] for r in weighted_sample_k(df, 5, "w", salt=7).collect()
    ) == s0  # replayable
    assert not {100, 101, 102} & set(s0)

    hits = {i: 0 for i, _ in rows}
    n_salts = 60
    for salt in range(n_salts):
        for r in weighted_sample_k(df, 5, "w", salt=salt).collect():
            hits[r["doc_id"]] += 1
    assert hits[100] == hits[101] == hits[102] == 0
    light = [hits[i] for i in range(1, 40)]
    # E[heavy] ≈ 0.78·n (w=10 vs 39×1, k=5) vs E[light] ≈ 0.108·n;
    # deterministic given the salt range, so the margin is stable
    assert hits[0] > max(light)
    assert hits[0] > 3 * (sum(light) / len(light))
    # k larger than eligible rows: returns all eligible, no error
    assert weighted_sample_k(df, 1000, "w").count() == 40


def test_mixture_sample_realizes_target_shares(spark):
    """Data-mixing layer: from a skewed corpus (90% web / 9% code / 1%
    books), a 50/30/20 target comes back at the largest size the
    scarcest domain allows — books (binding) kept 100%, web and code
    downsampled so realized shares track the target within hash-
    threshold tolerance; absent-domain targets raise; replay is
    deterministic."""
    import pytest

    from data_pipeline_demo_spark.operators.sampling import (
        mixture_plan,
        mixture_sample,
    )

    rows = (
        [(i, "web") for i in range(9000)]
        + [(10_000 + i, "code") for i in range(900)]
        + [(20_000 + i, "books") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    targets = {"web": 0.5, "code": 0.3, "books": 0.2}

    plan = mixture_plan(df, targets, "domain")
    # books is binding: T = 100/0.2 = 500 -> web 250/9000, code 150/900
    assert plan["books"] == 1.0
    assert abs(plan["web"] - 250 / 9000) < 1e-9
    assert abs(plan["code"] - 150 / 900) < 1e-9

    got = mixture_sample(df, targets, "domain")
    counts = {r["domain"]: r["n"] for r in got.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["books"] == 100  # binding domain fully kept
    # hash-threshold realization: expected 250 web / 150 code, allow
    # binomial-ish slack
    assert abs(counts["web"] - 250) < 60
    assert abs(counts["code"] - 150) < 45
    # deterministic replay
    again = {r["doc_id"] for r in mixture_sample(df, targets, "domain").collect()}
    assert again == {r["doc_id"] for r in got.collect()}

    # weight-mass planning: books get 100x heavier rows -> far less
    # downsampling needed elsewhere
    w = df.withColumn(
        "tokens", F.when(F.col("domain") == "books", 10_000).otherwise(100)
    )
    wplan = mixture_plan(w, targets, "domain", weight_col="tokens")
    assert wplan["books"] < 1.0 or wplan["web"] == 1.0  # binding moved

    with pytest.raises(ValueError, match="no available data"):
        mixture_plan(df, {"web": 0.5, "audio": 0.5}, "domain")
    with pytest.raises(ValueError, match="positive total"):
        mixture_plan(df, {"web": 0.0}, "domain")


def test_cap_per_group_keeps_best_and_plan_prunes(spark, sf_dir):
    """cap_per_group keeps exactly min(cap, group size) rows per group,
    the CHOSEN order's top rows (longest docs first) — and the rank
    filter pushes below the exchange as a partial WindowGroupLimit so
    map tasks never ship whole groups."""
    docs = table(spark, sf_dir, "documents")
    capped = sampling.cap_per_group(
        docs.select("source", "doc_id", "n_chars"),
        cap=10,
        group_col="source",
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
    )
    rows = capped.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, kept in by_src.items():
        assert len(kept) == min(10, totals[src])
        # kept set == the top-10 by (n_chars desc, doc_id) brute force
        want = {
            r["doc_id"]
            for r in sorted(
                docs.filter(F.col("source") == src).collect(),
                key=lambda r: (-r["n_chars"], r["doc_id"]),
            )[:10]
        }
        assert {r["doc_id"] for r in kept} == want
    plan = capped._jdf.queryExecution().executedPlan().toString()
    before_exchange = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in before_exchange


def test_cap_per_group_rejects_nonpositive_cap(spark, sf_dir):
    import pytest

    docs = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        sampling.cap_per_group(docs, cap=0, group_col="source")


def test_fill_token_budget_properties(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    out = sampling.fill_token_budget(
        docs, budget=1500, group_col="source", weight_col="n_chars"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["sample_rank"])
        # running mass consistent and in draw order
        run = 0
        for r in rows:
            run += r["n_chars"]
            assert r["cum_weight"] == run
        # everything but the last row is strictly under budget;
        # at least one row always contributes
        assert all(r["cum_weight"] - r["n_chars"] < 1500 for r in rows)
        assert rows
        if len(rows) > 1:
            assert rows[-2]["cum_weight"] < 1500
    # nested-prefix reuse: a smaller budget equals re-cutting the big
    # result by its own cum_weight
    small = {
        (r["source"], r["doc_id"])
        for r in sampling.fill_token_budget(
            docs, budget=700, group_col="source", weight_col="n_chars"
        ).collect()
    }
    recut = {
        (r["source"], r["doc_id"])
        for r in out
        if r["cum_weight"] - r["n_chars"] < 700
    }
    assert small == recut

    import pytest

    with pytest.raises(ValueError, match="budget"):
        sampling.fill_token_budget(
            docs, budget=0, group_col="source", weight_col="n_chars"
        )
