"""Gap-constrained sequence mining: exactness vs a Python brute force
on adversarial micro-data (timestamp ties, gap boundary, repeated
types), plus vocabulary override and max_len behavior."""

import datetime as dt
import itertools
import random

from data_pipeline_demo_spark.operators.seqmine import gap_sequences

EPOCH = dt.datetime(2024, 1, 1)


def _brute(rows, gap_s, max_len):
    """All length-1..max_len gap-constrained sequences with support."""
    by_user = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((ts, ty))
    support = {}
    for u, evs in by_user.items():
        pats = set()
        n = len(evs)
        for i in range(n):
            pats.add((evs[i][1],))
        if max_len >= 2:
            for i, j in itertools.permutations(range(n), 2):
                ti, tj = evs[i][0], evs[j][0]
                if tj > ti and (tj - ti).total_seconds() <= gap_s:
                    pats.add((evs[i][1], evs[j][1]))
        if max_len >= 3:
            for i, j, k in itertools.permutations(range(n), 3):
                ti, tj, tk = evs[i][0], evs[j][0], evs[k][0]
                if (
                    tj > ti
                    and (tj - ti).total_seconds() <= gap_s
                    and tk > tj
                    and (tk - tj).total_seconds() <= gap_s
                ):
                    pats.add((evs[i][1], evs[j][1], evs[k][1]))
        for p in pats:
            support[p] = support.get(p, 0) + 1
    return {(">".join(p), len(p)): s for p, s in support.items()}


def _run(spark, rows, gap_s=60, max_len=3, **kw):
    df = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id int, event_type string, ts timestamp",
    )
    got = {
        (r.pattern, r.length): r.support
        for r in gap_sequences(
            df, max_gap_s=gap_s, max_len=max_len, **kw
        ).collect()
    }
    assert got == _brute(rows, gap_s, max_len)


def test_seqmine_random_matches_bruteforce(spark):
    rng = random.Random(3)
    rows = [
        (
            rng.randint(0, 9),
            rng.choice("abc"),
            EPOCH + dt.timedelta(seconds=rng.randint(0, 600)),
        )
        for _ in range(250)
    ]
    _run(spark, rows, gap_s=60)


def test_seqmine_timestamp_ties_are_unordered(spark):
    # Two events at the SAME instant: neither precedes the other.
    t0 = EPOCH
    rows = [(1, "a", t0), (1, "b", t0), (1, "c", t0 + dt.timedelta(seconds=5))]
    _run(spark, rows, gap_s=60)
    got = {
        r.pattern
        for r in gap_sequences(
            spark.createDataFrame(
                rows, "user_id int, event_type string, ts timestamp"
            ),
            max_gap_s=60,
        ).collect()
    }
    assert "a>b" not in got and "b>a" not in got
    assert {"a>c", "b>c"} <= got


def test_seqmine_gap_boundary_inclusive(spark):
    rows = [
        (1, "a", EPOCH),
        (1, "b", EPOCH + dt.timedelta(seconds=60)),   # exactly at gap: in
        (2, "a", EPOCH),
        (2, "b", EPOCH + dt.timedelta(seconds=61)),   # beyond gap: out
    ]
    _run(spark, rows, gap_s=60)


def test_seqmine_repeated_type_chain(spark):
    rows = [
        (1, "a", EPOCH + dt.timedelta(seconds=i * 10)) for i in range(4)
    ]
    _run(spark, rows, gap_s=15)  # a, a>a, a>a>a all supported


def test_seqmine_vocab_override_and_maxlen(spark):
    rows = [
        (1, "a", EPOCH),
        (1, "b", EPOCH + dt.timedelta(seconds=5)),
        (1, "z", EPOCH + dt.timedelta(seconds=6)),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    got = {
        r.pattern
        for r in gap_sequences(
            df, max_gap_s=60, max_len=2, types=["a", "b"]
        ).collect()
    }
    # z appears as an L1 pattern (vocab only bounds PREDECESSOR types)
    # but never as a predecessor; max_len=2 emits no triples.
    assert "a>b" in got and "z" in got
    assert not any(p.count(">") >= 2 for p in got)
    assert "b>z" in got      # z is a valid SUCCESSOR (current-row type)
    assert "z>a" not in got  # ...but never a predecessor outside vocab
