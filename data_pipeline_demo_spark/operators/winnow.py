"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
— the MOSS algorithm).

Per document: hash every k-gram, slide a window of w consecutive
hashes, and record the MINIMUM of each window (rightmost position on
ties). The paper's guarantee: any substring match of length ≥ w+k−1
between two documents shares at least one selected fingerprint — so an
equi-join on fingerprint values finds every long-enough copy, at a
density of ~2/(w+1) fingerprints per position instead of all k-grams.

This is the copy/plagiarism-detection primitive a training-corpus
pipeline runs cross-source (boilerplate detection, license-text
propagation, train/eval contamination at substring grain) — a
different contract from the MinHash/SimHash family (whole-document
similarity) and from exact substring dedup (which needs the match
itself): winnowing gives POSITIONAL evidence at bounded density.

Implementation stance (the `textprep.shingle_hash_sets` lesson, learned
again here the hard way): every per-position expression is FLAT —
python-side loops unroll the k-char hash fold and the w-element window
scans into fixed chains of ``try_element_at`` on staged REAL columns.
A first draft used nested ``aggregate(sequence(...))`` lambdas over a
captured array column; Catalyst evaluates captured subtrees per
element, and the nesting turned 500 sf0.01 documents into a >10-minute
job. The flat form runs the same math in ~1s, stays whole-stage
codegen, and needs no UDF and no shuffle.

Instead of materializing each window's argmin (which needs a per-t
inner scan), the selection uses the run-length identity: position j
(1-based) is the rightmost minimum of SOME fitting window iff

    p_j = #consecutive predecessors with h ≥ h_j   (capped at w−1)
    s_j = #consecutive successors  with h > h_j    (capped at w−1)
    n ≥ w:  max(0, (w−1)−(n−j), (w−1)−s_j) ≤ min(w−1, j−1, p_j)
    n < w:  p_j ≥ j−1  and  s_j ≥ n−j      (single short window)

(left span ℓ = j−t needs all of [t, j) ≥ h_j; right span r = t+w−1−j
needs all of (j, t+w−1] > h_j — strict, because an equal later hash
would be the rightmost min instead; ℓ+r = w−1 and the window must fit
inside [1, n].) Pinned against a brute python reference of the paper.

Hash: h(g) = fold over chars of (acc*31 + ord(char)) mod 1_000_000_007
— stays far inside int64, so Spark and DuckDB (q243's oracle) compute
bit-identical values with plain integer ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000_007


def _elem(arr: str, idx: Column) -> Column:
    """1-based array lookup that is null for ANY out-of-range index:
    try_element_at alone raises on 0 and counts NEGATIVE indices from
    the END (both bites for the lag chains below), so guard first."""
    i = idx.cast("int")
    return F.when(i >= 1, F.try_element_at(arr, i))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (id, pos, fp) winnowing selections per document: ``pos``
    is the 0-based k-gram start whose hash ``fp`` won some window
    (rightmost minimum). Join two corpora on ``fp`` to find every
    shared substring of length ≥ w+k−1 (the paper's guarantee, pinned
    by tests against a python reference).

    Scale shape: map-only flat codegen per document (staged array
    columns, unrolled element chains — no shuffle, no UDF); output is
    ~2/(w+1) rows per character and the cross-corpus join that follows
    is an integer equi-join on fp — never all-pairs."""
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    # texts shorter than k have no k-grams (also: Spark's
    # sequence(1, 0) DESCENDS — an unguarded sequence would fabricate
    # a gram at position 0 for short texts)
    d = df.select(id_col, F.col(text_col).alias("__wn_text")).filter(
        F.length("__wn_text") >= k
    )
    # stage 1: per-char codepoints as a REAL column
    ords = F.expr(
        "transform(sequence(1, length(__wn_text)),"
        " i -> ascii(substring(__wn_text, i, 1)))"
    ).alias("__wn_o")
    d = d.select(id_col, ords)
    # stage 2: k-gram hashes — the fold unrolled python-side into a
    # flat arithmetic chain over try_element_at lookups
    def gram_hash(i: Column) -> Column:
        acc: Column = F.lit(0).cast("long")
        for j in range(k):
            acc = F.pmod(acc * 31 + _elem("__wn_o", i + F.lit(j)), F.lit(_MOD))
        return acc

    hashes = F.transform(
        F.sequence(F.lit(1), F.size("__wn_o") - (k - 1)), gram_hash
    ).alias("__wn_h")
    d = d.select(id_col, hashes)
    # stage 3: per-position run lengths, again flat unrolled chains
    n = F.size("__wn_h")

    def run_len(j: Column, h: Column, step: int, strict: bool) -> Column:
        # longest prefix of lag/lead comparisons that keeps passing;
        # a null neighbor (array edge) stops the run
        out: Column = F.lit(w - 1)
        for el in range(w - 1, 0, -1):
            nb = _elem("__wn_h", j + F.lit(step * el))
            ok = nb > h if strict else nb >= h
            out = F.when(ok.isNull() | ~ok, F.lit(el - 1)).otherwise(out)
        return out

    def selected(j: Column) -> Column:
        h = _elem("__wn_h", j)
        p = run_len(j, h, -1, strict=False)
        s = run_len(j, h, +1, strict=True)
        full = F.greatest(
            F.lit(0), F.lit(w - 1) - (n - j), F.lit(w - 1) - s
        ) <= F.least(F.lit(w - 1), j - F.lit(1), p)
        short = (p >= j - F.lit(1)) & (s >= n - j)
        return F.when(n >= w, full).otherwise(short)

    sels = F.filter(
        F.transform(F.sequence(F.lit(1), F.size("__wn_h")), lambda j: j),
        selected,
    ).alias("__wn_j")
    d = d.select(id_col, F.col("__wn_h"), sels)
    # explode_outer + null filter (not plain explode): the
    # InferFiltersFromGenerate rule on a plain explode inlines the
    # selection tree below the staged projections (the dedup.py lesson)
    out = (
        d.select(id_col, "__wn_h", F.explode_outer("__wn_j").alias("__j"))
        .filter(F.col("__j").isNotNull())
        .select(
            id_col,
            (F.col("__j") - 1).cast("long").alias("pos"),
            _elem("__wn_h", F.col("__j")).alias("fp"),
        )
    )
    return out


def copy_detection_pairs(
    fp: DataFrame,
    min_shared: int,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """The cross-document copy-detection join (q244's shape, factored
    so the skew stress can drive the exact production path): distinct
    (doc, fp) selections self-join on the fingerprint VALUE, pairs
    aggregate shared-fingerprint counts, a threshold keeps strongly-
    overlapping pairs.

    Scale shape: integer equi-join at ~2/(w+1) density. The skew to
    watch at 100 TB is a stopword-grade fingerprint (common
    boilerplate) whose bucket fans out quadratically; with AQE's
    skew-join enabled Spark splits that partition at runtime —
    tests/test_copy_skew.py plants a 30%-document-frequency
    fingerprint and asserts the executed plan shows
    ``SortMergeJoin(skew=true)``."""
    sel = fp.select(id_col, fp_col).distinct()
    a = sel.alias("a")
    b = sel.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{fp_col}") == F.col(f"b.{fp_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
