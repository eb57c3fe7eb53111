"""Aho-Corasick multi-pattern dictionary matching (Aho & Corasick,
CACM 1975) — the scale tool for scanning a corpus against a LARGE term
dictionary (blocklists, PII gazetteers, brand/entity lexicons).

Why not a regex alternation or per-term `contains`: an alternation of
100k terms compiles into a pathological NFA and per-term scanning is
O(terms × corpus). The AC automaton matches EVERY dictionary term in
ONE linear pass per document: O(text + matches), dictionary size only
affects the (vocabulary-sized, broadcast-once) automaton build.

Spark shape: the automaton builds driver-side in O(Σ|term|), ships to
executors inside the mapInPandas closure (broadcast by the task
serializer), and each Arrow batch scans its documents locally — no
shuffle, no join, map-only. At 100 TB: the scan is embarrassingly
parallel; only (doc, term, count) hits come back.

Semantics: ALL occurrences are counted, overlapping included (the
classic AC output function — 'aa' occurs 3× in 'aaaa'), which is what
q241's DuckDB oracle replays with a position-scan lambda.

Parity note: the reference repo (data_pipeline.py) has no dictionary
scanner; this extends the text-analysis portfolio (SURVEY §2.2
LLM-ops) alongside lexicon sentiment and PII regex scrubbing.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def build_automaton(terms: list[str]) -> tuple[list[dict], list[list[int]]]:
    """Classic three-function Aho-Corasick build: goto trie, BFS fail
    links, output sets merged along fail chains. Returns (goto, out)
    where ``goto[s]`` maps char → next state and ``out[s]`` lists the
    indices of terms ending at state ``s``."""
    if not terms:
        raise ValueError("dictionary_match: need at least one term")
    if any(not t for t in terms):
        raise ValueError("dictionary_match: empty terms are not allowed")
    if len(set(terms)) != len(terms):
        raise ValueError("dictionary_match: duplicate terms in dictionary")
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for ti, term in enumerate(terms):
        s = 0
        for ch in term:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(ti)
    fail = [0] * len(goto)
    q: deque[int] = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, nxt in goto[s].items():
            q.append(nxt)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt].extend(out[fail[nxt]])
        # flatten the fail function into goto so the scan loop is one
        # dict lookup per char (no fail-chain walk at match time)
        f = fail[s]
        for ch, nxt in goto[f].items():
            goto[s].setdefault(ch, nxt)
    return goto, out


def count_matches(text: str, goto: list[dict], out: list[list[int]],
                  n_terms: int) -> list[int]:
    """One linear pass: per-term occurrence counts (overlaps counted)."""
    counts = [0] * n_terms
    s = 0
    root = goto[0]
    for ch in text:
        s = goto[s].get(ch) if s else root.get(ch)
        if s is None:
            s = 0
            continue
        if out[s]:
            for ti in out[s]:
                counts[ti] += 1
    return counts


def dictionary_match(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term, n) rows for every dictionary term occurring in each
    document — n counts ALL occurrences, overlapping included. Zero-hit
    (doc, term) pairs are not emitted."""
    goto, out = build_automaton(terms)
    n_terms = len(terms)
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("term", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hits, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                counts = count_matches(text or "", goto, out, n_terms)
                for ti, c in enumerate(counts):
                    if c:
                        ids.append(did)
                        hits.append(terms[ti])
                        ns.append(c)
            yield pd.DataFrame({id_col: ids, "term": hits, "n": ns})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
