"""Encoding repair for raw text corpora (ftfy's core fix, JVM-side).

The single most common corruption in scraped/exported text is
*mojibake*: UTF-8 bytes decoded as Windows-1252/Latin-1 somewhere in a
pipeline, so ``café`` arrives as ``cafÃ©`` and ``—`` as ``â€"``. The
reference feeds downstream systems from CSV/HTML payloads
(``/root/reference/data_pipeline.py:352-572``) where exactly this class
of corruption originates; a 100 TB training corpus cleaned without this
fix bakes the damage into the model.

Repair rule (ftfy's heuristic, reduced to its decidable core): map the
string's cp1252-specific punctuation (the 27 printable characters
cp1252 assigns to bytes 0x80–0x9F — €‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ) onto
the corresponding C1 control characters, re-encode as ISO-8859-1
(byte-identical to what the original mis-decode read), re-decode as
UTF-8, and accept the result only when

1. every character was Latin-1-representable (nothing was invented —
   ISO-8859-1 is bijective byte↔char, so the round-trip is lossless by
   construction on that domain),
2. the byte stream is VALID UTF-8 (``is_valid_utf8`` — the bytes really
   were a UTF-8 document once), and
3. the string got SHORTER (a multi-byte sequence actually collapsed —
   this is the mojibake detector: clean text re-decodes to itself).

Spark-4 strictness notes baked into the expression shape: ``encode``
RAISES on unmappable characters (no silent '?') and codegen's
common-subexpression elimination can hoist a subexpression OUT of its
``when`` guard — so the encode input is pre-masked to the empty string
on non-Latin-1 rows (total, never raises, CSE-safe) and validity is
checked with ``is_valid_utf8`` before any ``decode``.

Everything is built-in expressions — translate/encode/decode/regexp
inside whole-stage codegen, no UDF, no shuffle: the fix streams through
a scan at full JVM speed, which is what lets it run inline at ingest on
every document of a 100 TB corpus.

False-positive note (shared with ftfy): text that GENUINELY spells a
valid-UTF-8-as-cp1252 sequence (someone literally wrote ``cafÃ©``)
repairs to its decoded form. Statistically that pattern essentially
never occurs in real language by accident — it requires a character
pair that IS a valid multi-byte UTF-8 encoding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# cp1252 bytes 0x80-0x9F that differ from ISO-8859-1, and the C1
# control characters Latin-1 assigns those same bytes (the 5 cp1252
# holes — 0x81 8D 8F 90 9D — already read as their C1 chars, so they
# need no mapping). Order matters: src[i] → dst[i].
_CP1252_SRC = "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
_CP1252_DST = "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97\x98\x99\x9a\x9b\x9c\x9e\x9f"

_BOM = "﻿"


def _one_pass(col: Column) -> Column:
    """One mojibake-repair pass as a pure codegen expression."""
    pre = F.translate(col, _CP1252_SRC, _CP1252_DST)
    latin1able = ~pre.rlike("[^\\x00-\\xff]")
    # encode input masked to '' on non-Latin-1 rows: total, CSE-safe
    enc = F.encode(F.when(latin1able, pre).otherwise(F.lit("")), "iso-8859-1")
    repaired = F.when(
        latin1able & F.is_valid_utf8(enc), F.decode(enc, "UTF-8")
    )
    return F.when(
        repaired.isNotNull() & (F.length(repaired) < F.length(col)),
        repaired,
    ).otherwise(col)


def fix_mojibake(col: Column | str, passes: int = 1) -> Column:
    """Column expression repairing UTF-8-as-cp1252/Latin-1 mojibake;
    NULL-safe, non-mojibake text passes through byte-identical.
    ``passes`` bounds how many nested corruptions unwind (text
    encoded-then-misdecoded N times needs N passes). The default is ONE
    pass deliberately: each extra pass re-exposes the accidental-
    mojibake false-positive class to ALREADY-CLEAN text — hypothesis
    found that a second pass "repairs" the genuine string ``Èœ`` into
    ``Ȝ`` (its cp1252 bytes happen to be valid UTF-8). ftfy iterates to
    a fixpoint only because it adds plausibility scoring; without that
    scoring, opt into ``passes=2`` when a feed is KNOWN to be
    double-corrupted."""
    out = F.col(col) if isinstance(col, str) else col
    for _ in range(max(1, passes)):
        out = _one_pass(out)
    return out


def simulate_mojibake(col: Column | str) -> Column:
    """The corruption ``fix_mojibake`` inverts, as a codegen expression:
    UTF-8 bytes read back as cp1252 (HTML5/Java table — the 5 undefined
    bytes surface as their C1 controls). Exists so tests and oracle
    queries can manufacture the defect deterministically IN-PLAN and
    certify repair∘corrupt ≡ identity without any engine-external
    fixture. NULL-safe; not part of a cleaning pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    # bytes → Latin-1 chars (bijective), then C1 controls → cp1252
    # punctuation (the inverse of _one_pass's translate)
    return F.translate(
        F.decode(F.encode(c, "UTF-8"), "iso-8859-1"),
        _CP1252_DST,
        _CP1252_SRC,
    )


def strip_bom(col: Column | str) -> Column:
    """Remove a leading U+FEFF byte-order mark (the other ubiquitous
    text-landing artifact — Excel/Windows CSV exports prepend it, and
    it silently breaks first-column name matching and startswith
    filters downstream)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.startswith(c, F.lit(_BOM)), F.substring(c, 2, 0x7FFFFFFF)
    ).otherwise(c)
