"""Planning-time pruning for the ``format("txtable")`` data source.

Spark 4.1's Python DataSource filter pushdown
(``DataSourceReader.pushFilters``, gated by
``spark.sql.python.filterPushdown.enabled`` — the engine session factory
turns it on) hands the reader the query's AND-ed predicates at planning
time.  We use them for METADATA-ONLY partition pruning, two tiers, both
conservative:

- **zone maps** — manifest ``bucket_stats`` ``[min, max]`` per stats
  column: a bucket whose recorded range cannot intersect the predicate's
  bounds is never scanned.  Iceberg's manifest-stats role, same overlap
  rule as ``sinks.txlog.read_txtable(prune_between=...)``.
- **key buckets** — ``EqualTo``/``In`` on the table's bucketing key hash
  the literal with the SAME function the writer used
  (``pmod(xxhash64(key), num_buckets)``, ``sinks/upsert.py:41``): a point
  lookup plans exactly the one bucket that can hold the key, independent
  of any stats.

Every filter is handed back to Spark unhandled, so Spark re-applies all
predicates post-scan: pruning can only *skip* buckets that provably hold
no matching row — results stay exact even when a bucket has no recorded
stats (kept) or a literal's type is unsupported (tier skipped).

``xxh64`` below is a pure-Python implementation of the public XXH64
algorithm (Yann Collet, BSD-licensed spec) applied to Spark's column
encoding: integral values hash their widened 4-/8-byte two's-complement
little-endian form (int32-family vs int64 matters — Spark's hashInt and
hashLong differ), strings their UTF-8 bytes, seed 42.  Parity with
``pyspark.sql.functions.xxhash64`` is asserted in
``tests/test_txtable_source.py``.

Reference scope note: the reference pipeline has no scan pruning at all —
every run re-reads whole CSVs (``/root/reference/data_pipeline.py:299``);
this module exists for the 100 TB path where metadata skipping is the
difference between a point lookup and a full-table scan.
"""

from __future__ import annotations

import struct

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` — unsigned 64-bit result.  Matches Spark's
    ``XXH64.hashUnsafeBytes`` (and, via the 4-/8-byte encodings,
    ``hashInt``/``hashLong``)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def bucket_of_literal(value, num_buckets: int, key_kind: str) -> int | None:
    """The bucket id ``pmod(xxhash64(value), num_buckets)`` lands in, or
    None when the literal can't be hashed with writer parity (unsupported
    type / out-of-range) — callers must then skip key-bucket pruning.

    ``key_kind``: ``"int32"`` (byte/short/int columns — Spark hashes the
    4-byte form), ``"int64"`` (long), or ``"string"``.
    """
    if isinstance(value, bool):
        return None
    try:
        if key_kind == "string" and isinstance(value, str):
            data = value.encode("utf-8")
        elif key_kind == "int64" and isinstance(value, int):
            data = struct.pack("<q", value)
        elif key_kind == "int32" and isinstance(value, int):
            data = struct.pack("<i", value)
        else:
            return None
    except struct.error:
        return None
    h = xxh64(data, 42)
    if h >= 1 << 63:  # Spark's hash is a SIGNED long; pmod of the signed value
        h -= 1 << 64
    return h % num_buckets


# --- manifest bloom-index probe (shared with sinks.txlog) ------------------
#
# Positions replicate the JVM build expression
# ``pmod(xxhash64(CAST(col AS STRING), j), bits)``: Spark's multi-arg
# xxhash64 folds left to right (argument hashed with the running
# result as seed) and ``F.lit(j)`` is an INT literal, so the depth
# index hashes through the 4-byte path. Parity pinned in
# tests/test_bloom_index.py. Filters are stored SPARSE — a JSON map
# {word_idx: 16-hex-char word} holding only non-zero 64-bit words —
# so ``bloom_bits`` can be sized to the data (≈10 bits per expected
# distinct value per bucket for ~1% fpp) without either a fixed
# expression count at build time or dense manifest blobs.

BLOOM_BITS = 1024  # default creation-time size
BLOOM_K = 3


def bloom_probe_positions(value, bits: int = BLOOM_BITS) -> list[int]:
    """The K filter positions a string/int/date literal hashes to, or
    raises for unsupported probe types."""
    import datetime as _dt

    if isinstance(value, bool) or not isinstance(value, (str, int, _dt.date)):
        raise ValueError(
            f"bloom probes support string/int/date literals (values hash "
            f"via CAST AS STRING); got {type(value).__name__}"
        )
    h1 = xxh64(str(value).encode("utf-8"), 42)
    out = []
    for j in range(BLOOM_K):
        h2 = xxh64(struct.pack("<i", j), seed=h1)
        signed = h2 - (1 << 64) if h2 >= 1 << 63 else h2
        out.append(signed % bits)
    return out


def bloom_might_contain(words: dict, positions: list[int]) -> bool:
    """``words``: the sparse {word_idx(str): hex16} filter map."""
    for pos in positions:
        w = words.get(str(pos // 64))
        if w is None or not (int(w, 16) >> (pos % 64)) & 1:
            return False
    return True


def _arrow_key_kind(arrow_schema, key: str) -> str | None:
    """Map the key column's Arrow type onto the hash encoding Spark uses,
    or None for types this tier doesn't cover (dates, decimals, ...)."""
    if arrow_schema is None:
        return None
    try:
        t = arrow_schema.field(key).type
    except KeyError:
        return None
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return "int32"
    return None


def _sv(v):
    """JSON-safe stat coercion — MUST mirror ``sinks.txlog._stat_value``
    (the function that serialized the stats at write time) so bounds and
    stored zone-map values always compare like-for-like."""
    import datetime as _dt
    import decimal as _dec

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat()
    if isinstance(v, _dec.Decimal):
        return float(v)
    return str(v)


def _one_col(f) -> str | None:
    attr = f.attribute
    return attr[0] if isinstance(attr, tuple) and len(attr) == 1 else None


def collect_bounds(filters) -> dict[str, tuple]:
    """Per-column [lo, hi] interval implied by the AND of ``filters``.
    Strict comparisons are relaxed to inclusive — conservative for
    pruning.  Unsupported shapes contribute nothing."""
    bounds: dict[str, tuple] = {}

    def tighten(col, lo, hi):
        cl, ch = bounds.get(col, (None, None))
        if lo is not None and (cl is None or _gt(lo, cl)):
            cl = lo
        if hi is not None and (ch is None or _gt(ch, hi)):
            ch = hi
        bounds[col] = (cl, ch)

    def _gt(a, b):
        try:
            return a > b
        except TypeError:
            return False

    for f in filters:
        col = _one_col(f)
        if col is None:
            continue
        if isinstance(f, EqualTo) and f.value is not None:
            tighten(col, f.value, f.value)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            tighten(col, f.value, None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            tighten(col, None, f.value)
        elif isinstance(f, In):
            vals = [v for v in f.value if v is not None]
            if vals:
                try:
                    tighten(col, min(vals), max(vals))
                except TypeError:
                    pass
    return bounds


def key_equality_buckets(filters, key: str, num_buckets: int, key_kind: str):
    """Set of bucket ids that can satisfy the key-equality filters, or
    None when no usable equality exists (or a literal can't be hashed)."""
    if key_kind is None:
        return None
    out: set[int] | None = None
    for f in filters:
        if _one_col(f) != key:
            continue
        if isinstance(f, EqualTo) and f.value is not None:
            vals = [f.value]
        elif isinstance(f, In):
            vals = [v for v in f.value if v is not None]
        else:
            continue
        bs = set()
        for v in vals:
            b = bucket_of_literal(v, num_buckets, key_kind)
            if b is None:
                return None  # one unhashable literal poisons the tier
            bs.add(b)
        out = bs if out is None else (out & bs)
    return out


def bloom_filter_buckets(filters, manifest: dict):
    """Bucket-keep predicate from the manifest bloom index: for each
    Equal/In filter on a DECLARED bloom column, a bucket survives only
    if its stored filter might contain at least one of the literals.
    Returns a set of surviving bucket ids, or None when no usable
    bloom filter applies (unsupported literal types poison only their
    own filter — conservative)."""
    declared = set(manifest.get("bloom_columns", []))
    if not declared:
        return None
    blooms = manifest.get("bucket_blooms", {})
    out: set[str] | None = None
    for f in filters:
        col = _one_col(f)
        if col not in declared:
            continue
        if isinstance(f, EqualTo) and f.value is not None:
            vals = [f.value]
        elif isinstance(f, In):
            vals = [v for v in f.value if v is not None]
            if not vals:
                continue
        else:
            continue
        bits = int(manifest.get("bloom_bits", BLOOM_BITS))
        try:
            pos_sets = [bloom_probe_positions(v, bits) for v in vals]
        except ValueError:
            continue  # unhashable literal type: skip THIS filter
        keep = set()
        for b in manifest["buckets"]:
            hx = blooms.get(b, {}).get(col)
            if hx is None or any(
                bloom_might_contain(hx, ps) for ps in pos_sets
            ):
                keep.add(b)
        out = keep if out is None else (out & keep)
    return out


def prune_bucket_ids(manifest: dict, filters, arrow_schema) -> list[str]:
    """Live bucket ids that can still hold matching rows — the
    intersection of the key-equality tier, the zone-map tier, and the
    bloom-index tier, in the manifest's sorted order.  With no usable
    filter this is exactly the full live set (pruning is opt-out-free:
    it can only remove work)."""
    live = sorted(manifest["buckets"], key=int)

    bf = bloom_filter_buckets(filters, manifest)
    if bf is not None:
        live = [b for b in live if b in bf]

    kb = key_equality_buckets(
        filters,
        manifest.get("key"),
        int(manifest.get("num_buckets", 0) or 0),
        _arrow_key_kind(arrow_schema, manifest.get("key")),
    ) if manifest.get("num_buckets") else None
    if kb is not None:
        live = [b for b in live if int(b) in kb]

    stats_cols = set(manifest.get("stats_columns", []))
    bounds = {
        c: bnds for c, bnds in collect_bounds(filters).items() if c in stats_cols
    }
    if bounds:
        import decimal as _dec

        stats = manifest.get("bucket_stats", {})

        def _pair(a, b, dec_bound):
            # stringified-Decimal stats must compare by VALUE, never
            # lexically ('9.5' > '12.0') — parity with
            # sinks.txlog._stat_cmp_pair; only when the pushed literal
            # itself is a Decimal (string columns keep Spark's own
            # lexicographic semantics)
            if dec_bound and isinstance(a, str) and isinstance(b, str):
                try:
                    return _dec.Decimal(a), _dec.Decimal(b)
                except _dec.InvalidOperation:
                    return a, b
            return a, b

        def overlaps(b: str) -> bool:
            st = stats.get(b)
            if st is None:
                return True  # no stats recorded: must keep
            for c, (lo, hi) in bounds.items():
                mn, mx = st.get(c, [None, None])
                if mn is None or mx is None:
                    continue  # all-null bucket column: keep
                dec_bound = any(
                    isinstance(v, _dec.Decimal)
                    for v in (lo, hi)
                    if v is not None
                )
                lo_s, hi_s = _sv(lo), _sv(hi)
                try:
                    if lo_s is not None:
                        mx_c, lo_c = _pair(mx, lo_s, dec_bound)
                        if mx_c < lo_c:
                            return False
                    if hi_s is not None:
                        mn_c, hi_c = _pair(mn, hi_s, dec_bound)
                        if mn_c > hi_c:
                            return False
                except TypeError:
                    return True  # incomparable literal: keep, stay exact
            return True

        live = [b for b in live if overlaps(b)]

    # null-count tier: Spark pushes IsNull/IsNotNull as first-class
    # filters — a 0-null bucket cannot satisfy IS NULL, an all-null one
    # cannot satisfy IS NOT NULL (counts are physical; absent → keep)
    nulls = manifest.get("bucket_nulls", {})
    rows_phys = manifest.get("row_counts", {})
    for f in filters:
        col = _one_col(f)
        if col is None or col not in stats_cols:
            continue
        if isinstance(f, IsNull):
            live = [
                b
                for b in live
                if nulls.get(b, {}).get(col) is None
                or nulls[b][col] > 0
            ]
        elif isinstance(f, IsNotNull):
            live = [
                b
                for b in live
                if nulls.get(b, {}).get(col) is None
                or nulls[b][col] < rows_phys.get(b, 1)
            ]
    return live
