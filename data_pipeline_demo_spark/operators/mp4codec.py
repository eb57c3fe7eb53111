"""Stdlib ISO-BMFF (MP4) muxer/demuxer — the real video-container tier.

Closes the long-declared video seam the same way ``imagecodec.py``/
``jpegcodec.py`` closed the image one: the CONTAINER format is the real
public standard (ISO/IEC 14496-12 box grammar — ``ftyp``/``mdat``/
``moov`` with a full sample table: ``stsd stts ctts stss stsc stsz
stco/co64``), implemented from the spec with ``struct`` only, while the
per-frame CODEC payload stays an opaque byte string (this container has
no codec libs; a real decoder drops in per frame exactly where
``imagecodec.decode_image`` sits for images).

What a training-data pipeline needs from video at 100 TB is precisely
what the demuxer yields without decoding: per-sample byte ranges,
decode/presentation timestamps (``stts`` + ``ctts``), keyframe flags
(``stss``), and sizes (``stsz``) — enough to frame-sample, shard, and
dedup on keyframes while touching only the bytes it keeps. Parity
reference: data_pipeline.py has no video path (reference repo is
tabular-only); this tier exists for the training-data portfolio.

Mux layout: ``ftyp`` + ``mdat`` + ``moov`` (offsets into ``mdat`` are
known before the movie box is sized, so chunk offsets need no
second pass). Samples group into multi-sample chunks so the
``stsc``→``stco`` walk in the demuxer is genuinely exercised, and
``stsz`` takes its fixed-size shortcut when every sample is equal.
"""

from __future__ import annotations

import struct
from typing import Iterable

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


class Mp4FormatError(ValueError):
    """Raised when bytes do not parse as the supported ISO-BMFF subset."""


# --------------------------------------------------------------------------
# box writers
# --------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _visual_sample_entry(width: int, height: int) -> bytes:
    # VisualSampleEntry('mp4v'), ISO 14496-12 §12.1.3: 6 reserved bytes,
    # data_reference_index=1, then the fixed visual fields. The esds
    # codec config is deliberately absent — samples are opaque here.
    name = b"dpds fake codec"
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + bytes([len(name)]) + name.ljust(31, b"\x00")
        + struct.pack(">Hh", 0x0018, -1)
    )
    return _box(b"mp4v", body)


def _rle(values: list[int]) -> list[tuple[int, int]]:
    runs: list[tuple[int, int]] = []
    for v in values:
        if runs and runs[-1][1] == v:
            runs[-1] = (runs[-1][0] + 1, v)
        else:
            runs.append((1, v))
    return runs


def mux_mp4(
    samples: Iterable[dict],
    *,
    timescale: int = 600,
    width: int = 64,
    height: int = 64,
    samples_per_chunk: int = 3,
    use_co64: bool = False,
) -> bytes:
    """Serialize ``samples`` — dicts with ``payload`` (bytes),
    ``duration`` (timescale ticks), ``keyframe`` (bool), optional
    ``ctts`` (pts−dts offset) — into a structurally valid MP4.

    ``stss`` is omitted when every sample is a keyframe and ``ctts``
    when every offset is 0 (the spec's defaults); ``stsz`` collapses to
    its fixed-size form when sizes are uniform — the demuxer must (and
    does) handle both sides of each of those forks."""
    samples = list(samples)
    if not samples:
        raise Mp4FormatError("mux_mp4: need at least one sample")
    if samples_per_chunk < 1:
        raise Mp4FormatError("mux_mp4: samples_per_chunk must be >= 1")
    payloads = [bytes(s["payload"]) for s in samples]
    durations = [int(s["duration"]) for s in samples]
    keyframes = [bool(s.get("keyframe", True)) for s in samples]
    ctts = [int(s.get("ctts", 0)) for s in samples]
    if any(d <= 0 for d in durations):
        raise Mp4FormatError("mux_mp4: sample durations must be positive")

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isom" + b"mp41")
    mdat_payload = b"".join(payloads)
    mdat = _box(b"mdat", mdat_payload)

    # absolute chunk offsets: ftyp, then mdat's 8-byte header
    base = len(ftyp) + 8
    chunk_offsets: list[int] = []
    pos = 0
    for i in range(0, len(payloads), samples_per_chunk):
        chunk_offsets.append(base + pos)
        pos += sum(len(p) for p in payloads[i : i + samples_per_chunk])

    # --- sample table ---
    stts = _full(
        b"stts", 0, 0,
        _U32.pack(len(_rle(durations)))
        + b"".join(struct.pack(">II", n, d) for n, d in _rle(durations)),
    )
    boxes = [stts]
    if any(ctts):
        boxes.append(_full(
            b"ctts", 0, 0,
            _U32.pack(len(_rle(ctts)))
            + b"".join(struct.pack(">II", n, c) for n, c in _rle(ctts)),
        ))
    if not all(keyframes):
        sync = [i + 1 for i, k in enumerate(keyframes) if k]
        boxes.append(_full(
            b"stss", 0, 0,
            _U32.pack(len(sync)) + b"".join(_U32.pack(s) for s in sync),
        ))
    # stsc: one entry for the uniform run, plus one for a short tail
    last = len(payloads) - (len(chunk_offsets) - 1) * samples_per_chunk
    stsc_entries = [(1, samples_per_chunk, 1)]
    if len(chunk_offsets) > 1 and last != samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), last, 1))
    elif len(chunk_offsets) == 1:
        stsc_entries = [(1, len(payloads), 1)]
    boxes.append(_full(
        b"stsc", 0, 0,
        _U32.pack(len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    ))
    sizes = [len(p) for p in payloads]
    # fixed-size form only for a nonzero uniform size: sample_size==0
    # is the spec's "sizes are in the table" sentinel, so a movie of
    # all-empty samples must take the per-sample form
    if len(set(sizes)) == 1 and sizes[0] != 0:
        boxes.append(_full(
            b"stsz", 0, 0, struct.pack(">II", sizes[0], len(sizes))
        ))
    else:
        boxes.append(_full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(_U32.pack(s) for s in sizes),
        ))
    if use_co64:
        boxes.append(_full(
            b"co64", 0, 0,
            _U32.pack(len(chunk_offsets))
            + b"".join(_U64.pack(o) for o in chunk_offsets),
        ))
    else:
        boxes.append(_full(
            b"stco", 0, 0,
            _U32.pack(len(chunk_offsets))
            + b"".join(_U32.pack(o) for o in chunk_offsets),
        ))
    stsd = _full(
        b"stsd", 0, 0, _U32.pack(1) + _visual_sample_entry(width, height)
    )
    stbl = _box(b"stbl", stsd + b"".join(boxes))

    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, _U32.pack(1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    duration = sum(durations)
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        _U32.pack(0) + b"vide" + b"\x00" * 12 + b"dpds video\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + _U32.pack(2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# box readers
# --------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) walking ``data[start:end]``,
    honoring 64-bit largesize (size==1) and to-end-of-file (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack_from(data, pos)[0]
        typ = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box header")
            size = _U64.unpack_from(data, pos + 8)[0]
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise Mp4FormatError(
                f"box {typ!r} at {pos} overruns its container"
            )
        yield typ, pos + head, pos + size
        pos += size
    if pos != end:
        raise Mp4FormatError(f"trailing {end - pos} bytes are not a box")


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _iter_boxes(data, start, end):
        if t == typ:
            return s, e
    return None


def _full_payload(data: bytes, s: int, e: int, typ: bytes) -> tuple[int, int]:
    if e - s < 4:
        raise Mp4FormatError(f"{typ.decode()} too short for version/flags")
    if data[s] != 0:
        raise Mp4FormatError(
            f"{typ.decode()} version {data[s]} unsupported (version 0 only)"
        )
    return s + 4, e


def _read_table(data: bytes, s: int, e: int, typ: bytes, fmt: str):
    s, e = _full_payload(data, s, e, typ)
    (n,) = _U32.unpack_from(data, s)
    st = struct.Struct(fmt)
    s += 4
    if s + n * st.size > e:
        raise Mp4FormatError(f"{typ.decode()} entry table truncated")
    return [st.unpack_from(data, s + i * st.size) for i in range(n)]


def demux_mp4(data: bytes, *, with_payload: bool = True) -> dict:
    """Parse one video track out of ``data``: returns ``{"timescale",
    "width", "height", "codec", "samples": [...]}`` where each sample
    carries ``index dts pts duration keyframe offset size`` and (unless
    ``with_payload=False`` — the metadata-only projection used to plan
    a sampling job before paying for bytes) the ``payload`` slice.

    The walk is the spec's: ``stts`` runs accumulate into dts, ``ctts``
    offsets lift dts to pts, ``stss`` marks sync samples (absent ⇒ all
    sync), and byte ranges come from the ``stsc`` chunk map joined to
    ``stco``/``co64`` offsets with ``stsz`` sizes accumulated within
    each chunk."""
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4FormatError("no moov box: not an MP4 movie")
    mvhd = _find(data, *moov, b"mvhd")
    timescale = 0
    if mvhd is not None:
        s, _ = _full_payload(data, *mvhd, b"mvhd")
        timescale = struct.unpack_from(">II", data, s)[1]
    for t, ts_, te_ in _iter_boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, ts_, te_, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None:
            continue
        hs, _ = _full_payload(data, *hdlr, b"hdlr")
        if data[hs + 4 : hs + 8] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is not None:
            s, _ = _full_payload(data, *mdhd, b"mdhd")
            timescale = struct.unpack_from(">III", data, s)[2] or timescale
        minf = _find(data, *mdia, b"minf")
        stbl = minf and _find(data, *minf, b"stbl")
        if not stbl:
            raise Mp4FormatError("video trak has no sample table")
        return _demux_stbl(data, stbl, timescale, with_payload)
    raise Mp4FormatError("no video ('vide' handler) track in moov")


def _demux_stbl(data, stbl, timescale, with_payload):
    tables: dict[bytes, tuple[int, int]] = {}
    for t, s, e in _iter_boxes(data, *stbl):
        tables[t] = (s, e)

    width = height = 0
    codec = ""
    if b"stsd" in tables:
        s, e = _full_payload(data, *tables[b"stsd"], b"stsd")
        for t2, s2, e2 in _iter_boxes(data, s + 4, e):
            codec = t2.decode("latin-1")
            if e2 - s2 >= 28:
                width, height = struct.unpack_from(">HH", data, s2 + 24)
            break

    if b"stts" not in tables or b"stsz" not in tables:
        raise Mp4FormatError("sample table missing stts/stsz")
    # stsz's count is bounded by its own table bytes, so parse it FIRST
    # and let it cap every run-length expansion below: a corrupted (or
    # adversarial) stts/ctts run count of 0xFFFFFFFF would otherwise
    # materialize a multi-GB list BEFORE the cross-check (found by
    # byte-flip fuzzing, round 11)
    n_samples_sz, sizes = _read_stsz(data, *tables[b"stsz"])
    durations = _expand_runs(
        _read_table(data, *tables[b"stts"], b"stts", ">II"),
        n_samples_sz,
        b"stts",
    )
    if len(durations) != n_samples_sz:
        raise Mp4FormatError(
            f"stts covers {len(durations)} samples but stsz declares "
            f"{n_samples_sz}"
        )
    offsets_pts = [0] * n_samples_sz
    if b"ctts" in tables:
        flat = _expand_runs(
            _read_table(data, *tables[b"ctts"], b"ctts", ">II"),
            n_samples_sz,
            b"ctts",
        )
        if len(flat) != n_samples_sz:
            raise Mp4FormatError("ctts sample count mismatch")
        offsets_pts = flat
    sync = None
    if b"stss" in tables:
        sync = {s[0] for s in _read_table(data, *tables[b"stss"], b"stss", ">I")}

    if b"stco" in tables:
        chunk_offs = [o[0] for o in _read_table(data, *tables[b"stco"], b"stco", ">I")]
    elif b"co64" in tables:
        chunk_offs = [o[0] for o in _read_table(data, *tables[b"co64"], b"co64", ">Q")]
    else:
        raise Mp4FormatError("sample table missing stco/co64")
    stsc = _read_table(data, *tables[b"stsc"], b"stsc", ">III") if b"stsc" in tables else []
    if not stsc:
        raise Mp4FormatError("sample table missing stsc")

    # expand the stsc runs into per-chunk sample counts; every `until`
    # is clamped to the stco-derived chunk count so corrupted
    # first_chunk values cannot blow the expansion up (same fuzz class
    # as the stts/ctts run counts)
    per_chunk: list[int] = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        until = stsc[i + 1][0] if i + 1 < len(stsc) else len(chunk_offs) + 1
        until = min(until, len(chunk_offs) + 1)
        if until - first > len(chunk_offs) - len(per_chunk):
            raise Mp4FormatError("stsc chunk map overruns stco")
        per_chunk.extend([spc] * (until - first))
    if len(per_chunk) != len(chunk_offs):
        raise Mp4FormatError("stsc chunk map does not cover stco")
    if sum(per_chunk) != n_samples_sz:
        raise Mp4FormatError(
            f"chunk map holds {sum(per_chunk)} samples, stsz {n_samples_sz}"
        )

    samples = []
    dts = 0
    si = 0
    for chunk_off, n_in_chunk in zip(chunk_offs, per_chunk):
        pos = chunk_off
        for _ in range(n_in_chunk):
            size = sizes[si]
            rec = {
                "index": si,
                "dts": dts,
                "pts": dts + offsets_pts[si],
                "duration": durations[si],
                "keyframe": sync is None or (si + 1) in sync,
                "offset": pos,
                "size": size,
            }
            if with_payload:
                if pos + size > len(data):
                    raise Mp4FormatError(
                        f"sample {si} byte range overruns the file"
                    )
                rec["payload"] = data[pos : pos + size]
            samples.append(rec)
            dts += durations[si]
            pos += size
            si += 1
    return {
        "timescale": timescale,
        "width": width,
        "height": height,
        "codec": codec,
        "samples": samples,
    }


def _expand_runs(
    runs: list[tuple[int, int]], cap: int, typ: bytes
) -> list[int]:
    """Run-length expansion bounded by the independently-derived sample
    count: a corrupted run count must refuse, not materialize."""
    out: list[int] = []
    for n, v in runs:
        if n > cap - len(out):
            raise Mp4FormatError(
                f"{typ.decode()} run count overruns the declared "
                f"{cap} samples"
            )
        out.extend([v] * n)
    return out


def _read_stsz(data: bytes, s: int, e: int) -> tuple[int, list[int]]:
    s, e = _full_payload(data, s, e, b"stsz")
    fixed, count = struct.unpack_from(">II", data, s)
    if fixed:
        # fixed-size form: `count` is a bare u32 a corrupted file can
        # set to 4 billion — bound it by the file itself before
        # materializing (count * fixed bytes must fit in the movie)
        if count * fixed > len(data):
            raise Mp4FormatError(
                f"stsz declares {count} samples of {fixed} bytes — "
                "larger than the movie itself"
            )
        return count, [fixed] * count
    s += 8
    if s + count * 4 > e:
        raise Mp4FormatError("stsz size table truncated")
    return count, [_U32.unpack_from(data, s + 4 * i)[0] for i in range(count)]
