"""The checker-block AC exactness contract behind m_jpeg_ac_stats
(VERDICT r13 ask #5): blocks of the form ``mid + amp * s(x)s(y)`` with
s = (+,-,-,+,+,-,-,+) have a two-coefficient unit-quant spectrum
{DC = 8*(mid-128), AC(4,4) = 8*amp} — integer-exact — so a genuine
baseline JPEG roundtrips them bit-exactly while every block's entropy
stream exercises the full T.81 F.1.2 AC path (two ZRLs, a run-6 AC
code, magnitude/extend, EOB) that the MCU-constant fixtures never
touch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from bristle_spark.multimodal.jpeg import (
    ZIGZAG,
    _fdct_quant_zz,
    decode_jpeg,
    encode_jpeg,
)

S = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
PAT = np.outer(S, S)


def _checker_image(params: list[tuple[int, int]]) -> bytes:
    """16x16 image from four (mid, amp) block params, raster order."""
    img = np.empty((16, 16), dtype=np.uint8)
    for b, (mid, amp) in enumerate(params):
        by, bx = divmod(b, 2)
        img[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (
            mid + amp * PAT
        ).astype(np.uint8)
    return img.tobytes()


def test_checker_spectrum_is_exactly_dc_plus_ac44():
    """The fixture family's whole exactness argument: FDCT of a
    checker block quantizes to DC = 8*(mid-128) and one AC = 8*amp at
    zigzag position 39 (raster (4,4)), all other coefficients zero."""
    assert list(ZIGZAG).index(4 * 8 + 4) == 39
    for mid, amp in [(64, 1), (128, 32), (191, 63), (100, 17)]:
        blk = (mid + amp * PAT).astype(np.uint8).reshape(1, 8, 8)
        zz = _fdct_quant_zz(blk, 1)[0]
        assert zz[0] == 8 * (mid - 128)
        assert zz[39] == 8 * amp
        others = np.delete(zz, [0, 39])
        assert not others.any()


def test_checker_grid_roundtrips_bit_exact():
    """Every in-range (mid, amp) — including the fixture extremes
    mid=64/amp=63 (pixel 1) and mid=191/amp=63 (pixel 254) — decodes
    back to the exact pixels through the real codec."""
    for mid in list(range(64, 192, 9)) + [64, 191]:
        for amp in list(range(1, 64, 6)) + [1, 63]:
            pixels = _checker_image([(mid, amp)] * 4)
            w, h, c, out = decode_jpeg(encode_jpeg(pixels, 16, 16))
            assert (w, h, c) == (16, 16, 1)
            assert out == pixels, (mid, amp)


def test_mixed_blocks_exercise_dc_prediction_with_ac():
    """Distinct per-block (mid, amp): the differential DC chain and the
    per-block AC codes must not interfere."""
    params = [(64, 63), (191, 1), (100, 40), (150, 25)]
    pixels = _checker_image(params)
    w, h, c, out = decode_jpeg(encode_jpeg(pixels, 16, 16))
    assert out == pixels


def test_entropy_stream_is_larger_than_dc_only():
    """Witness that the AC machinery is actually in the stream: the
    checker encode must be strictly longer than the same-mid constant
    encode (two ZRLs + AC code + amplitude bits + EOB per block vs a
    lone EOB)."""
    checker = encode_jpeg(_checker_image([(128, 32)] * 4), 16, 16)
    constant = encode_jpeg(
        np.full((16, 16), 128, dtype=np.uint8).tobytes(), 16, 16
    )
    assert len(checker) > len(constant)


def test_spark_checker_pipeline_end_to_end(spark):
    """attach_jpeg_checker_payload -> checker_block_stats recovers
    exactly the (mid, amp) stats the hex-side oracle derives from
    md5(text || '0')."""
    from bristle_spark import multimodal

    texts = ["alpha", "beta", ""]
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    payloads = multimodal.attach_jpeg_checker_payload(df)
    rows = (
        multimodal.checker_block_stats(payloads)
        .orderBy("doc_id", "block_idx")
        .collect()
    )
    assert len(rows) == 12
    for r in rows:
        hx = hashlib.md5((texts[r.doc_id] + "0").encode()).digest()[:8]
        mid = 64 + hx[2 * r.block_idx] % 128
        amp = 1 + hx[2 * r.block_idx + 1] % 63
        assert (r.px_min, r.px_max) == (mid - amp, mid + amp)
        assert r.px_sum == 64 * mid
        assert (r.amp, r.mid) == (amp, mid)
        assert r.checker_exact == 1


def test_stats_kernel_flags_non_checker_content(spark):
    """checker_exact is a real verdict, not a constant: a payload whose
    decoded blocks are NOT checkers (a constant image is the degenerate
    amp=0 checker; a gradient is not one at all) comes back flagged."""
    from bristle_spark import multimodal  # noqa: F401  (registers types)
    from bristle_spark.multimodal import checker_block_stats
    from pyspark.sql import functions as F  # noqa: F401

    grad = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = encode_jpeg(grad.tobytes(), 16, 16, quant=1)
    pdf = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = checker_block_stats(pdf).orderBy("block_idx").collect()
    assert len(rows) == 4
    assert all(r.checker_exact == 0 for r in rows)
    constant = np.full((16, 16), 77, dtype=np.uint8)
    pdf2 = spark.createDataFrame(
        [(2, bytearray(encode_jpeg(constant.tobytes(), 16, 16)))],
        "doc_id long, payload binary",
    )
    rows2 = checker_block_stats(pdf2).collect()
    assert all(r.checker_exact == 1 and r.amp == 0 for r in rows2)


# ---------------------------------------------------------------------
# Color composition (VERDICT r14 ask #3): checkers in EVERY plane of a
# 4:2:0 interleaved scan — the chroma AC Huffman path, witnessed.


def _planes(yparams, cb, cr):
    y = np.empty((16, 16), dtype=np.uint8)
    for b, (mid, amp) in enumerate(yparams):
        by, bx = divmod(b, 2)
        y[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (mid + amp * PAT).astype(
            np.uint8
        )
    mk = lambda p: (p[0] + p[1] * PAT).astype(np.uint8)  # noqa: E731
    return y, mk(cb), mk(cr)


def test_ycc_checker_grid_roundtrips_bit_exact():
    """Per-plane checkers through the COLOR codec: decoded RGB equals
    ycbcr_to_rgb(planted Y, replicated Cb/Cr) for a grid of plane
    parameters including the extremes — the exactness contract behind
    m_jpeg_chroma_ac."""
    from bristle_spark.multimodal.jpeg import encode_jpeg_ycbcr420, ycbcr_to_rgb

    for mid, amp in [(64, 1), (64, 63), (191, 63), (128, 32), (100, 17)]:
        for cmid, camp in [(64, 63), (191, 1), (128, 40)]:
            y, cb, cr = _planes([(mid, amp)] * 4, (cmid, camp), (cmid, camp))
            w, h, c, out = decode_jpeg(encode_jpeg_ycbcr420(y, cb, cr))
            assert (w, h, c) == (16, 16, 3)
            cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
            cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
            exp = ycbcr_to_rgb(np.stack([y, cbu, cru], axis=-1))
            assert out == exp.tobytes(), (mid, amp, cmid, camp)


def test_ycc_checker_entropy_carries_chroma_ac():
    """The chroma AC machinery must be IN the stream: a chroma-checker
    encode is strictly longer than the same-mid chroma-constant encode
    (the luma planes held identical), so a decoder that silently
    ignored chroma AC codes would desynchronize, not coast."""
    from bristle_spark.multimodal.jpeg import encode_jpeg_ycbcr420

    yp = [(128, 32)] * 4
    y, cb1, cr1 = _planes(yp, (100, 40), (150, 20))
    checker = encode_jpeg_ycbcr420(y, cb1, cr1)
    flat_cb = np.full((8, 8), 100, dtype=np.uint8)
    flat_cr = np.full((8, 8), 150, dtype=np.uint8)
    constant = encode_jpeg_ycbcr420(y, flat_cb, flat_cr)
    assert len(checker) > len(constant)


def test_spark_ycc_pipeline_end_to_end(spark):
    """attach_jpeg_ycc_checker_payload -> rgb_block_stats equals a
    numpy re-derivation of the planted planes for real texts."""
    import hashlib as _hl

    from bristle_spark import multimodal
    from bristle_spark.multimodal.jpeg import ycbcr_to_rgb

    texts = ["alpha", "beta", ""]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    payloads = multimodal.attach_jpeg_ycc_checker_payload(df)
    rows = (
        multimodal.rgb_block_stats(payloads)
        .orderBy("doc_id", "block_idx")
        .collect()
    )
    assert len(rows) == 12
    for r in rows:
        hx = _hl.md5((texts[r.doc_id] + "0").encode()).digest()[:12]
        y, cb, cr = _planes(
            [(64 + hx[2 * b] % 128, 1 + hx[2 * b + 1] % 63) for b in range(4)],
            (64 + hx[8] % 128, 1 + hx[9] % 63),
            (64 + hx[10] % 128, 1 + hx[11] % 63),
        )
        cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
        rgb = ycbcr_to_rgb(np.stack([y, cbu, cru], axis=-1)).astype(np.int64)
        by, bx = divmod(r.block_idx, 2)
        blk = rgb[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
        for ci, ch in enumerate(("r", "g", "b")):
            assert getattr(r, f"{ch}_min") == int(blk[..., ci].min())
            assert getattr(r, f"{ch}_max") == int(blk[..., ci].max())
            assert getattr(r, f"{ch}_sum") == int(blk[..., ci].sum())
