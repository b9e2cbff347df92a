"""Pure-stdlib baseline JPEG codec (ITU-T T.81, sequential DCT).

The ML-preprocessing reality is JPEG, not PNG (VERDICT r11 ask #4), so
the real-codec family gains a third stdlib member after WAV and PNG:
marker parsing, Annex-K Huffman entropy coding (with 0xFF00 byte
stuffing), zigzag run-length AC coding, differential DC prediction,
dequantization, and the 8x8 inverse DCT — everything a genuine .jpg
payload needs, with no dependency beyond numpy. Format details follow
the PUBLIC ITU-T T.81 specification (the Annex K "typical" luminance
Huffman tables are part of that spec).

Scope: baseline sequential (SOF0), 8-bit precision, one component
(greyscale) or three components (YCbCr) with 4:4:4 or 4:2:0 chroma
subsampling — the ML-curation reality is 3-component 4:2:0 (VERDICT
r12 ask #5). Progressive (SOF2), arithmetic coding, restart
intervals, other sampling-factor combinations, and 12-bit precision
raise ValueError (a payload error, never a silent misread) — the
WAV/PNG rejection policy.

Color math is INTEGER fixed-point (the libjpeg discipline, constants
FIX(x) = round(x * 65536) from the public ITU-T T.871 / BT.601
coefficients), with every numerator pre-biased positive so plain
integer division is floor division on any engine — this is what lets
DuckDB replay the full RGB->YCbCr->RGB chain exactly (see
rgb_to_ycbcr / ycbcr_to_rgb).

Exactness contract the graded keys build on: baseline JPEG is lossy in
general, but an image whose 8x8 blocks are each CONSTANT roundtrips
BYTE-EXACTLY under a unit quantization table — such a block's FDCT is
a single integer DC coefficient (8 * (v - 128), every AC is exactly 0)
and the IDCT of a DC-only block is exactly constant, so float64
introduces error only below the rounding threshold. attach_jpeg_payload
exploits this so DuckDB can re-derive the decoded pixels hex-side.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag scan order (T.81 Figure 5): zigzag index -> raster index ---
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# --- Annex K "typical" luminance Huffman tables (public spec text) ---
# BITS: number of codes of each length 1..16; HUFFVAL: values in
# canonical code order.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_HUFFVAL = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_HUFFVAL = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# --- Annex K "typical" chrominance Huffman tables (Tables K.4 / K.6,
# public spec text) ---
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_HUFFVAL = list(range(12))

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_HUFFVAL = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# --- integer fixed-point YCbCr (ITU-T T.871 / BT.601 coefficients,
# FIX(x) = round(x * 2^16); the libjpeg jccolor/jdcolor discipline).
# Every numerator below is PRE-BIASED positive (the bias is a multiple
# of 2^16, subtracted back after the division), so `// 65536` is the
# same floor division in numpy int64, DuckDB BIGINT `//`, and Spark
# `DIV` — no negative-division semantics can diverge across engines.

# the FIX(x)*2^16 coefficient set, exported so oracles splice THESE
# values (one source — a retune here must flow into every hex-side
# replay, review r13): forward (Y, Cb, Cr row weights + bias) and
# inverse (per-channel chroma weights + positivity bias + bias/65536)
YCC_FWD_Y = (19595, 38470, 7471, 32768)
YCC_FWD_CB = (-11059, -21709, 32768, 8421376)
YCC_FWD_CR = (32768, -27439, -5329, 8421376)
YCC_INV_R = (91881, 16777216, 256)          # R = Y + (wr*cr + 32768 + bias)//65536 - bias//65536
YCC_INV_G = (22554, 46802, 33554432, 512)   # G = Y - ((wcb*cb + wcr*cr + 32768 + bias)//65536 - bias//65536)
YCC_INV_B = (116130, 33554432, 512)         # B = Y + (wb*cb + 32768 + bias)//65536 - bias//65536


def rgb_to_ycbcr(rgb: "np.ndarray") -> "np.ndarray":
    """(..., 3) uint8 RGB -> (..., 3) uint8 YCbCr (full-range JFIF).
    Y  = 0.299 R + 0.587 G + 0.114 B
    Cb = 128 - 0.168736 R - 0.331264 G + 0.5 B    (clipped to 255:
    Cr = 128 + 0.5 R - 0.418688 G - 0.081312 B     pure blue/red hit 256)
    """
    v = rgb.astype(np.int64)
    r, g, b = v[..., 0], v[..., 1], v[..., 2]
    wy, wcb, wcr = YCC_FWD_Y, YCC_FWD_CB, YCC_FWD_CR
    y = (wy[0] * r + wy[1] * g + wy[2] * b + wy[3]) // 65536
    cb = (wcb[0] * r + wcb[1] * g + wcb[2] * b + wcb[3]) // 65536
    cr = (wcr[0] * r + wcr[1] * g + wcr[2] * b + wcr[3]) // 65536
    out = np.stack(
        [y, np.minimum(cb, 255), np.minimum(cr, 255)], axis=-1
    )
    return out.astype(np.uint8)


def ycbcr_to_rgb(ycc: "np.ndarray") -> "np.ndarray":
    """(..., 3) uint8 YCbCr -> (..., 3) uint8 RGB (full-range JFIF).
    R = Y + 1.402 (Cr-128);  G = Y - 0.344136 (Cb-128) - 0.714136
    (Cr-128);  B = Y + 1.772 (Cb-128); each clipped to [0, 255]."""
    v = ycc.astype(np.int64)
    y, cb, cr = v[..., 0], v[..., 1] - 128, v[..., 2] - 128
    ir, ig, ib = YCC_INV_R, YCC_INV_G, YCC_INV_B
    r = y + (ir[0] * cr + 32768 + ir[1]) // 65536 - ir[2]
    g = y - ((ig[0] * cb + ig[1] * cr + 32768 + ig[2]) // 65536 - ig[3])
    b = y + (ib[0] * cb + 32768 + ib[1]) // 65536 - ib[2]
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment (T.81 Annex C).
    Rejects oversubscribed tables (more codes than the code space
    holds — Kraft violation): a corrupt DHT must be a ValueError, not
    an IndexError downstream in the LUT build."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("oversubscribed Huffman table")
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _lut16(bits: list[int], huffval: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-lookahead Huffman tables: index the next 16 bits, read
    (value, code length) in O(1) — the classic table-driven decoder
    (every code is <= 16 bits, T.81 Annex C). Plain Python lists: a
    65536-slot list indexes ~10x faster than a per-bit dict walk.
    Length 0 marks an invalid prefix."""
    val = [0] * 65536
    ln = [0] * 65536
    for value, (code, length) in _canonical_codes(bits, huffval).items():
        prefix = code << (16 - length)
        for idx in range(prefix, prefix + (1 << (16 - length))):
            val[idx] = value
            ln[idx] = length
    return val, ln


# orthonormal 8x8 DCT-II matrix: F = A f A^T, f = A^T F A (T.81 A.3.3
# up to the standard factoring)
def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
        for x in range(8):
            a[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (spec convention)
        return bytes(self.out)


# the encoder always emits the Annex-K tables — build their code maps once
_ENC_DC_CODES = _canonical_codes(DC_BITS, DC_HUFFVAL)
_ENC_AC_CODES = _canonical_codes(AC_BITS, AC_HUFFVAL)
_ENC_DC_CHROMA_CODES = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_HUFFVAL)
_ENC_AC_CHROMA_CODES = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_HUFFVAL)


def _encode_block(
    bw: "_BitWriter",
    row: list[int],
    dc_diff: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """Entropy-code one zigzagged 8x8 block (T.81 F.1.2): differential
    DC magnitude, then run-length AC with ZRL/EOB."""
    s, amp = _magnitude(dc_diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    bw.write(amp, s)
    run = 0
    nz = [k for k in range(1, 64) if row[k]]
    last_nonzero = nz[-1] if nz else 0
    for k in range(1, last_nonzero + 1):
        v = row[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s, amp = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(amp, s)
        run = 0
    if last_nonzero < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) for a coefficient (T.81 F.1.2.1):
    negative values encode as v - 1 in `size` low bits."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v - 1) & ((1 << s) - 1)


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    *,
    quant: int = 1,
) -> bytes:
    """Encode raw 8-bit greyscale pixels as a baseline sequential JPEG
    (SOF0, Annex-K luminance Huffman tables, flat quantization table of
    ``quant``). ``quant=1`` preserves DC-only blocks exactly — the
    hex-oracle contract; larger values model real lossy encodes for
    tests. Dimensions must be multiples of 8 (no edge-block padding in
    this subset)."""
    if width % 8 or height % 8 or width == 0 or height == 0:
        raise ValueError(f"dimensions {width}x{height} not multiples of 8")
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; {width * height} expected"
        )
    if not 1 <= quant <= 255:
        raise ValueError(f"quant {quant} outside [1, 255]")
    qtab = np.full(64, quant, dtype=np.int32)

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    dc_codes = _ENC_DC_CODES
    ac_codes = _ENC_AC_CODES
    bw = _BitWriter()
    # FDCT every block at once (matmul broadcasts over the block axis);
    # only the entropy coding below is per-block Python
    n_by, n_bx = height // 8, width // 8
    blocks = (
        img.reshape(n_by, 8, n_bx, 8)
        .transpose(0, 2, 1, 3)
        .reshape(n_by * n_bx, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = _A @ blocks @ _A.T
    zzs = np.round(coeffs.reshape(-1, 64) / float(quant)).astype(np.int64)[:, ZIGZAG]
    dcs = zzs[:, 0]
    diffs = np.diff(dcs, prepend=0)
    for b in range(len(zzs)):
        _encode_block(bw, zzs[b].tolist(), int(diffs[b]), dc_codes, ac_codes)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0x00]) + bytes(int(qtab[i]) for i in range(64)))
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_HUFFVAL)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_HUFFVAL),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8"  # SOI
        + dqt
        + sof0
        + dht
        + sos
        + entropy
        + b"\xff\xd9"  # EOI
    )


def _fdct_quant_zz(plane: "np.ndarray", quant: int) -> "np.ndarray":
    """(n, 8, 8) uint8 blocks -> (n, 64) int64 quantized zigzag
    coefficients (batched orthonormal FDCT, level shift, flat quant)."""
    coeffs = _A @ (plane.astype(np.float64) - 128.0) @ _A.T
    return np.round(coeffs.reshape(-1, 64) / float(quant)).astype(np.int64)[:, ZIGZAG]


def _blocks_of(plane: "np.ndarray") -> "np.ndarray":
    """(H, W) -> (H//8 * W//8, 8, 8) raster-ordered 8x8 blocks."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg_color(
    pixels: bytes,
    width: int,
    height: int,
    *,
    quant: int = 1,
    subsampling: str = "420",
) -> bytes:
    """Encode raw 8-bit interleaved RGB pixels as a baseline sequential
    COLOR JPEG (SOF0, 3-component YCbCr interleaved scan): Annex-K
    luminance tables for Y, Annex-K chrominance tables for Cb/Cr, flat
    quantization tables (id 0 luma, id 1 chroma, both ``quant``).

    ``subsampling='420'`` is the ML-curation reality — 16x16 MCUs of
    four Y blocks + one Cb + one Cr, chroma reduced by exact 2x2 mean
    ((sum + 2) // 4); dimensions must be multiples of 16.
    ``subsampling='444'`` keeps full chroma (8x8 MCUs, one block per
    component); dimensions must be multiples of 8.

    ``quant=1`` preserves MCU-constant images exactly: constant blocks
    are DC-only in every plane, the 2x2 chroma mean of a constant is
    that constant, so decode returns bit-identical YCbCr and the
    integer fixed-point color chain (rgb_to_ycbcr / ycbcr_to_rgb) is
    replayable hex-side — the greyscale exactness contract, extended
    to three components."""
    if subsampling not in ("420", "444"):
        raise ValueError(f"subsampling {subsampling!r} not in ('420', '444')")
    mcu = 16 if subsampling == "420" else 8
    if width % mcu or height % mcu or width == 0 or height == 0:
        raise ValueError(
            f"dimensions {width}x{height} not multiples of {mcu} "
            f"(required for {subsampling} MCUs)"
        )
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; {width * height * 3} expected"
        )
    if not 1 <= quant <= 255:
        raise ValueError(f"quant {quant} outside [1, 255]")

    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb)
    y_plane = ycc[..., 0]
    if subsampling == "420":
        c = ycc.astype(np.int64)
        # exact 2x2 mean, round-half-up — integer, engine-replayable
        sub = (
            c[0::2, 0::2, 1:] + c[0::2, 1::2, 1:] + c[1::2, 0::2, 1:] + c[1::2, 1::2, 1:] + 2
        ) // 4
        cb_plane = sub[..., 0].astype(np.uint8)
        cr_plane = sub[..., 1].astype(np.uint8)
    else:
        cb_plane = ycc[..., 1]
        cr_plane = ycc[..., 2]
    return _assemble_color_jpeg(
        y_plane, cb_plane, cr_plane, width, height, quant, subsampling
    )


def encode_jpeg_ycbcr420(
    y_plane: "np.ndarray",
    cb_plane: "np.ndarray",
    cr_plane: "np.ndarray",
    *,
    quant: int = 1,
) -> bytes:
    """Encode pre-built YCbCr planes as a baseline 4:2:0 color JPEG —
    the raw-plane entry point (the shape of libjpeg's
    ``jpeg_write_raw_data``): Y is (H, W) uint8, Cb/Cr are the already-
    subsampled (H/2, W/2) uint8 planes, H and W multiples of 16.

    Exists so fixtures can plant exact per-PLANE spectra: driving the
    encoder through RGB couples the channels via the rounded color
    transform, so a chroma-domain checker is unreachable from RGB
    space, while here each plane's 8x8 blocks are encoded exactly as
    given (unit quant) and the decode side replays
    ``ycbcr_to_rgb(Y, upsample(Cb), upsample(Cr))`` hex-exactly."""
    y_plane = np.ascontiguousarray(y_plane, dtype=np.uint8)
    cb_plane = np.ascontiguousarray(cb_plane, dtype=np.uint8)
    cr_plane = np.ascontiguousarray(cr_plane, dtype=np.uint8)
    height, width = y_plane.shape
    if width % 16 or height % 16 or width == 0 or height == 0:
        raise ValueError(
            f"dimensions {width}x{height} not multiples of 16 (4:2:0 MCUs)"
        )
    if cb_plane.shape != (height // 2, width // 2) or cr_plane.shape != (
        height // 2,
        width // 2,
    ):
        raise ValueError("chroma planes must be (H/2, W/2)")
    if not 1 <= quant <= 255:
        raise ValueError(f"quant {quant} outside [1, 255]")
    return _assemble_color_jpeg(
        y_plane, cb_plane, cr_plane, width, height, quant, "420"
    )


def _assemble_color_jpeg(
    y_plane: "np.ndarray",
    cb_plane: "np.ndarray",
    cr_plane: "np.ndarray",
    width: int,
    height: int,
    quant: int,
    subsampling: str,
) -> bytes:
    """Shared tail of the two color entry points: per-plane FDCT +
    quantization, interleaved-MCU entropy coding with per-component
    predictors and the Annex-K luma/chroma tables, segment assembly."""
    mcu = 16 if subsampling == "420" else 8
    y_samp, c_samp = (0x22, 0x11) if subsampling == "420" else (0x11, 0x11)
    y_zz = _fdct_quant_zz(_blocks_of(y_plane), quant)
    cb_zz = _fdct_quant_zz(_blocks_of(cb_plane), quant)
    cr_zz = _fdct_quant_zz(_blocks_of(cr_plane), quant)

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_my, n_mx = height // mcu, width // mcu
    y_bx = width // 8  # Y block-grid width
    for my in range(n_my):
        for mx in range(n_mx):
            if subsampling == "420":
                y_idx = [
                    (2 * my + i) * y_bx + (2 * mx + j)
                    for i in range(2)
                    for j in range(2)
                ]
            else:
                y_idx = [my * y_bx + mx]
            for bi in y_idx:
                row = y_zz[bi]
                _encode_block(
                    bw, row.tolist(), int(row[0]) - pred[0], _ENC_DC_CODES, _ENC_AC_CODES
                )
                pred[0] = int(row[0])
            ci = my * n_mx + mx
            for comp, zz in ((1, cb_zz), (2, cr_zz)):
                row = zz[ci]
                _encode_block(
                    bw,
                    row.tolist(),
                    int(row[0]) - pred[comp],
                    _ENC_DC_CHROMA_CODES,
                    _ENC_AC_CHROMA_CODES,
                )
                pred[comp] = int(row[0])
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qbytes = bytes([quant]) * 64
    dqt = seg(0xFFDB, bytes([0x00]) + qbytes + bytes([0x01]) + qbytes)
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, y_samp, 0, 2, c_samp, 1, 3, c_samp, 1]),
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_HUFFVAL)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_HUFFVAL)
        + bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_HUFFVAL)
        + bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_HUFFVAL),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof0 + dht + sos + entropy + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; any other
    marker inside the scan is a payload error (no restart intervals in
    this subset)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream ran past end of data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated stuffed byte")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(
                    f"marker 0xff{nxt:02x} inside entropy data "
                    f"(restart intervals unsupported)"
                )
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(reader: _BitReader, s: int) -> int:
    """Read an s-bit amplitude and sign-extend (T.81 F.2.2.1)."""
    if s == 0:
        return 0
    v = reader.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v




def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``
    — raw 8-bit row-major samples. channels is 1 for greyscale, 3
    (interleaved RGB, converted from YCbCr via the integer fixed-point
    chain) for 3-component images in 4:4:4 or 4:2:0. Raises ValueError
    on anything outside the supported subset (progressive, arithmetic
    coding, restart intervals, 12-bit precision, other sampling-factor
    combinations) so a payload the codec cannot faithfully decode is an
    error, never a misread."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, tuple[tuple[int, ...], tuple[int, ...]]] = {}
    ac_tables: dict[int, tuple[tuple[int, ...], tuple[int, ...]]] = {}
    width = height = -1
    ncomp = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, qtab id)
    scan_dc: list[int] = []
    scan_ac: list[int] = []
    sos_pos = -1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:  # EOI before SOS: no image
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated segment body")
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int32)
                if qtables[tq].size != 64:
                    raise ValueError("truncated quantization table")
                b += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                if len(bits) != 16:
                    raise ValueError("truncated Huffman table header")
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                if len(huffval) != n:
                    raise ValueError("truncated Huffman table")
                (dc_tables if tc == 0 else ac_tables)[th] = (
                    tuple(bits),
                    tuple(huffval),
                )
                b += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"{ncomp}-component JPEG unsupported (greyscale or YCbCr)"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component list")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampling >> 4, sampling & 0x0F, tq))
            samp = tuple((h, v) for _, h, v, _ in comps)
            if ncomp == 1:
                if samp != ((1, 1),):
                    raise ValueError("subsampling unsupported for 1 component")
            elif samp not in (((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))):
                raise ValueError(
                    f"sampling factors {samp} unsupported (4:4:4 or 4:2:0 only)"
                )
            if width == 0 or height == 0:
                raise ValueError("zero image dimension")
            mcu_w, mcu_h = 8 * comps[0][1], 8 * comps[0][2]
            if width % mcu_w or height % mcu_h:
                raise ValueError(
                    f"dimensions {width}x{height} not multiples of "
                    f"{mcu_w}x{mcu_h} (edge-padded images outside this subset)"
                )
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError(
                f"SOF marker 0x{marker:04x} unsupported (baseline SOF0 only)"
            )
        elif marker == 0xFFDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF0")
            if len(body) < 1 + 2 * ncomp + 3:
                raise ValueError("truncated SOS header")
            ns = body[0]
            if ns != ncomp:
                raise ValueError(
                    f"{ns}-component scan over {ncomp}-component frame "
                    f"unsupported (one interleaved scan only)"
                )
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                if cs != comps[c][0]:
                    raise ValueError(
                        "scan component order must match the frame header"
                    )
                scan_dc.append(tt >> 4)
                scan_ac.append(tt & 0x0F)
            sos_pos = pos + 2 + length
            break
        # APPn / COM: skipped
        pos += 2 + length
    if width < 0:
        raise ValueError("missing SOF0")
    if sos_pos < 0:
        raise ValueError("missing SOS")
    comp_q: list[np.ndarray] = []
    comp_luts: list[tuple[list[int], list[int], list[int], list[int]]] = []
    for c in range(ncomp):
        tq = comps[c][3]
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        if scan_dc[c] not in dc_tables or scan_ac[c] not in ac_tables:
            raise ValueError("missing Huffman table referenced by scan")
        comp_q.append(qtables[tq])
        dc_val, dc_ln = _cached_lut16(dc_tables[scan_dc[c]])
        ac_val, ac_ln = _cached_lut16(ac_tables[scan_ac[c]])
        comp_luts.append((dc_val, dc_ln, ac_val, ac_ln))

    # unstuff the whole entropy segment once (numpy): drop the 0x00
    # after each 0xFF data byte, cut at the first real marker — the bit
    # loop below then never branches on stuffing
    arr = np.frombuffer(data, dtype=np.uint8)[sos_pos:]
    ff = np.flatnonzero(arr == 0xFF)
    end = len(arr)
    if ff.size:
        follow = np.where(
            ff + 1 < len(arr), arr[np.minimum(ff + 1, len(arr) - 1)], 1
        )
        markers = ff[follow != 0]
        if markers.size:
            end = int(markers[0])
    keep = np.ones(end, dtype=bool)
    stuffed = ff[ff + 1 < end]
    stuffed = stuffed[arr[stuffed + 1] == 0]
    keep[stuffed + 1] = False
    buf = arr[:end][keep].tolist()
    buf_len = len(buf)

    # per-component block grids; MCU geometry from the max sampling
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    n_mx, n_my = width // (8 * hmax), height // (8 * vmax)
    grid: list[tuple[int, int]] = []  # (block-grid width, height) per comp
    for _, h, v, _ in comps:
        grid.append((n_mx * h, n_my * v))
    blocks_per_mcu = sum(h * v for _, h, v, _ in comps)
    n_mcus = n_my * n_mx
    # bound the coefficient allocation by what the entropy segment can
    # possibly code BEFORE allocating (the PNG codec's inflate-bomb
    # guard, twinned): every block costs at least 2 bits (1-bit DC
    # symbol + 1-bit EOB under the most degenerate legal tables), so a
    # tiny payload declaring a huge SOF0 is rejected, not materialized
    if n_mcus * blocks_per_mcu * 2 > buf_len * 8 + 16:
        raise ValueError(
            "entropy segment too small for the declared dimensions"
        )
    comp_zzs = [
        np.zeros((gw * gh, 64), dtype=np.int64) for gw, gh in grid
    ]
    # flatten the MCU traversal into one block schedule per MCU:
    # (component, sub-row, sub-col) in T.81 interleave order
    mcu_order = [
        (c, i, j)
        for c in range(ncomp)
        for i in range(comps[c][2])
        for j in range(comps[c][1])
    ]
    prev_dc = [0] * ncomp
    acc = 0
    nbits = 0
    bi = 0
    overrun = ValueError("entropy stream ran past end of data")
    for m in range(n_mcus):
        my, mx = divmod(m, n_mx)
        for c, i, j in mcu_order:
            dc_val, dc_ln, ac_val, ac_ln = comp_luts[c]
            gw = grid[c][0]
            row = comp_zzs[c][(comps[c][2] * my + i) * gw + (comps[c][1] * mx + j)]
            # --- DC symbol ---
            while nbits < 16:  # peek16 (virtual zero-pad near stream end)
                acc = (acc << 8) | (buf[bi] if bi < buf_len else 0)
                bi += 1
                nbits += 8
            idx = (acc >> (nbits - 16)) & 0xFFFF
            s = dc_val[idx]
            length = dc_ln[idx]
            if length == 0:
                raise ValueError("invalid Huffman code in entropy stream")
            if s > 11:
                raise ValueError(f"DC size category {s} out of range")
            nbits -= length
            if s:
                while nbits < s:
                    acc = (acc << 8) | (buf[bi] if bi < buf_len else 0)
                    bi += 1
                    nbits += 8
                nbits -= s
                v = (acc >> nbits) & ((1 << s) - 1)
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                prev_dc[c] += v
            if bi * 8 - nbits > buf_len * 8:
                raise overrun
            row[0] = prev_dc[c]
            acc &= (1 << nbits) - 1
            # --- AC symbols ---
            k = 1
            while k < 64:
                while nbits < 16:
                    acc = (acc << 8) | (buf[bi] if bi < buf_len else 0)
                    bi += 1
                    nbits += 8
                idx = (acc >> (nbits - 16)) & 0xFFFF
                rs = ac_val[idx]
                length = ac_ln[idx]
                if length == 0:
                    raise ValueError("invalid Huffman code in entropy stream")
                nbits -= length
                run = rs >> 4
                size = rs & 0x0F
                if size == 0:
                    if bi * 8 - nbits > buf_len * 8:
                        raise overrun
                    if run == 15:  # ZRL
                        k += 16
                        if k > 64:
                            raise ValueError("AC run overflows the block")
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overflows the block")
                while nbits < size:
                    acc = (acc << 8) | (buf[bi] if bi < buf_len else 0)
                    bi += 1
                    nbits += 8
                nbits -= size
                v = (acc >> nbits) & ((1 << size) - 1)
                if v < (1 << (size - 1)):
                    v -= (1 << size) - 1
                if bi * 8 - nbits > buf_len * 8:
                    raise overrun
                row[k] = v
                k += 1
            acc &= (1 << nbits) - 1

    # dequantize + dezigzag + IDCT every block at once per component
    # (matmul broadcasts over the block axis), then scatter each 8x8
    # grid back into raster order with one transpose
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    planes: list[np.ndarray] = []
    for c in range(ncomp):
        gw, gh = grid[c]
        coeffs = (comp_zzs[c] * comp_q[c][None, :])[:, inv_zz].astype(
            np.float64
        ).reshape(gw * gh, 8, 8)
        blocks = _A.T @ coeffs @ _A + 128.0
        pix = np.clip(np.round(blocks), 0, 255).astype(np.uint8)
        planes.append(
            pix.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
    # trailing EOI is advisory here: the MCU count fully determines the
    # scan, matching decoders that tolerate truncated tails
    if ncomp == 1:
        return width, height, 1, planes[0].tobytes()
    # upsample chroma by sample replication to the luma grid, then the
    # integer fixed-point YCbCr -> RGB chain
    full = []
    for c in range(3):
        p = planes[c]
        ry, rx = height // p.shape[0], width // p.shape[1]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p)
    rgb = ycbcr_to_rgb(np.stack(full, axis=-1))
    return width, height, 3, rgb.tobytes()


_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], tuple[list[int], list[int]]] = {}


def _cached_lut16(table: tuple[tuple[int, ...], tuple[int, ...]]):
    """Build (or reuse) the 65536-slot lookahead tables for a DHT table.
    Spec-standard corpora reuse the Annex-K tables, but optimized
    baseline JPEGs (mozjpeg, jpegtran -optimize) carry per-image custom
    tables — on a long-lived executor the cache must stay bounded, so
    it resets past a small working set instead of growing one ~1 MB
    entry per distinct image."""
    lut = _LUT_CACHE.get(table)
    if lut is None:
        bits, huffval = table
        lut = _lut16(list(bits), list(huffval))
        if len(_LUT_CACHE) >= 16:
            _LUT_CACHE.clear()
        _LUT_CACHE[table] = lut
    return lut
