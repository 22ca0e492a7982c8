"""Baseline JPEG (JFIF) decode — stdlib+numpy, public ITU-T.81 spec only.

JPEG is the dominant web image format, so a Common-Crawl-scale multimodal
pipeline hits it immediately; this closes the gap flagged in the r4 review
(PNG/BMP/GIF/WAV were already real, JPEG was absent). Scope:

* **Decoder**: baseline sequential DCT (SOF0) AND progressive DCT
  (SOF2, r6 — a large fraction of real web JPEGs), 8-bit precision,
  grayscale (1 component) and YCbCr (3 components) with arbitrary
  sampling factors h,v ∈ {1,2,4} (4:4:4, 4:2:2, 4:2:0 all resolve),
  multiple DQT/DHT segments, restart markers (DRI/RSTn). Entropy decode
  per T.81 §F.2: canonical Huffman tables from DHT bits/values, DC
  prediction + EXTEND, AC run/size with ZRL and EOB, dezigzag,
  dequantize, float IDCT (orthonormal 8×8 DCT-III via one numpy basis
  matmul per block), level shift, clamp. Progressive decode per Annex G:
  spectral selection (per-scan [Ss, Se] bands), successive approximation
  (DC bit-plane refinement via two's-complement OR; AC sign-magnitude
  first/correction bits), EOB runs, non-interleaved single-component AC
  scans over per-component block grids, restart handling per scan.
  Arithmetic coding and hierarchical (SOF3+) stay out of scope and yield
  None (the unknown-format contract, never an exception).
* **Fixture encoder**: `synth_jpeg_bytes` emits a REAL baseline grayscale
  JFIF whose 8×8 blocks are constant values from a closed-form formula of
  (media_id, block_x, block_y), quantization table all-ones. A constant
  block has only a DC coefficient (AC exactly zero), and integer DC with
  q=1 survives quantization exactly — so encode→decode is BIT-EXACT and a
  SQL oracle can recompute width/height/mean-luma from the formula, the
  same differential-testing trick as the PNG path (`synth_png_bytes`).
  The files use the standard Annex-K luminance Huffman tables, so the
  decoder's table machinery is exercised for real.
  `synth_progressive_jpeg_bytes` (r6) emits the same block-constant
  pattern as a REAL 4-scan SOF2 file (DC first at Al=1 + DC refinement,
  AC band first at Al=1 + AC refinement) — same closed form, so the
  same SQL oracle holds for the progressive path. For coefficients the
  closed form can't cover, `encode_gray_coeffs_baseline` /
  `encode_gray_coeffs_progressive` serialize ONE arbitrary coefficient
  grid both ways; tests pin progressive-decode ≡ baseline-decode on
  random grids — spectral bands, ZRL, EOB runs and correction bits all
  exercised with nonzero AC history.

Luma-only output: `decode_jpeg_gray_pixels` returns the Y plane (no color
convert needed — JPEG stores luma natively), which is exactly what the
thumbnail / pHash / mean-luma consumers in `multimodal.py` want; chroma
blocks are still entropy-decoded to advance the bit stream correctly.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Public-spec constant tables (ITU-T.81 Annex K)
# ---------------------------------------------------------------------------

# zigzag index -> (row, col) raster position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.3.1 — luminance DC: code-length counts (1..16) + symbols
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))

# Annex K.3.3.2 — luminance AC
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """Decoder table pair ``(fast, slow)``: ``fast`` maps an 8-bit lookahead
    straight to ``(symbol, code_length)`` for every code of ≤ 8 bits (one
    list index per symbol instead of a dict probe per bit — codes are short
    in practice, so this is the hot path); ``slow`` is the full
    (length, code) → symbol dict the bit-serial fallback walks for longer
    codes. Construction is memoized on the table bytes: files overwhelmingly
    reuse a handful of tables (the Annex K defaults and per-encoder
    presets), and rebuilding them per payload was ~25% of decode time."""
    return _decode_table_cached(bytes(bits), bytes(vals))


@lru_cache(maxsize=256)
def _decode_table_cached(bits: bytes, vals: bytes):
    slow = {(ln, c): s for s, (c, ln) in _canonical_codes(list(bits), list(vals)).items()}
    fast: list = [None] * 256
    for (ln, c), s in slow.items():
        if ln <= 8:
            base = c << (8 - ln)
            for i in range(1 << (8 - ln)):
                fast[base | i] = (s, ln)
    return fast, slow


_EMPTY_HUFF = ([None] * 256, {})


# Orthonormal 8×8 DCT basis: F = A f Aᵀ (forward), f = Aᵀ F A (inverse)
_A = np.asarray(
    [
        [
            0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


# ---------------------------------------------------------------------------
# Fixture encoder (block-constant grayscale baseline — exact by construction)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th] + bits + vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_block_value(media_id: int, bx: int, by: int) -> int:
    """Closed-form constant value of 8×8 block (bx, by) — the formula the
    SQL oracle replays (cf. MULTIMODAL_ORACLE for the PNG analog).

    The pattern coefficients come from a Knuth multiplicative hash of the
    id, NOT a linear ramp: pHash is invariant to constant luma shifts, so
    two same-size images whose patterns differ by a constant offset hash
    IDENTICALLY — with a linear formula that happens for ids in the same
    residue class and broke the planted-duplicate contract with accidental
    distance-0 pairs. Three independently-mixed coefficients (~2^24
    pattern classes) make accidental collisions negligible at corpus
    scale; the +12345 offset keeps id=0 from mapping to the all-flat
    image (every block grid is ≥2×2, so all three coefficients engage)."""
    m = ((media_id + 12345) * 2654435761) % (1 << 32)
    a, b, c = m % 256, (m >> 8) % 256, (m >> 16) % 256
    return (media_id + a * bx + b * by + c * bx * by) % 256


def synth_jpeg_bytes(media_id: int) -> bytes:
    """A real baseline grayscale JFIF: width = 8*(4 + id%7), height =
    8*(4 + id%4), each 8×8 block constant at `jpeg_block_value`, quant
    table all-ones, Annex-K luminance Huffman tables. Constant blocks have
    AC exactly zero and integer DC survives q=1 quantization exactly, so
    the decode is bit-exact against the formula. The block grid is always
    ≥ 4×4: tiny grids (2×2, 3×3) carry so little spatial information that
    structurally different patterns produce the same 8×8 DCT sign layout
    and hence identical pHashes — measured 0 hash collisions across 5000
    ids at ≥4×4 vs dozens at 2×2 (see `jpeg_block_value` for the pattern
    entropy argument)."""
    bw = 4 + media_id % 7
    bh = 4 + media_id % 4
    w, h = 8 * bw, 8 * bh

    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    eob_code, eob_len = ac_codes[0x00]

    bits = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            c = jpeg_block_value(media_id, bx, by)
            dc = 8 * (c - 128)  # F(0,0) of a constant block, orthonormal DCT
            diff = dc - prev_dc
            prev_dc = dc
            if diff == 0:
                size = 0
            else:
                size = abs(diff).bit_length()
            code, ln = dc_codes[size]
            bits.write(code, ln)
            if size:
                bits.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            bits.write(eob_code, eob_len)  # all AC zero
    scan = bits.flush()

    jfif = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([1, 1, 0x11, 0])  # 1 component, id=1, 1x1 sampling, qtable 0
    )
    dht = _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS) + _dht_segment(
        0x10, AC_LUM_BITS, AC_LUM_VALS
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    return b"\xff\xd8" + jfif + dqt + sof0 + dht + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Coefficient-level grayscale encoders (baseline AND progressive) — the
# differential-fixture machinery: one arbitrary integer coefficient grid
# serialized both ways must decode identically (T.81 Annex F vs Annex G).
# Coefficient grids are (bh, bw, 64) int arrays in ZIGZAG order, q=1.
# ---------------------------------------------------------------------------


def _headers_gray(w: int, h: int, sof_marker: bytes) -> bytes:
    jfif = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = (
        sof_marker
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([1, 1, 0x11, 0])
    )
    dht = _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS) + _dht_segment(
        0x10, AC_LUM_BITS, AC_LUM_VALS
    )
    return b"\xff\xd8" + jfif + dqt + sof + dht


def _sos_header(comps: list[tuple[int, int, int]], ss: int, se: int,
                ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def encode_gray_coeffs_baseline(coeffs) -> bytes:
    """Serialize a (bh, bw, 64) zigzag coefficient grid as a baseline
    (SOF0) grayscale JFIF — general run/size AC coding with ZRL + EOB."""
    import numpy as _np

    blocks = _np.asarray(coeffs, dtype=_np.int64)
    bh, bw, _ = blocks.shape
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bits = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = blocks[by, bx]
            diff = int(blk[0]) - prev_dc
            prev_dc = int(blk[0])
            size = abs(diff).bit_length()
            code, ln = dc_codes[size]
            bits.write(code, ln)
            if size:
                bits.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            last = 0
            for k in range(63, 0, -1):
                if blk[k]:
                    last = k
                    break
            r = 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bits.write(code, ln)
                    r -= 16
                s = abs(v).bit_length()
                code, ln = ac_codes[(r << 4) | s]
                bits.write(code, ln)
                bits.write(v if v > 0 else v + (1 << s) - 1, s)
                r = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                bits.write(code, ln)
    return (
        _headers_gray(bw * 8, bh * 8, b"\xff\xc0")
        + _sos_header([(1, 0, 0)], 0, 63, 0, 0)
        + bits.flush()
        + b"\xff\xd9"
    )


# Progressive AC Huffman table: Annex K's baseline AC table has no EOBn
# symbols above EOB0 (progressive encoders ship custom tables), so the
# fixture encoder defines its own — every symbol a progressive AC scan can
# emit (EOBn r=0..14, ZRL, run/size r=0..15 × s=1..10), all at code length
# 8 (176 codes, Kraft sum 176/256 < 1 — a valid canonical table the
# decoder's generic DHT machinery must digest).
PROG_AC_VALS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]                     # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = [0] * 7 + [len(PROG_AC_VALS)] + [0] * 8


class _EobState:
    """EOB-run accumulator shared by the progressive AC encoders: runs of
    end-of-band blocks collapse into one EOBn symbol; refinement scans
    additionally buffer correction bits to emit after the flush."""

    def __init__(self, bits: "_BitWriter", ac_codes) -> None:
        self.bits = bits
        self.ac = ac_codes
        self.run = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.run:
            r = self.run.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.bits.write(code, ln)
            if r:
                self.bits.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.pending:
            self.bits.write(b, 1)
        self.pending = []

    def add(self, correction_bits: list[int]) -> None:
        self.run += 1
        self.pending.extend(correction_bits)
        if self.run == 32767:
            self.flush()


def _encode_ac_first_block(blk, ss, se, al, eob: _EobState) -> None:
    # iterate only the nonzero band positions (vectorized threshold +
    # nonzero): fixture blocks are sparse, and a 63-step Python loop per
    # block per scan was the encoder's hot spot
    ac, bits = eob.ac, eob.bits
    v = blk[ss : se + 1]
    t = np.abs(v) >> al
    nz = np.nonzero(t)[0]
    if nz.size == 0:
        eob.add([])
        return
    eob.flush()
    prev = -1
    for i in nz.tolist():
        r = i - prev - 1
        prev = i
        while r > 15:
            code, ln = ac[0xF0]
            bits.write(code, ln)
            r -= 16
        tv = int(t[i])
        s = tv.bit_length()
        code, ln = ac[(r << 4) | s]
        bits.write(code, ln)
        sv = tv if v[i] >= 0 else -tv
        bits.write(sv if sv > 0 else sv + (1 << s) - 1, s)
    if prev < se - ss:
        eob.add([])


def _encode_ac_refine_block(blk, ss, se, al, eob: _EobState) -> None:
    """Annex G.1.2.3: newly-nonzero coefficients (|coeff|>>Al == 1) get a
    run/size symbol + sign bit; history coefficients interleave one
    correction bit each; zero runs count only zero-history positions.

    ZRLs must be emitted AT EVERY nonzero coefficient once the zero run
    exceeds 15 (not lazily at the next newly-nonzero one), and only up to
    the last newly-nonzero position — this keeps each buffered correction
    bit positionally inside the decoder's corresponding 16-zero skip
    window; trailing runs past the last new coefficient fold into the EOB
    run instead."""
    # nonzero-only iteration (gaps between consecutive nonzero positions
    # are exactly the zero-history runs the original per-k loop counted)
    ac, bits = eob.ac, eob.bits
    v = blk[ss : se + 1]
    t = np.abs(v) >> al
    nz = np.nonzero(t)[0]
    ones = nz[t[nz] == 1]
    last_new = int(ones[-1]) if ones.size else -1
    r = 0
    br: list[int] = []
    prev = -1
    for i in nz.tolist():
        r += i - prev - 1
        prev = i
        tv = int(t[i])
        while r > 15 and i <= last_new:
            eob.flush()
            code, ln = ac[0xF0]
            bits.write(code, ln)
            r -= 16
            for b in br:
                bits.write(b, 1)
            br = []
        if tv > 1:
            br.append(tv & 1)
            continue
        # newly nonzero at this precision
        eob.flush()
        code, ln = ac[(r << 4) | 1]
        bits.write(code, ln)
        bits.write(1 if v[i] > 0 else 0, 1)
        for b in br:
            bits.write(b, 1)
        br = []
        r = 0
    r += (se - ss) - prev
    if r > 0 or br:
        eob.add(br)


def encode_gray_coeffs_progressive(
    coeffs,
    scans: list[tuple[int, int, int, int]] | None = None,
    *,
    restart_interval: int = 0,
) -> bytes:
    """Serialize a (bh, bw, 64) zigzag coefficient grid as a progressive
    (SOF2) grayscale JFIF. ``scans`` = [(Ss, Se, Ah, Al), ...]; the
    default splits DC and the full AC band each into a first pass at
    Al=1 plus one refinement to Al=0. Every scan must keep standard
    progressive legality (DC before its band's AC, Ah of a refinement ==
    previous Al of the same band). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N blocks WITHIN each scan — DC
    predictors and EOB runs reset at every restart (an EOB run may never
    cross a restart boundary)."""
    import numpy as _np

    blocks = _np.asarray(coeffs, dtype=_np.int64)
    bh, bw, _ = blocks.shape
    if scans is None:
        scans = [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)]
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    out = bytearray(_headers_gray(bw * 8, bh * 8, b"\xff\xc2"))
    # redefine AC table 0 with the EOBn-capable progressive table (a
    # later DHT legally supersedes the Annex-K one from the headers)
    out += _dht_segment(0x10, PROG_AC_BITS, PROG_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(
            ">H", restart_interval
        )
    order = [(by, bx) for by in range(bh) for bx in range(bw)]
    ri = restart_interval or len(order)
    segments = [order[i : i + ri] for i in range(0, len(order), ri)] or [[]]
    for ss, se, ah, al in scans:
        out += _sos_header([(1, 0, 0)], ss, se, ah, al)
        for gi, group in enumerate(segments):
            if gi:
                out += bytes([0xFF, 0xD0 + ((gi - 1) % 8)])
            bits = _BitWriter()
            if ss == 0:  # DC scan (grayscale: always non-interleaved here)
                if ah == 0:
                    prev = 0  # predictor resets at each restart
                    for by, bx in group:
                        t = int(blocks[by, bx, 0]) >> al  # arithmetic shift
                        diff = t - prev
                        prev = t
                        size = abs(diff).bit_length()
                        code, ln = dc_codes[size]
                        bits.write(code, ln)
                        if size:
                            bits.write(
                                diff if diff > 0 else diff + (1 << size) - 1,
                                size,
                            )
                else:
                    for by, bx in group:
                        bits.write((int(blocks[by, bx, 0]) >> al) & 1, 1)
            else:  # AC scan
                eob = _EobState(bits, ac_codes)
                for by, bx in group:
                    if ah == 0:
                        _encode_ac_first_block(blocks[by, bx], ss, se, al, eob)
                    else:
                        _encode_ac_refine_block(blocks[by, bx], ss, se, al, eob)
                eob.flush()
            out += bits.flush()
    return bytes(out) + b"\xff\xd9"


def synth_progressive_jpeg_bytes(media_id: int) -> bytes:
    """The block-constant fixture pattern (`jpeg_block_value`, identical
    dims/formula to `synth_jpeg_bytes`) as a REAL 4-scan progressive
    JFIF: DC first at Al=1, AC 1..63 first at Al=1, DC refinement, AC
    refinement. Constant blocks keep AC exactly zero, so the AC scans
    exercise the EOB-run machinery end to end while the decode stays
    bit-exact against the closed form — the same SQL oracle as the
    baseline fixture applies verbatim."""
    import numpy as _np

    bw = 4 + media_id % 7
    bh = 4 + media_id % 4
    coeffs = _np.zeros((bh, bw, 64), dtype=_np.int64)
    for by in range(bh):
        for bx in range(bw):
            c = jpeg_block_value(media_id, bx, by)
            coeffs[by, bx, 0] = 8 * (c - 128)
    return encode_gray_coeffs_progressive(coeffs)


# ---------------------------------------------------------------------------
# Baseline decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: Optional[int] = None  # marker that ended the segment

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # RST / EOI / next segment
                return False
        else:
            self.pos += 1
        # mask to 64 bits: nbits never exceeds ~24, and an unmasked
        # accumulator grows into a multi-kilobit int whose shifts slow
        # every subsequent read on long entropy segments
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFFFFFFFF
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError("entropy segment exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if not self._fill():
                raise EOFError("entropy segment exhausted")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek8(self) -> int:
        """Next 8 bits without consuming (zero-padded past segment end —
        only malformed streams decode into the padding, and they fail the
        consume-length check)."""
        while self.nbits < 8:
            if not self._fill():
                return (self.acc << (8 - self.nbits)) & 0xFF
        return (self.acc >> (self.nbits - 8)) & 0xFF

    def consume(self, n: int) -> None:
        if n > self.nbits:
            raise EOFError("entropy segment exhausted")
        self.nbits -= n

    def skip_rst(self) -> None:
        """Discard pad bits and consume the RSTn marker at the current
        byte position (pos still points at the FF whether or not a prior
        read already peeked the marker)."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2  # the FF Dn pair


def _read_huff_symbol(br: _BitReader, table) -> int:
    fast, slow = table
    hit = fast[br.peek8()]
    if hit is not None:
        br.consume(hit[1])
        return hit[0]
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = slow.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _decode_block_coeffs(br: _BitReader, dc_tab, ac_tab, out, pred: int) -> int:
    """One 8×8 block's Huffman-coded coefficients into ``out`` (a length-64
    zigzag-order view); returns the new DC predictor. Dequant/dezigzag/IDCT
    are deliberately NOT here — they batch over all blocks at scan end
    (``_blocks_to_plane``), leaving only the irreducibly bit-serial entropy
    decode in the per-block Python loop."""
    size = _read_huff_symbol(br, dc_tab)
    diff = _extend(br.read_bits(size), size) if size else 0
    dc = pred + diff
    out[0] = dc
    k = 1
    while k < 64:
        rs = _read_huff_symbol(br, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        out[k] = _extend(br.read_bits(size), size)
        k += 1
    return dc


def _blocks_to_plane(grid: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag coefficient grid → level-shifted spatial plane:
    dequant, dezigzag and IDCT for ALL blocks in three vectorized ops (the
    bit-serial entropy decode is the unavoidable Python loop; this isn't)."""
    nby, nbx = grid.shape[:2]
    dq = grid.astype(np.float64) * quant  # both in zigzag order
    raster = np.zeros((nby, nbx, 64), dtype=np.float64)
    raster[:, :, ZIGZAG] = dq
    blocks = raster.reshape(nby, nbx, 8, 8)
    spatial = (_A.T @ blocks) @ _A  # broadcast matmul beats einsum at
    # these grid sizes (einsum's subscript machinery dominated small images)
    plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return plane + 128.0


def decode_jpeg_gray_pixels(data: bytes) -> Tuple[int, int, Optional[bytes]]:
    """(width, height, luma plane bytes) of a baseline (SOF0) or
    progressive (SOF2) JPEG; (0, 0, None) for other SOFs / malformed
    input. The Y plane is returned at full image resolution
    (nearest-upsampled if Y itself is subsampled, which is rare); chroma
    components are entropy-decoded but not returned."""
    try:
        return _decode_gray(data)
    except Exception:
        return 0, 0, None


def _decode_gray(data: bytes) -> Tuple[int, int, Optional[bytes]]:
    if data[:2] != b"\xff\xd8":
        return 0, 0, None
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    coeff_store: dict[int, np.ndarray] = {}
    while pos < len(data):
        if data[pos] != 0xFF:
            return 0, 0, None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    q = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                else:
                    q = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.float64
                    )
                    i += 128
                quants[tid] = q
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if seg[0] != 8:
                return 0, 0, None  # only 8-bit precision
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            n_comp = seg[5]
            comps = []
            for c in range(n_comp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return 0, 0, None  # extended/lossless/arithmetic SOFs
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            n_scan = seg[0]
            scan_comps = []
            for c in range(n_scan):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seg_len
            if not progressive:
                return _decode_scan(
                    data, pos, w, h, comps,
                    {cid: (td, ta) for cid, td, ta in scan_comps},
                    quants, dc_tabs, ac_tabs, restart_interval,
                )
            ss, se = seg[1 + 2 * n_scan], seg[2 + 2 * n_scan]
            approx = seg[3 + 2 * n_scan]
            ah, al = approx >> 4, approx & 0x0F
            if not coeff_store:
                coeff_store = _init_coeff_store(w, h, comps)
            pos = _progressive_scan(
                data, pos, w, h, comps, scan_comps, ss, se, ah, al,
                coeff_store, dc_tabs, ac_tabs, restart_interval,
            )
            continue
        pos += 2 + seg_len
    if progressive and coeff_store:
        return _finish_progressive(w, h, comps, coeff_store, quants)
    return 0, 0, None


def _decode_scan(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[dict],
    scan_sel: dict,
    quants: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
) -> Tuple[int, int, Optional[bytes]]:
    if not comps or w == 0 or h == 0:
        return 0, 0, None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coeffs = {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64))
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.skip_rst()
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = scan_sel[c["id"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        preds[c["id"]] = _decode_block_coeffs(
                            br, dc_tabs[td], ac_tabs[ta],
                            coeffs[c["id"]][my * c["v"] + v, mx * c["h"] + hh],
                            preds[c["id"]],
                        )
            mcu += 1
    y_comp = comps[0]  # first component is luma (grayscale: the only one)
    plane = _blocks_to_plane(coeffs[y_comp["id"]], quants[y_comp["tq"]])
    if y_comp["h"] != hmax or y_comp["v"] != vmax:
        plane = plane.repeat(hmax // y_comp["h"], axis=1).repeat(
            vmax // y_comp["v"], axis=0
        )
    luma = np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, luma.tobytes()


# ---------------------------------------------------------------------------
# Progressive (SOF2) scan machinery — ITU-T.81 Annex G.2
# ---------------------------------------------------------------------------


def _grid_dims(w: int, h: int, comps: list[dict]) -> dict[int, tuple]:
    """Per component id: (padded_bx, padded_by, true_bx, true_by) block
    grid dims — padded to whole MCUs (interleaved scans index the padded
    grid), true = ceil(component size / 8) (non-interleaved scans cover
    only real blocks)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        out[c["id"]] = (mcus_x * c["h"], mcus_y * c["v"], -(-cw // 8), -(-ch // 8))
    return out


def _init_coeff_store(w: int, h: int, comps: list[dict]) -> dict[int, np.ndarray]:
    dims = _grid_dims(w, h, comps)
    return {
        cid: np.zeros((by, bx, 64), dtype=np.int64)
        for cid, (bx, by, _, _) in dims.items()
    }


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Skip remaining entropy bytes (stuffing, pad, stray RSTn) up to the
    next real marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _refine_nonzero(br: _BitReader, blk, lo: int, hi: int, p1: int) -> None:
    """Correction bits for already-nonzero coefficients in [lo, hi]."""
    for k in range(lo, hi + 1):
        if blk[k]:
            if br.read_bit() and not (abs(int(blk[k])) & p1):
                blk[k] += p1 if blk[k] > 0 else -p1


def _decode_dc_block_prog(br, blk, dc_tab, pred: int, ah: int, al: int) -> int:
    if ah == 0:  # first pass: diff at Al precision, arithmetic scale-up
        size = _read_huff_symbol(br, dc_tab)
        diff = _extend(br.read_bits(size), size) if size else 0
        pred += diff
        blk[0] = pred << al
        return pred
    if br.read_bit():  # refinement: OR the next lower bit in
        blk[0] = int(blk[0]) | (1 << al)
    return pred


def _decode_ac_first_prog(br, blk, ac_tab, ss, se, al, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff_symbol(br, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1  # EOBn: current block consumed here
            if run:
                eobrun += br.read_bits(run)
            return eobrun
        k += run
        if k > se:
            raise ValueError("AC run overflow (progressive)")
        blk[k] = _extend(br.read_bits(size), size) * (1 << al)
        k += 1
    return 0


def _decode_ac_refine_prog(br, blk, ac_tab, ss, se, al, eobrun: int) -> int:
    p1 = 1 << al
    if eobrun > 0:
        _refine_nonzero(br, blk, ss, se, p1)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff_symbol(br, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        newval = 0
        if size == 0:
            if run != 15:  # EOBn: refine the rest of the band, then run
                eobrun = (1 << run) - 1
                if run:
                    eobrun += br.read_bits(run)
                _refine_nonzero(br, blk, k, se, p1)
                return eobrun
            # ZRL: skip 16 zero-history positions (refining along the way)
        else:
            if size != 1:
                raise ValueError("refinement size must be 1")
            newval = p1 if br.read_bit() else -p1
        while k <= se:
            if blk[k]:
                if br.read_bit() and not (abs(int(blk[k])) & p1):
                    blk[k] += p1 if blk[k] > 0 else -p1
            else:
                run -= 1
                if run < 0:
                    break
            k += 1
        if newval and k <= se:
            blk[k] = newval
        k += 1
    return 0


def _progressive_scan(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[dict],
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    coeff_store: dict[int, np.ndarray],
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
) -> int:
    """Process one progressive scan's entropy data; returns the position
    of the next marker. DC scans may interleave components over the
    MCU-padded grids; AC scans are single-component over the component's
    true block grid (T.81 G.1.1.1)."""
    # scan-header legality (G.1.1.1.1): a baseline-shaped scan (Ss=0,
    # Se=63) inside an SOF2 file is malformed, not decodable-as-baseline
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and (len(scan_comps) != 1 or ss > se or se > 63):
        raise ValueError("invalid progressive AC scan header")
    if ah and al != ah - 1:
        raise ValueError("successive approximation must refine one bit")
    dims = _grid_dims(w, h, comps)
    br = _BitReader(data, pos)
    eobrun = 0
    preds = {cid: 0 for cid, _, _ in scan_comps}
    by_id = {c["id"]: c for c in comps}

    if ss == 0 and len(scan_comps) > 1:  # interleaved DC scan
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br.skip_rst()
                    preds = {cid: 0 for cid, _, _ in scan_comps}
                for cid, td, _ta in scan_comps:
                    c = by_id[cid]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = coeff_store[cid][my * c["v"] + v, mx * c["h"] + hh]
                            preds[cid] = _decode_dc_block_prog(
                                br, blk, dc_tabs.get(td, _EMPTY_HUFF), preds[cid], ah, al
                            )
                mcu += 1
        return _next_marker_pos(data, br.pos)

    # non-interleaved scan: one component, MCU = one block over true dims
    cid, td, ta = scan_comps[0]
    _, _, tbx, tby = dims[cid]
    n = 0
    for by in range(tby):
        for bx in range(tbx):
            if restart_interval and n and n % restart_interval == 0:
                br.skip_rst()
                preds[cid] = 0
                eobrun = 0
            blk = coeff_store[cid][by, bx]
            if ss == 0:
                preds[cid] = _decode_dc_block_prog(
                    br, blk, dc_tabs.get(td, _EMPTY_HUFF), preds[cid], ah, al
                )
            elif ah == 0:
                eobrun = _decode_ac_first_prog(
                    br, blk, ac_tabs[ta], ss, se, al, eobrun
                )
            else:
                eobrun = _decode_ac_refine_prog(
                    br, blk, ac_tabs[ta], ss, se, al, eobrun
                )
            n += 1
    return _next_marker_pos(data, br.pos)


def _finish_progressive(
    w: int,
    h: int,
    comps: list[dict],
    coeff_store: dict[int, np.ndarray],
    quants: dict,
) -> Tuple[int, int, Optional[bytes]]:
    """Dequantize + IDCT the accumulated luma coefficients (chroma blocks
    advanced the bit stream scan-by-scan but, as in the baseline path,
    only the Y plane is returned)."""
    y_comp = comps[0]
    plane = _blocks_to_plane(coeff_store[y_comp["id"]], quants[y_comp["tq"]])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if y_comp["h"] != hmax or y_comp["v"] != vmax:
        plane = plane.repeat(hmax // y_comp["h"], axis=1).repeat(
            vmax // y_comp["v"], axis=0
        )
    luma = np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, luma.tobytes()


def decode_jpeg(data: bytes) -> Tuple[Optional[int], Optional[int], Optional[float]]:
    """(width, height, mean luma in [0,1]) — the `decode_image` contract."""
    w, h, gray = decode_jpeg_gray_pixels(data)
    if gray is None:
        return None, None, None
    arr = np.frombuffer(gray, dtype=np.uint8)
    return w, h, float(arr.mean() / 255.0)
