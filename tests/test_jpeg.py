"""Baseline JPEG decoder: bit-exact round-trip against the block-constant
fixture encoder, color 4:2:0 assembly, restart markers, non-baseline
rejection, and the Spark-side decode/thumbnail/pHash pipelines."""

import struct

import numpy as np
import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    _BitWriter,
    _canonical_codes,
    _dht_segment,
    decode_jpeg,
    decode_jpeg_gray_pixels,
    jpeg_block_value,
    synth_jpeg_bytes,
)

DC_CODES = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
AC_CODES = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)


def _write_dc_block(bits: _BitWriter, value: int, prev_dc: int) -> int:
    """Encode one constant block (DC-only + EOB) into the bit stream."""
    dc = 8 * (value - 128)
    diff = dc - prev_dc
    size = abs(diff).bit_length() if diff else 0
    code, ln = DC_CODES[size]
    bits.write(code, ln)
    if size:
        bits.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    eob, eob_len = AC_CODES[0x00]
    bits.write(eob, eob_len)
    return dc


def test_grayscale_bitexact_roundtrip():
    for mid in range(0, 100, 7):
        data = synth_jpeg_bytes(mid)
        bw, bh = 4 + mid % 7, 4 + mid % 4
        w, h, gray = decode_jpeg_gray_pixels(data)
        assert (w, h) == (8 * bw, 8 * bh)
        arr = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
        for by in range(bh):
            for bx in range(bw):
                blk = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (blk == jpeg_block_value(mid, bx, by)).all()


def test_mean_luma_matches_formula():
    mid = 42
    w, h, luma = decode_jpeg(synth_jpeg_bytes(mid))
    bw, bh = 4 + mid % 7, 4 + mid % 4
    exp = np.mean(
        [[jpeg_block_value(mid, bx, by) for bx in range(bw)] for by in range(bh)]
    ) / 255.0
    assert abs(luma - exp) < 1e-12


def _headers(w, h, components):
    """SOI..SOS prelude for a quant-all-ones stream reusing the luminance
    tables for every component (legal; exercises the table plumbing)."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    ncomp = len(components)
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos_body = bytes([ncomp])
    for cid, hs, vs in components:
        sof_body += bytes([cid, (hs << 4) | vs, 0])
        sos_body += bytes([cid, 0x00])
    sos_body += bytes([0, 63, 0])
    sof = b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
    dht = _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS) + _dht_segment(
        0x10, AC_LUM_BITS, AC_LUM_VALS
    )
    sos = b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
    return b"\xff\xd8" + dqt + sof + dht + sos


def test_color_420_assembly():
    """16×16 YCbCr 4:2:0: one MCU = 4 Y blocks (quadrants with distinct
    constants) + 1 Cb + 1 Cr. The luma plane must assemble the quadrants
    in raster order; chroma must be entropy-consumed without corrupting it."""
    quads = [40, 90, 140, 190]  # Y blocks in MCU order: TL, TR, BL, BR
    bits = _BitWriter()
    prev = {"y": 0, "cb": 0, "cr": 0}
    for v in quads:
        prev["y"] = _write_dc_block(bits, v, prev["y"])
    prev["cb"] = _write_dc_block(bits, 128, prev["cb"])
    prev["cr"] = _write_dc_block(bits, 120, prev["cr"])
    data = (
        _headers(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
        + bits.flush()
        + b"\xff\xd9"
    )
    w, h, gray = decode_jpeg_gray_pixels(data)
    assert (w, h) == (16, 16)
    arr = np.frombuffer(gray, dtype=np.uint8).reshape(16, 16)
    assert (arr[:8, :8] == quads[0]).all()
    assert (arr[:8, 8:] == quads[1]).all()
    assert (arr[8:, :8] == quads[2]).all()
    assert (arr[8:, 8:] == quads[3]).all()


def test_color_444_assembly():
    vals = [60, 200]  # 16×8, two MCUs side by side
    bits = _BitWriter()
    prev = {"y": 0, "cb": 0, "cr": 0}
    for v in vals:
        prev["y"] = _write_dc_block(bits, v, prev["y"])
        prev["cb"] = _write_dc_block(bits, 128, prev["cb"])
        prev["cr"] = _write_dc_block(bits, 128, prev["cr"])
    data = (
        _headers(16, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)])
        + bits.flush()
        + b"\xff\xd9"
    )
    w, h, gray = decode_jpeg_gray_pixels(data)
    arr = np.frombuffer(gray, dtype=np.uint8).reshape(8, 16)
    assert (arr[:, :8] == 60).all() and (arr[:, 8:] == 200).all()


def test_restart_markers():
    """DRI=2 grayscale, 4 MCUs: RST0 after MCU 2 resets the DC predictor
    and realigns to a byte boundary."""
    vals = [30, 70, 110, 150]
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    head = _headers(32, 8, [(1, 1, 1)])
    head = head[:-10] + dri + head[-10:]  # insert DRI before SOS
    b1 = _BitWriter()
    prev = 0
    for v in vals[:2]:
        prev = _write_dc_block(b1, v, prev)
    b2 = _BitWriter()
    prev = 0  # predictors reset at restart
    for v in vals[2:]:
        prev = _write_dc_block(b2, v, prev)
    data = head + b1.flush() + b"\xff\xd0" + b2.flush() + b"\xff\xd9"
    w, h, gray = decode_jpeg_gray_pixels(data)
    assert (w, h) == (32, 8)
    arr = np.frombuffer(gray, dtype=np.uint8).reshape(8, 32)
    for i, v in enumerate(vals):
        assert (arr[:, i * 8 : (i + 1) * 8] == v).all(), (i, v)


def test_malformed_and_garbage_rejected():
    # a baseline file with its SOF marker flipped to SOF2 is MALFORMED
    # progressive (a DC scan may not span Se=63) — never decoded as either
    prog = synth_jpeg_bytes(3).replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_gray_pixels(prog) == (0, 0, None)
    assert decode_jpeg_gray_pixels(b"\xff\xd8garbage") == (0, 0, None)
    assert decode_jpeg(b"not a jpeg")[2] is None
    truncated = synth_jpeg_bytes(5)[:-10]
    assert decode_jpeg_gray_pixels(truncated)[2] is None


class TestProgressive:
    """SOF2 decode (T.81 Annex G): the progressive serialization of a
    coefficient grid must decode IDENTICALLY to its baseline
    serialization — spectral selection, successive approximation, EOB
    runs and refinement correction bits all exercised differentially."""

    def test_fixture_equals_baseline_fixture(self):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            synth_progressive_jpeg_bytes,
        )

        for mid in range(0, 100, 7):
            b = decode_jpeg_gray_pixels(synth_jpeg_bytes(mid))
            p = decode_jpeg_gray_pixels(synth_progressive_jpeg_bytes(mid))
            assert p[2] is not None
            assert b == p, mid

    def test_random_coeff_grids_differential(self):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            encode_gray_coeffs_baseline,
            encode_gray_coeffs_progressive,
        )

        rng = np.random.default_rng(7)
        for trial in range(25):
            bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
            co = np.zeros((bh, bw, 64), dtype=np.int64)
            co[..., 0] = rng.integers(-600, 600, size=(bh, bw))
            for _ in range(bh * bw * 8):  # sparse AC incl. long zero runs
                co[rng.integers(bh), rng.integers(bw),
                   rng.integers(1, 64)] = rng.integers(-100, 100)
            b = decode_jpeg_gray_pixels(encode_gray_coeffs_baseline(co))
            p = decode_jpeg_gray_pixels(encode_gray_coeffs_progressive(co))
            assert b[2] is not None and b == p, trial

    def test_dense_grids_exercise_refinement_history(self):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            encode_gray_coeffs_baseline,
            encode_gray_coeffs_progressive,
        )

        rng = np.random.default_rng(11)
        for trial in range(15):
            co = rng.integers(-3, 4, size=(2, 3, 64))  # |coeff|∈{0..3}:
            co[..., 0] = rng.integers(-200, 200, size=(2, 3))
            # Al=1 first pass codes |c|>=2; refinement mixes correction
            # bits with newly-nonzero |c|==1 — the G.1.2.3 hard path
            b = decode_jpeg_gray_pixels(encode_gray_coeffs_baseline(co))
            p = decode_jpeg_gray_pixels(encode_gray_coeffs_progressive(co))
            assert b == p, trial

    def test_spectral_band_splits_and_deep_approximation(self):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            encode_gray_coeffs_baseline,
            encode_gray_coeffs_progressive,
        )

        rng = np.random.default_rng(13)
        scans = [
            (0, 0, 0, 1), (1, 5, 0, 2), (6, 20, 0, 1), (21, 63, 0, 0),
            (0, 0, 1, 0), (1, 5, 2, 1), (1, 5, 1, 0), (6, 20, 1, 0),
        ]
        for trial in range(10):
            co = rng.integers(-80, 80, size=(3, 4, 64))
            co[..., 0] = rng.integers(-500, 500, size=(3, 4))
            b = decode_jpeg_gray_pixels(encode_gray_coeffs_baseline(co))
            p = decode_jpeg_gray_pixels(
                encode_gray_coeffs_progressive(co, scans)
            )
            assert b == p, trial

    def test_restart_markers_in_progressive_scans(self):
        """DRI + RSTn inside SOF2 scans: DC predictors and EOB runs reset
        at every restart; output still equals the baseline serialization."""
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            encode_gray_coeffs_baseline,
            encode_gray_coeffs_progressive,
        )

        rng = np.random.default_rng(23)
        for ri in (1, 2, 5):
            for trial in range(5):
                bh, bw = int(rng.integers(2, 5)), int(rng.integers(2, 5))
                co = np.zeros((bh, bw, 64), dtype=np.int64)
                co[..., 0] = rng.integers(-600, 600, size=(bh, bw))
                for _ in range(bh * bw * 6):
                    co[rng.integers(bh), rng.integers(bw),
                       rng.integers(1, 64)] = rng.integers(-60, 60)
                b = decode_jpeg_gray_pixels(encode_gray_coeffs_baseline(co))
                p = decode_jpeg_gray_pixels(encode_gray_coeffs_progressive(
                    co, restart_interval=ri))
                assert b[2] is not None and b == p, (ri, trial)

    def test_color_444_interleaved_dc_and_per_component_ac(self):
        """3-component 4:4:4 progressive: the DC scans interleave all
        components per MCU (per-component predictors), the AC scans run
        one component at a time; the decoded Y plane must equal an
        independent numpy IDCT of the luma coefficient grid."""
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            PROG_AC_BITS,
            PROG_AC_VALS,
            ZIGZAG,
            _A,
            _EobState,
            _encode_ac_first_block,
            _encode_ac_refine_block,
            _sos_header,
        )

        rng = np.random.default_rng(31)
        bh, bw = 2, 3
        comps = [rng.integers(-60, 60, size=(bh, bw, 64)) for _ in range(3)]
        for c in comps:
            c[..., 0] = rng.integers(-400, 400, size=(bh, bw))

        dc_codes = DC_CODES
        ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

        jfif = (b"\xff\xe0" + struct.pack(">H", 16)
                + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
                + b"\x00\x00")
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        sof2 = (b"\xff\xc2" + struct.pack(">H", 17) + bytes([8])
                + struct.pack(">HH", bh * 8, bw * 8) + bytes([3])
                + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
        dht = (_dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS)
               + _dht_segment(0x10, PROG_AC_BITS, PROG_AC_VALS))
        out = bytearray(b"\xff\xd8" + jfif + dqt + sof2 + dht)

        # scan 1: interleaved DC first pass, Al=1
        out += _sos_header([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1)
        bits = _BitWriter()
        preds = [0, 0, 0]
        for by in range(bh):
            for bx in range(bw):
                for ci in range(3):
                    t = int(comps[ci][by, bx, 0]) >> 1
                    diff = t - preds[ci]
                    preds[ci] = t
                    size = abs(diff).bit_length()
                    code, ln = dc_codes[size]
                    bits.write(code, ln)
                    if size:
                        bits.write(
                            diff if diff > 0 else diff + (1 << size) - 1, size)
        out += bits.flush()
        # scans 2-4: per-component AC first pass, Al=1
        for ci, cid in enumerate((1, 2, 3)):
            out += _sos_header([(cid, 0, 0)], 1, 63, 0, 1)
            bits = _BitWriter()
            eob = _EobState(bits, ac_codes)
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_first_block(comps[ci][by, bx], 1, 63, 1, eob)
            eob.flush()
            out += bits.flush()
        # scan 5: interleaved DC refinement to Al=0
        out += _sos_header([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0)
        bits = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                for ci in range(3):
                    bits.write(int(comps[ci][by, bx, 0]) & 1, 1)
        out += bits.flush()
        # scans 6-8: per-component AC refinement to Al=0
        for ci, cid in enumerate((1, 2, 3)):
            out += _sos_header([(cid, 0, 0)], 1, 63, 1, 0)
            bits = _BitWriter()
            eob = _EobState(bits, ac_codes)
            for by in range(bh):
                for bx in range(bw):
                    _encode_ac_refine_block(comps[ci][by, bx], 1, 63, 0, eob)
            eob.flush()
            out += bits.flush()
        data = bytes(out) + b"\xff\xd9"

        w, h, gray = decode_jpeg_gray_pixels(data)
        assert (w, h) == (bw * 8, bh * 8)
        got = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
        # independent expectation: dezigzag + IDCT of the luma grid
        exp = np.zeros((h, w))
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros((8, 8))
                for i, zz in enumerate(ZIGZAG):
                    blk[zz // 8][zz % 8] = comps[0][by, bx, i]
                exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _A.T @ blk @ _A
        exp = np.clip(np.rint(exp + 128.0), 0, 255).astype(np.uint8)
        assert (got == exp).all()

    def test_truncated_progressive_yields_none(self):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
            synth_progressive_jpeg_bytes,
        )

        data = synth_progressive_jpeg_bytes(9)
        assert decode_jpeg_gray_pixels(data[:-30])[2] is None

    def test_spark_progressive_phash_planted_dups(self, spark):
        """Planted-dup detection over PROGRESSIVE fixtures: every 10th id
        reuses its predecessor's image; pHash over the SOF2 decode must
        find exactly the planted pairs at distance 0 — and each id's
        progressive pHash equals its baseline pHash (same pixels)."""
        from pyspark.sql import functions as F

        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import (
            hamming_pairs,
        )
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
            extract_image_phash,
            synthesize_media,
        )

        seeds = spark.range(0, 40).select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 10 == 1, F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("seed"),
        )
        synth = synthesize_media(
            seeds.select(F.col("seed").alias("media_id")).distinct(),
            kind="jpeg_progressive",
        ).withColumnRenamed("media_id", "seed")
        payloads = seeds.join(synth, "seed").select("media_id", "payload")
        hashed = extract_image_phash(payloads)
        pairs = hamming_pairs(
            hashed.filter(F.col("phash").isNotNull()), "media_id", "phash",
            max_hamming=0,
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == {(i - 1, i) for i in range(1, 40) if i % 10 == 1}

        base = synthesize_media(
            seeds.select(F.col("seed").alias("media_id")).distinct(),
            kind="jpeg",
        )
        hb = {r["media_id"]: r["phash"]
              for r in extract_image_phash(base).collect()}
        hp = {r["media_id"]: r["phash"] for r in hashed.collect()}
        assert all(hp[i] == hb[seed]
                   for i, seed in [(int(r["media_id"]), int(r["seed"]))
                                   for r in seeds.collect()])


@pytest.fixture(scope="module")
def media(spark):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        synthesize_media,
    )

    ids = spark.range(0, 40).selectExpr("id AS media_id")
    return synthesize_media(ids, kind="jpeg")


def test_spark_feature_extraction(spark, media):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        extract_image_features,
    )

    rows = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert len(rows) == 40
    for mid, r in rows.items():
        bw, bh = 4 + mid % 7, 4 + mid % 4
        assert (r["width"], r["height"]) == (8 * bw, 8 * bh)
        exp = np.mean(
            [[jpeg_block_value(mid, bx, by) for bx in range(bw)] for by in range(bh)]
        ) / 255.0
        assert abs(r["mean_luma"] - exp) < 1e-9


def test_spark_thumbnails_and_phash_planted_dups(spark):
    """Every 10th id reuses its predecessor's JPEG — pHash + hamming join
    must find exactly the planted pairs at distance 0."""
    from pyspark.sql import functions as F

    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import (
        hamming_pairs,
    )
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import (
        extract_image_phash,
        extract_image_thumbnails,
        synthesize_media,
    )

    seeds = spark.range(0, 40).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 10 == 1, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    synth = synthesize_media(
        seeds.select(F.col("seed").alias("media_id")).distinct(), kind="jpeg"
    ).withColumnRenamed("media_id", "seed")
    payloads = seeds.join(synth, "seed").select("media_id", "payload")

    thumbs = extract_image_thumbnails(payloads, size=2).collect()
    assert all(r["thumb"] is not None and len(r["thumb"]) == 4 for r in thumbs)

    hashed = extract_image_phash(payloads)
    pairs = hamming_pairs(
        hashed.filter(F.col("phash").isNotNull()), "media_id", "phash",
        max_hamming=0,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1), (10, 11), (20, 21), (30, 31)}
