"""EXIF APP1/TIFF-IFD parsing: round trip both byte orders, corrupt
payloads yield None (never raise), and an injected APP1 does not disturb
the pixel decoder."""

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.exif import (
    build_exif_app1,
    extract_exif,
    parse_exif,
    synthesize_exif_media,
    with_exif,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.jpeg import (
    decode_jpeg,
    synth_jpeg_bytes,
)

FIELDS = dict(
    make="Acme", model="Shooter 9", orientation=6,
    datetime_original="2024:02:29 12:34:56", pixel_x=640, pixel_y=480,
)


class TestParse:
    def test_roundtrip_little_endian(self):
        jp = with_exif(synth_jpeg_bytes(1), build_exif_app1(**FIELDS))
        got = parse_exif(jp)
        assert got["make"] == "Acme" and got["model"] == "Shooter 9"
        assert got["orientation"] == 6
        assert got["datetime_original"] == "2024:02:29 12:34:56"
        assert (got["pixel_x"], got["pixel_y"]) == (640, 480)

    def test_roundtrip_big_endian(self):
        jp = with_exif(
            synth_jpeg_bytes(2), build_exif_app1(byte_order="MM", **FIELDS)
        )
        got = parse_exif(jp)
        assert got["orientation"] == 6 and got["pixel_x"] == 640

    def test_no_app1_yields_none(self):
        assert parse_exif(synth_jpeg_bytes(3)) is None
        assert parse_exif(b"") is None
        assert parse_exif(b"\x89PNG\r\n") is None

    def test_corrupt_segments_never_raise(self):
        good = with_exif(synth_jpeg_bytes(4), build_exif_app1(**FIELDS))
        for cut in (3, 6, 10, 14, 20, 40):
            assert parse_exif(good[:cut]) in (None, parse_exif(good[:cut]))
        # bad TIFF magic
        bad = good.replace(b"II\x2a\x00", b"II\x2b\x00", 1)
        assert parse_exif(bad) is None
        # mangled byte-order mark
        bad2 = good.replace(b"Exif\x00\x00II", b"Exif\x00\x00XX", 1)
        assert parse_exif(bad2) is None

    def test_pixel_decoder_unaffected_by_app1(self):
        plain = synth_jpeg_bytes(5)
        tagged = with_exif(plain, build_exif_app1(**FIELDS))
        assert decode_jpeg(tagged) == decode_jpeg(plain)


class TestSparkStage:
    def test_extract_matches_id_arithmetic(self, spark):
        ids = spark.range(0, 40).selectExpr("id AS media_id")
        out = {r["media_id"]: r
               for r in extract_exif(synthesize_exif_media(ids)).collect()}
        for mid in range(40):
            r = out[mid]
            assert r["make"] == f"Cam{mid % 3}"
            assert r["orientation"] == mid % 8 + 1
            assert r["pixel_x"] == 8 * (4 + mid % 7)

    def test_untagged_payloads_yield_nulls_not_drops(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(synth_jpeg_bytes(1))), (2, bytearray(b"garbage"))],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r for r in extract_exif(df).collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["make"] is None and rows[2]["make"] is None
