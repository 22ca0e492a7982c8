"""CSV/ORC format sources: round-trips, corrupt routing, pushdown pins."""

import pytest
from pyspark.sql import types as T

from aws_dataset_ingestion_metrics_collection_framework_spark.sources.formats import (
    convert_to_parquet,
    read_csv_table,
    read_orc_table,
    write_csv_table,
    write_orc_table,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


class TestCsv:
    def test_roundtrip(self, spark, tmp_path):
        p = str(tmp_path / "t.csv")
        df = spark.createDataFrame(
            [(1, "a", 0.5), (2, "b", 1.25)], SCHEMA
        )
        write_csv_table(df, p)
        good, bad = read_csv_table(spark, p, SCHEMA)
        assert sorted(tuple(r) for r in good.collect()) == [
            (1, "a", 0.5), (2, "b", 1.25)
        ]
        assert bad.count() == 0

    def test_corrupt_rows_routed_with_raw_line(self, spark, tmp_path):
        p = tmp_path / "raw"
        p.mkdir()
        (p / "part.csv").write_text(
            "id,name,score\n"
            "1,ok,0.5\n"
            "not_a_number,broken,xyz\n"
            "2,fine,1.0\n"
        )
        good, bad = read_csv_table(spark, str(p), SCHEMA)
        assert {r["id"] for r in good.collect()} == {1, 2}
        raws = [r["raw"] for r in bad.collect()]
        assert raws == ["not_a_number,broken,xyz"]

    def test_schema_with_corrupt_col_rejected(self, spark, tmp_path):
        s = T.StructType([T.StructField("_corrupt_record", T.StringType())])
        with pytest.raises(ValueError):
            read_csv_table(spark, str(tmp_path), s)

    def test_convert_to_parquet_lands_good_and_quarantines_bad(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        (src / "d.csv").write_text("id,name,score\n1,a,0.5\nbad,row,here\n")
        dest = str(tmp_path / "lake")
        bad = convert_to_parquet(spark, str(src), dest, SCHEMA)
        assert bad.count() == 1
        # quarantine nests under the table; the _ prefix keeps it invisible
        # to parquet scans of dest
        assert spark.read.parquet(dest).count() == 1
        assert spark.read.text(dest + "/_corrupt").count() == 1

    def test_convert_all_good_leaves_empty_quarantine(self, spark, tmp_path):
        src = tmp_path / "src2"
        src.mkdir()
        (src / "d.csv").write_text("id,name,score\n1,a,0.5\n2,b,1.0\n")
        dest = str(tmp_path / "lake2")
        bad = convert_to_parquet(spark, str(src), dest, SCHEMA)
        assert bad.count() == 0
        assert spark.read.parquet(dest).count() == 2
        assert spark.read.text(dest + "/_corrupt").count() == 0


class TestOrc:
    def test_roundtrip_and_pushdown(self, spark, tmp_path):
        p = str(tmp_path / "t.orc")
        df = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(100)], SCHEMA
        )
        write_orc_table(df, p)
        back = read_orc_table(spark, p).filter("id = 7")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "EqualTo(id,7)" in plan
        assert back.collect()[0]["name"] == "n7"
