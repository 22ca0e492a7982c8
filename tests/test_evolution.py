"""Schema-evolution reads: added columns null-fill, numeric types widen,
irreconcilable conflicts raise, and pushdown survives per version."""

import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.sources.evolution import (
    read_with_evolution,
    unify_schemas,
    unify_types,
)


class TestUnify:
    def test_integer_lattice(self):
        assert unify_types("int", "bigint") == "bigint"
        assert unify_types("tinyint", "smallint") == "smallint"
        assert unify_types("bigint", "int") == "bigint"

    def test_float_lattice_and_cross(self):
        assert unify_types("float", "double") == "double"
        assert unify_types("int", "float") == "double"
        assert unify_types("bigint", "double") == "double"

    def test_conflict_raises(self):
        with pytest.raises(ValueError):
            unify_types("string", "int")

    def test_field_order_is_first_appearance(self, spark):
        a = spark.createDataFrame([(1, "x")], "id int, name string").schema
        b = spark.createDataFrame([(2.0, 3, "e")], "v double, id long, extra string").schema
        assert unify_schemas([a, b]) == [
            ("id", "bigint"), ("name", "string"), ("v", "double"), ("extra", "string"),
        ]


class TestReadWithEvolution:
    def _write_versions(self, spark, tmp_path):
        v1 = str(tmp_path / "v1")
        v2 = str(tmp_path / "v2")
        spark.createDataFrame(
            [(1, 1.5), (2, 2.5)], "id int, v float"
        ).write.parquet(v1)
        spark.createDataFrame(
            [(3_000_000_000, 9.25, "new")], "id long, v double, tag string"
        ).write.parquet(v2)
        return v1, v2

    def test_widened_union_with_null_fill(self, spark, tmp_path):
        v1, v2 = self._write_versions(spark, tmp_path)
        df = read_with_evolution(spark, [v1, v2])
        assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
            ("id", "bigint"), ("v", "double"), ("tag", "string"),
        ]
        rows = {r["id"]: (r["v"], r["tag"]) for r in df.collect()}
        assert rows == {1: (1.5, None), 2: (2.5, None), 3_000_000_000: (9.25, "new")}

    def test_conflicting_versions_raise(self, spark, tmp_path):
        va = str(tmp_path / "va")
        vb = str(tmp_path / "vb")
        spark.createDataFrame([(1,)], "x int").write.parquet(va)
        spark.createDataFrame([("s",)], "x string").write.parquet(vb)
        with pytest.raises(ValueError, match="column 'x'"):
            read_with_evolution(spark, [va, vb])

    def test_single_version_roundtrip(self, spark, tmp_path):
        v1 = str(tmp_path / "only")
        spark.createDataFrame([(1, "a")], "id int, s string").write.parquet(v1)
        df = read_with_evolution(spark, [v1])
        assert df.count() == 1

    def test_filter_pushes_into_each_version_scan(self, spark, tmp_path):
        v1, v2 = self._write_versions(spark, tmp_path)
        df = read_with_evolution(spark, [v1, v2]).filter("id = 2")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the union must not block pushdown: both parquet scans carry a
        # pushed filter (v1 side pushes on the pre-cast int column)
        assert plan.count("PushedFilters: [IsNotNull(id)") >= 1
        assert df.collect()[0]["v"] == 2.5
