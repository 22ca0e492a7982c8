"""JSON parse/flatten helpers: explicit-schema parsing with corrupt
routing, recursive struct flattening with collision detection."""

import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.functions.jsonops import (
    flatten_structs,
    parse_json_column,
)

SCHEMA = "struct<a: bigint, nest: struct<x: string, deep: struct<y: bigint>>>"


def test_parse_routes_malformed_and_null(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "nest": {"x": "ok", "deep": {"y": 9}}}'),
         (2, "{broken"),
         (3, None)],
        "id long, payload string",
    )
    good, bad = parse_json_column(df, "payload", SCHEMA)
    assert [r["id"] for r in good.collect()] == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]
    assert bad.columns == ["id", "payload"]  # raw preserved


def test_flatten_recurses_with_dotted_names(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "nest": {"x": "ok", "deep": {"y": 9}}}')],
        "id long, payload string",
    )
    good, _ = parse_json_column(df, "payload", SCHEMA)
    flat = flatten_structs(good.select("id", "parsed"))
    assert flat.columns == ["id", "parsed_a", "parsed_nest_x", "parsed_nest_deep_y"]
    r = flat.collect()[0]
    assert (r["parsed_a"], r["parsed_nest_x"], r["parsed_nest_deep_y"]) == (5, "ok", 9)


def test_flatten_leaves_arrays_intact(spark):
    good, _ = parse_json_column(
        spark.createDataFrame([(1, '{"vals": [1, 2]}')], "id long, payload string"),
        "payload", "struct<vals: array<bigint>>",
    )
    flat = flatten_structs(good.select("id", "parsed"))
    assert flat.collect()[0]["parsed_vals"] == [1, 2]


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame([(1,)], "x long").selectExpr(
        "x AS a_b", "named_struct('b', x) AS a"
    )
    with pytest.raises(ValueError, match="collision"):
        flatten_structs(df)
