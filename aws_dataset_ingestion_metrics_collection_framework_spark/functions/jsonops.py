"""Semi-structured JSON columns: explicit-schema parse + recursive
struct flattening.

Event streams carry nested JSON payloads (the reference's own firehose
rows are JSON before Firehose converts them — SURVEY.md §2.1 S5); the
analytics-side need is schema-on-read WITHOUT schema inference (an
inference pass is a second full scan and drifts silently as payloads
evolve — same rule as every source in `sources/`).

`parse_json_column` parses against an EXPLICIT schema via the codegen'd
`from_json` (malformed rows → NULL struct, routed by the caller — never
absorbed as all-NULL fields masquerading as data); `flatten_structs`
recursively expands nested struct fields to `parent<sep>child` scalar
columns — the step that turns a parsed payload into a joinable/groupable
relational shape. Arrays are left intact (explode is a ROW-multiplying
decision the caller must own — auto-exploding two sibling arrays would
silently cross-product them).

All map-only projections: zero shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType | str,
    *,
    out_col: str = "parsed",
) -> tuple[DataFrame, DataFrame]:
    """Parse `json_col` against `schema` → (good, corrupt).

    good: input columns + `out_col` struct. corrupt: input rows whose
    payload failed to parse, raw payload preserved. NULL input payloads
    are corrupt too — a missing payload upstream is a data bug, not an
    empty document.

    Detection detail: PERMISSIVE `from_json` yields an all-NULL struct
    for malformed input — indistinguishable from a legitimately-empty
    object — so the parse schema carries a corrupt-record field (the
    same mechanism the CSV reader uses); it is stripped from the good
    side's struct."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    marker = "_corrupt_record"
    if marker in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not already contain {marker!r}")
    parse_schema = T.StructType(
        schema.fields + [T.StructField(marker, T.StringType())]
    )
    parsed = df.withColumn(
        "_pj",
        F.from_json(
            F.col(json_col),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": marker},
        ),
    )
    is_bad = (
        F.col(json_col).isNull()
        | F.col("_pj").isNull()
        | F.col(f"_pj.{marker}").isNotNull()
    )
    good = parsed.filter(~is_bad).withColumn(
        out_col,
        F.struct(*[F.col(f"_pj.{f.name}").alias(f.name) for f in schema.fields]),
    ).drop("_pj")
    bad = parsed.filter(is_bad).drop("_pj")
    return good, bad


def flatten_structs(df: DataFrame, *, sep: str = "_") -> DataFrame:
    """Recursively expand every StructType column into scalar columns
    named `parent<sep>child<sep>...`; non-struct columns pass through in
    order. Name collisions raise (silent overwrite loses data)."""
    cols: list[Column] = []
    names: list[str] = []

    def walk(prefix: str, dtype: T.DataType, source: Column) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}" if prefix else f.name,
                     f.dataType, source[f.name])
        else:
            if prefix in names:
                raise ValueError(
                    f"flatten collision: column {prefix!r} produced twice "
                    f"(rename a source field or change sep={sep!r})"
                )
            names.append(prefix)
            cols.append(source.alias(prefix))

    for f in df.schema.fields:
        walk(f.name, f.dataType, F.col(f.name))
    return df.select(*cols)
