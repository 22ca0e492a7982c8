"""Schema-evolution reads: one DataFrame over a lake table whose schema
changed across writes — added columns, dropped columns, widened numeric
types.

A long-lived 100 TB table never has one schema: producers add fields,
int ids outgrow 32 bits, float metrics move to double. Spark's
``mergeSchema`` only reconciles ADDED columns; a type change
(int→bigint) inside one parquet scan fails the read outright. The
standard lake-format behavior (Delta/Iceberg "schema evolution with type
widening") is reproduced here with plain DataFrame ops:

1. each schema *version* (a directory of files sharing a schema — the
   natural layout when writers roll versions) is scanned with its OWN
   schema, keeping predicate pushdown and column pruning per version;
2. the unified schema is computed by folding field types through a
   WIDENING lattice (byte→short→int→long, float→double, and
   integer→double as the last resort for int-vs-float conflicts);
   irreconcilable pairs (string vs int, …) raise loudly — silent
   coercion corrupts data;
3. every version is cast to the unified schema (codegen'd `Cast`, no
   Python boundary), missing columns null-filled, and the versions
   UNION'd — a zero-shuffle plan: the union concatenates partitions.

Order of fields follows first appearance across versions (stable for
downstream positional consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

# Numeric widening lattice, keyed by Spark simpleString type names.
_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_FRANK = {"float": 0, "double": 1}


def unify_types(a: str, b: str) -> str:
    """Widened common type of two Spark simpleString scalar types, or
    raise ValueError when no lossless-enough widening exists."""
    if a == b:
        return a
    if a in _RANK and b in _RANK:
        return a if _RANK[a] >= _RANK[b] else b
    if a in _FRANK and b in _FRANK:
        return a if _FRANK[a] >= _FRANK[b] else b
    # integer vs floating: standard lake behavior widens to double
    if (a in _RANK and b in _FRANK) or (a in _FRANK and b in _RANK):
        return "double"
    raise ValueError(f"cannot unify column types {a!r} and {b!r}")


def unify_schemas(schemas: list[StructType]) -> list[tuple[str, str]]:
    """Fold schemas into a unified [(name, simpleString type)] list, field
    order = first appearance; type conflicts widen via :func:`unify_types`."""
    order: list[str] = []
    types: dict[str, str] = {}
    for sch in schemas:
        for f in sch.fields:
            t = f.dataType.simpleString()
            if f.name not in types:
                order.append(f.name)
                types[f.name] = t
            else:
                try:
                    types[f.name] = unify_types(types[f.name], t)
                except ValueError as e:
                    raise ValueError(f"column {f.name!r}: {e}") from e
    return [(n, types[n]) for n in order]


def read_with_evolution(
    spark: SparkSession, version_dirs: list[str], *, format: str = "parquet"
) -> DataFrame:
    """Read schema-version directories as ONE DataFrame on the unified
    widened schema (see module docstring for the plan shape)."""
    if not version_dirs:
        raise ValueError("read_with_evolution needs at least one directory")
    readers = [spark.read.format(format).load(d) for d in version_dirs]
    unified = unify_schemas([r.schema for r in readers])
    parts = []
    for r in readers:
        have = set(r.columns)
        parts.append(
            r.select(
                *[
                    (F.col(n).cast(t) if n in have else F.lit(None).cast(t)).alias(n)
                    for n, t in unified
                ]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
