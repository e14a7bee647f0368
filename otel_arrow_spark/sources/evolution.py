"""Schema evolution: reading and unioning table generations whose schemas
drifted — the reference's dynamic-schema system re-expressed for Spark.

Reference analog (SURVEY §1.4): columns are optional and omitted when
all-null (`schema.Optional`, go/pkg/otel/common/schema/logs.go:28-51),
and the schema can change mid-stream — dictionary index upgrades
(u8→u16, schema_update_request.go:27-62) and new fields — forcing
readers to tolerate absent columns and widened types. In Spark the same
two events appear as parquet generations: a file written before a column
existed, and a file whose numeric column was widened.

Policy, mirroring the reference's updates:

- **absent column** → present in the unified schema, NULL for rows from
  generations that lacked it (Optional-column semantics);
- **numeric widening** → byte<short<int<long and float<double upgrade to
  the widest generation (the Dictionary<U8>→<U16> analog);
- anything else (string vs int, …) is a REAL schema conflict and raises —
  silently coercing would corrupt data, and the reference likewise treats
  non-widening changes as a new schema, not an update.

All of this is metadata-plane: the unified read is scan + project (casts)
+ union — no shuffle, no Python, and column pruning still reaches each
generation's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening lattices, narrowest first
_INT_ORDER = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOAT_ORDER = [T.FloatType(), T.DoubleType()]


def merge_field_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """The widened type of one column across two generations, or raise."""
    if a == b:
        return a
    for order in (_INT_ORDER, _FLOAT_ORDER):
        if a in order and b in order:
            return order[max(order.index(a), order.index(b))]
    raise TypeError(
        f"incompatible schema change: {a.simpleString()} vs {b.simpleString()} "
        "is not a widening (the reference treats this as a new schema)"
    )


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Unified schema: a's column order, b's novel columns appended;
    shared columns take the widened type."""
    b_types = {f.name: f.dataType for f in b.fields}
    fields = []
    for f in a.fields:
        dt = merge_field_type(f.dataType, b_types[f.name]) if f.name in b_types else f.dataType
        fields.append(T.StructField(f.name, dt, nullable=True))
    a_names = {f.name for f in a.fields}
    fields += [
        T.StructField(f.name, f.dataType, nullable=True)
        for f in b.fields
        if f.name not in a_names
    ]
    return T.StructType(fields)


def conform_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: absent columns become typed NULLs,
    shared columns cast (widening was validated by merge_schemas), order
    follows ``target`` — pure projection, codegen'd, zero shuffle."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] == f.dataType:
            cols.append(F.col(f.name))
        else:
            merge_field_type(have[f.name], f.dataType)  # raise on non-widening
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def evolved_union(*generations: DataFrame) -> DataFrame:
    """Union table generations under the merged schema (absent → NULL,
    numerics widened, conflicts raise). Unlike ``unionByName(…,
    allowMissingColumns=True)`` this also performs the reference's
    width-upgrade instead of failing on int vs long."""
    if not generations:
        raise ValueError("no generations")
    target = generations[0].schema
    for g in generations[1:]:
        target = merge_schemas(target, g.schema)
    out = conform_to(generations[0], target)
    for g in generations[1:]:
        out = out.unionByName(conform_to(g, target))
    return out


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet generations written under different schemas as ONE
    frame. Spark's own ``mergeSchema`` handles added columns but refuses
    widened numerics ("Failed to merge incompatible data types"), so each
    generation is scanned under its own schema and unified here — the
    per-generation scans keep predicate pushdown and column pruning."""
    return evolved_union(*(spark.read.parquet(p) for p in paths))
