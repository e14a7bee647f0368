"""Table profiling: per-column data-quality statistics in ONE pass — the
ingest-validation / drift-monitoring step a telemetry pipeline runs on
every new partition (null rates, cardinalities, value bounds), and the
"describe the corpus" report a training-data pipeline publishes next to
each snapshot.

Reference analog: the reference validates record batches structurally on
receive (schema checks in the OTAP decoder); column-level profiling is
the downstream-analytics extension of that contract.

Scale shape: a single aggregate over the scan computes every statistic
for every requested column — ONE job, one scan, with the long
(one-row-per-column) output unpivoted from the single aggregate row, so
profiling 50 columns never re-reads the data. Cost model for the
distinct counts: exact ``countDistinct`` over k columns makes Catalyst
rewrite with an Expand (k row-copies feeding the partial aggregate, and
the shuffle carries each partition's distinct values) — exact and
bounded, but linear in k × per-partition cardinality; ``approx=True``
swaps in HyperLogLog sketches (approx_count_distinct), collapsing the
shuffle back to one constant-size sketch row per partition — the right
mode at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: tuple[str, ...] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per column: ``column, n_rows, n_nulls, n_distinct,
    min_str, max_str`` (bounds rendered as strings so one schema serves
    every column type; NULL bounds for all-null columns)."""
    cols = tuple(cols) if cols else tuple(df.columns)
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"),
            distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_str"),
            F.col(f"_mx_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(F.inline(F.array(*rows)))


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    by: tuple[str, ...] = (),
    lg_k: int = 12,
) -> DataFrame:
    """One mergeable HyperLogLog sketch per ``by`` group: ``(*by,
    n_rows, sketch binary, estimate)`` — the incremental form of a
    distinct count. Persist the sketch column to parquet next to each
    ingested partition and the question "how many distinct users across
    any set of days" becomes a union-merge over kilobyte sketches
    (:func:`merge_distinct_sketches`) — the data is never rescanned.

    Merging is register-wise max: order- and partition-insensitive, and
    duplicate-insert-idempotent (re-merging an already-covered day
    cannot change the union state — the same idempotence the
    fingerprint dedup index relies on), so the estimate carries the
    same ±error bound however the work was batched. It is not promised
    bit-identical to a single direct sketch: Spark's datasketches HLL
    keeps small inputs in a sparse coupon list whose promotion point
    depends on how the data was split, so a union of many tiny sketches
    and one big sketch can disagree within the error bound (observed:
    ~1% at 500 distinct split 4 ways). lg_k=12 ⇒ 4 KB per sketch,
    ~1.6% relative standard error.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
    ]
    g = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
    return g.withColumn(
        "estimate", F.hll_sketch_estimate(F.col("sketch"))
    )


def merge_distinct_sketches(
    sketches: DataFrame, by: tuple[str, ...] = ()
) -> DataFrame:
    """Roll stored sketches up to ``by`` (empty = one global row):
    ``(*by, n_rows, estimate)``. Reads only the sketch column — the
    cross-partition distinct count without touching the raw data."""
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "estimate"
        ),
    ]
    return sketches.groupBy(*by).agg(*aggs) if by else sketches.agg(*aggs)
