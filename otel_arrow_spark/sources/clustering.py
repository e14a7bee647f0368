"""Z-order clustering: multi-column data-skipping layout.

A linear sort (``compact_parquet_dir(sort_cols=...)``) makes the zone
map razor-sharp on the LEADING column and useless on every other — file
ranges for the second column span the whole domain. Z-ordering
interleaves the bits of several columns into one clustering key, so
each file covers a small hyper-rectangle of the combined space and
range predicates on ANY of the z-columns prune files. This is the
layout half of Iceberg/Delta's ``OPTIMIZE ZORDER BY``, re-expressed
over plain parquet + the zonemap sidecar (sources/zonemap.py).

Scale shape:

* quantization bounds (min/max per z-column) come from ONE algebraic
  aggregate — a single collected row of planning metadata, the same
  bounded materialization any clustering optimizer holds;
* the z-key itself is pure bit arithmetic (shift/and/or expressions,
  whole-stage codegen) — no UDF, no driver loop;
* the layout write is one ``repartitionByRange`` on the z-key (the same
  single shuffle a linear sort costs) + per-file zonemap rebuild;
* skew: repartitionByRange samples the z-key distribution, so hot
  hyper-rectangles split across files rather than hot keys piling into
  one task.

Caveat (same as every z-order implementation): quantization is linear
between the observed min/max; a heavily skewed column wastes key bits
on empty range. Quantile-based binning is the escape — quantize through
``F.ntile`` percentiles first — documented, not implemented, because
the synthetic fixtures are near-uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(
    cols: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Interleaved-bit z-value for ``cols`` ({name: (lo, hi)} observed
    bounds): each column is linearly quantized to ``bits`` bits between
    its bounds (clamped), then bit j of column i lands at interleaved
    position ``j * n_cols + i``. Pure shift/and/or expressions."""
    names = list(cols)
    n = len(names)
    if n < 2:
        raise ValueError("z-order needs at least two columns")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    z = F.lit(0).cast("long")
    for i, name in enumerate(names):
        lo, hi = cols[name]
        if lo is None or hi is None:
            continue  # all-NULL column: no information to interleave
        span = float(hi) - float(lo)
        if span <= 0:
            continue  # constant column contributes nothing
        scaled = (F.col(name).cast("double") - F.lit(float(lo))) / F.lit(span)
        q = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                F.floor(scaled * F.lit(float(1 << bits))).cast("long"),
            ),
        )
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, j).bitwiseAND(F.lit(1).cast("long")),
                    j * n + i,
                )
            )
    return z


def write_zordered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    files: int = 16,
    bits: int = 16,
) -> dict:
    """Write ``df`` z-ordered on ``cols`` into ~``files`` files with a
    zonemap over every z-column. Returns the observed bounds used for
    quantization. One bounds aggregate + one range shuffle + the
    manifest scan."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).head()
    bounds = {
        c: (row[f"lo_{c}"], row[f"hi_{c}"])
        for c in cols
    }
    zkey = zorder_key(bounds, bits)
    (
        df.withColumn("_z", zkey)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    from otel_arrow_spark.sources.zonemap import write_zonemap

    write_zonemap(spark, path, cols)
    return {"bounds": bounds, "files": files, "bits": bits}
