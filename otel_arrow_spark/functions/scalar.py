"""OPL scalar functions as Spark Column expressions.

Every function here returns a Column built from pyspark.sql.functions
primitives (JVM-side, whole-stage-codegen'd) except ``fnv64``, which is a
vectorized pandas UDF because Spark has no FNV kernel. Semantics follow the
OPL user guide (opl-user-guide/src/functions.md) — notably OPL substring is
0-indexed while Spark's is 1-indexed, and ``=~`` is case-insensitive
equality (query-engine/src/pipeline/filter/compare.rs:1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    """Subject position: strings are column names."""
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


def _v(x) -> Column:
    """Value position: strings are literals."""
    return x if isinstance(x, Column) else F.lit(x)


# --- string predicates (functions.md; planner.rs:1853-1877) -----------------


def contains(haystack, needle) -> Column:
    """OPL contains() — custom dictionary-aware UDF in the reference
    (query-engine/src/pipeline/functions/contains.rs:1); Spark's contains
    is already a vectorized codegen expression."""
    return _c(haystack).contains(_v(needle))


def matches(s, pattern: str) -> Column:
    """OPL matches(s, r"...") (expr/planner.rs:1464 plan_matches)."""
    return _c(s).rlike(pattern)


def starts_with(s, prefix) -> Column:
    return F.startswith(_c(s), _v(prefix))


def ends_with(s, suffix) -> Column:
    return F.endswith(_c(s), _v(suffix))


def ieq(a, b) -> Column:
    """OPL ``=~`` case-insensitive equality (filter/compare.rs)."""
    return F.lower(_c(a)) == F.lower(_c(b))


# --- string transforms -------------------------------------------------------


def opl_concat(*cols) -> Column:
    return F.concat(*[_c(c) for c in cols])


def opl_join(sep: str, *cols) -> Column:
    """OPL join(sep, ...) == concat_ws (planner.rs:889-936)."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def opl_substring(s, start, length=None) -> Column:
    """OPL substring is 0-indexed (functions/substring.rs:1); Spark's is
    1-indexed — offset by one here so OPL queries translate verbatim."""
    pos = _c(start) + F.lit(1)
    if length is None:
        return F.substr(_c(s), pos)
    return F.substr(_c(s), pos, _c(length))


def opl_replace(s, from_, to) -> Column:
    return F.replace(_c(s), _v(from_), _v(to))


def regexp_capture(s, pattern: str, group: int) -> Column:
    """OPL regexp_capture (functions.md:118-129): NULL on no match
    (Spark's regexp_extract returns '' — normalized here)."""
    return F.nullif(F.regexp_extract(_c(s), pattern, group), F.lit(""))


def regexp_substr(
    s,
    pattern: str,
    start: int = 1,
    occurrence: int = 1,
    flags: str | None = None,
    group: int = 0,
) -> Column:
    """OPL regexp_substr (functions/regexp_substr.rs:33) — full SQL Server
    signature ``regexp_substr(str, pattern [, start [, occurrence [, flags
    [, group]]]])``: 1-based ``start`` position, nth ``occurrence``,
    ``i``/``m``/``s`` regex flags, capture ``group`` (0 = whole match).
    Spark-first: substr + regexp_extract_all + try_element_at — stays
    JVM-side; NULL (not an ANSI error) when occurrence > match count."""
    if flags:
        inline = "".join(ch for ch in flags if ch in "ims")
        if inline:
            pattern = f"(?{inline})" + pattern
    subject = _c(s) if start == 1 else F.substr(_c(s), F.lit(int(start)))
    return F.try_element_at(
        F.regexp_extract_all(subject, F.lit(pattern), int(group)),
        F.lit(int(occurrence)),
    )


# --- hashes / encodings (planner.rs:1852-1867) -------------------------------


def sha256(c) -> Column:
    return F.sha2(_c(c).cast("string"), 256)


def sha512(c) -> Column:
    return F.sha2(_c(c).cast("string"), 512)


def md5(c) -> Column:
    return F.md5(_c(c).cast("string"))


def md5_long60(c) -> Column:
    """The engine-portable 60-bit hash: first 15 hex chars of md5 as a
    non-negative BIGINT. This is THE cross-engine uniform the repo's
    deterministic sampling/sketching paths share (weighted_sample,
    count-min, the dedup gram hashes): any SQL engine replays it as
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`` — 15 hex chars =
    60 bits, always inside a signed 64-bit range on both sides. Change
    the width or slice here and every oracle replaying it must change
    with it; that contract lives in exactly this function."""
    return F.conv(F.substring(F.md5(_c(c)), 1, 15), 16, 10).cast("long")


def sha1(c) -> Column:
    """OPL sha1 (functions.rs make_udf_function list)."""
    return F.sha1(_c(c).cast("string"))


def murmur3(c) -> Column:
    """OPL murmur3 (functions/murmur3.rs:1). Spark's F.hash IS
    Murmur3-x86-32 (same family the reference binds), seed 42."""
    return F.hash(_c(c))


def xxh64(c) -> Column:
    """Stand-in for OPL xxh3/xxh128 (functions/xxh3.rs, xxh128.rs): Spark
    ships xxHash64; same family, 64-bit width."""
    return F.xxhash64(_c(c))


def fnv64(c) -> Column:
    """FNV-1a 64-bit (functions/fnv.rs:1) as an Arrow-batched pandas UDF.

    Not in the hot path — provided for hash parity with OPL queries. The
    per-batch loop is numpy-free but amortized over Arrow batches; prefer
    :func:`xxh64` for large-scale bucketing.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fnv_batch(s):
        def fnv1a(v):
            if v is None:
                return None
            h = 0xCBF29CE484222325
            for b in str(v).encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            # two's-complement into int64 for Spark LongType
            return h - (1 << 64) if h >= (1 << 63) else h

        return s.map(fnv1a)

    _fnv_batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("long")(_fnv_batch)(_c(c))


def opl_encode(c, encoding: str) -> Column:
    """OPL encode(bin, 'hex'|'base64') (planner.rs:1852)."""
    if encoding == "hex":
        return F.lower(F.hex(_c(c)))
    if encoding == "base64":
        return F.base64(_c(c))
    raise ValueError(f"unsupported encoding: {encoding!r}")


# --- datetime / uuid / null --------------------------------------------------


def format_datetime(ts, fmt: str) -> Column:
    """OPL format_datetime → DataFusion to_char (planner.rs:1859)."""
    return F.date_format(_c(ts), fmt)


def opl_coalesce(*cols) -> Column:
    return F.coalesce(*[_c(c) for c in cols])


def uuid7(ts, entropy) -> Column:
    """Deterministic UUIDv7 (functions/uuidv7.rs:1 analog).

    The reference's uuidv7 uses wall-clock millis + randomness; for a
    reproducible batch engine we derive the 74 random bits from xxhash64 of
    an entropy column instead, keeping the UUID time-ordered by ``ts`` and
    fully JVM-side (hex/lpad/concat — no UDF).

    Layout (RFC 9562): 48-bit unix millis | ver=7 | 12 bits rand |
    var=10 | 62 bits rand.
    """
    millis = (_c(ts).cast("double") * 1000).cast("long")
    t_hex = F.lpad(F.lower(F.hex(millis)), 12, "0")
    h = F.xxhash64(_c(entropy))
    rand_a = F.lpad(F.lower(F.hex(F.pmod(h, F.lit(4096)))), 3, "0")
    # variant bits: force leading hex digit into {8,9,a,b}
    variant_digit = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.pmod(F.xxhash64(_c(entropy), F.lit(1)), F.lit(4)) + 1).cast("int"),
    )
    rand_b = F.lpad(
        F.lower(F.hex(F.pmod(F.xxhash64(_c(entropy), F.lit(2)), F.lit(2**60)))), 15, "0"
    )
    return F.concat_ws(
        "-",
        F.substring(t_hex, 1, 8),
        F.substring(t_hex, 9, 4),
        F.concat(F.lit("7"), rand_a),
        F.concat(variant_digit, F.substring(rand_b, 1, 3)),
        F.substring(rand_b, 4, 12),
    )


def parse_traceparent(tp) -> Column:
    """Parse a W3C ``traceparent`` header (public spec, w3.org/TR/
    trace-context: ``{version:2x}-{trace_id:32x}-{span_id:16x}-{flags:2x}``)
    into a struct ``(trace_id, span_id, sampled, valid)`` — the context-
    propagation counterpart of the receivers' trace-id columns.

    Validity follows the spec: exact shape, lowercase hex, version ``ff``
    forbidden, all-zero trace-id/span-id forbidden. Invalid headers yield
    ``valid=false`` with NULL fields (a receiver must not fabricate
    context). ``sampled`` is bit 0 of the flags octet — tested via the
    low hex digit's parity, which replays identically in any engine
    without a hex→int conversion builtin.

    Pure expressions (rlike + substring): codegen-friendly, no UDF.
    """
    c = _c(tp)
    shape = c.rlike(
        "^[0-9a-f]{2}-[0-9a-f]{32}-[0-9a-f]{16}-[0-9a-f]{2}$"
    )
    version = F.substring(c, 1, 2)
    trace_id = F.substring(c, 4, 32)
    span_id = F.substring(c, 37, 16)
    flags = F.substring(c, 54, 2)
    valid = (
        shape
        & (version != "ff")
        & (trace_id != "0" * 32)
        & (span_id != "0" * 16)
    )
    sampled = F.substring(flags, 2, 1).isin("1", "3", "5", "7", "9", "b", "d", "f")
    return F.struct(
        F.when(valid, trace_id).alias("trace_id"),
        F.when(valid, span_id).alias("span_id"),
        F.when(valid, sampled).alias("sampled"),
        F.coalesce(valid, F.lit(False)).alias("valid"),
    )
