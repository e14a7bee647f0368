"""Scalar function surface: the OPL function library re-expressed in Spark.

Reference: OPL functions (query-engine-languages/docs/opl-user-guide/src/
functions.md:1-305) and their DataFusion bindings
(query-engine/src/pipeline/expr/planner.rs:1844-1877) plus the custom UDFs
(contains/fnv/murmur3/xxh3/xxh128/substring/regexp_substr/uuidv7).
"""

from otel_arrow_spark.functions.scalar import (  # noqa: F401
    contains,
    ends_with,
    fnv64,
    format_datetime,
    ieq,
    matches,
    md5,
    sha1,
    murmur3,
    opl_coalesce,
    opl_concat,
    opl_encode,
    opl_join,
    opl_replace,
    opl_substring,
    parse_traceparent,
    regexp_capture,
    regexp_substr,
    sha256,
    sha512,
    starts_with,
    uuid7,
    xxh64,
)
