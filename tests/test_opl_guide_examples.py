"""VERBATIM queries from the reference's OPL user guide
(query-engine-languages/docs/opl-user-guide/src/basic_operators.md,
flow_control.md) executed unmodified against a guide-shaped log table —
the strongest "a reference user can paste their queries here" evidence."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.plans.opl import run_opl


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        # id, severity_text, severity_number, body, event_name, ts,
        # attributes, resource_attrs
        (1, "ERROR", 17, "disk error on /dev/sda", "http.request",
         dt.datetime(2026, 1, 1), {"url.path": "/v1/users", "http.target": "/API/users"},
         {"k8s.namespace.name": "observability", "service.version": "1.2"}),
        (2, "INFO", 9, "started ok", "HTTP.REQUEST",
         dt.datetime(2026, 7, 1), {"url.path": "/v1/health"},
         {"k8s.namespace.name": "apps", "k8s.pod.name": "web-testing-1"}),
        (3, "WARN", 13, "retrying", "other.event",
         dt.datetime(2026, 1, 2), {"url.path": "/v1/metrics", "sensitive": "s3cret"},
         {"k8s.namespace.name": "apps", "k8s.pod.name": "web-prod-1"}),
        (4, "DEBUG", 5, "tick", "debug.tick",
         dt.datetime(2026, 1, 3), None,
         {"k8s.namespace.name": "observability"}),
    ]
    df = spark.createDataFrame(
        rows,
        "id int, severity_text string, severity_number int, body string, "
        "event_name string, time_unix_nano timestamp_ntz, "
        "attributes map<string,string>, _res map<string,string>",
    )
    return df.withColumn(
        "resource", F.struct(F.col("_res").alias("attributes"),
                             F.lit(None).cast("string").alias("schema_url"))
    ).drop("_res")


def ids(r):
    return {x.id for x in r.default.collect()}


class TestWhereExamples:
    def test_severity_text(self, spark, logs):
        r = run_opl('logs | where severity_text == "ERROR"', {"logs": logs})
        assert ids(r) == {1}

    def test_attr_path_filter(self, spark, logs):
        r = run_opl(
            'logs | where attributes["url.path"] != "/v1/health"', {"logs": logs}
        )
        assert ids(r) == {1, 3}  # null map row excluded (!= null → null)

    def test_resource_attr_filter(self, spark, logs):
        r = run_opl(
            'logs | where resource.attributes["k8s.namespace.name"] == "observability"',
            {"logs": logs},
        )
        assert ids(r) == {1, 4}

    def test_severity_number(self, spark, logs):
        assert ids(run_opl("logs | where severity_number >= 17", {"logs": logs})) == {1}

    def test_timestamp_literal(self, spark, logs):
        r = run_opl(
            'logs | where time_unix_nano < timestamp"2026-06-01T00:00:00.0"',
            {"logs": logs},
        )
        assert ids(r) == {1, 3, 4}

    def test_case_insensitive_event(self, spark, logs):
        r = run_opl('logs | where event_name =~ "http.request"', {"logs": logs})
        assert ids(r) == {1, 2}

    def test_multiline_or(self, spark, logs):
        r = run_opl(
            """logs |
            where
                severity_text == "WARN" or
                severity_text == "ERROR" or
                severity_text == "FATAL"
            """,
            {"logs": logs},
        )
        assert ids(r) == {1, 3}

    def test_not_paths(self, spark, logs):
        r = run_opl(
            """logs | where not(
                attributes["url.path"] == "/v1/health" or
                attributes["url.path"] == "/v1/metrics"
            )""",
            {"logs": logs},
        )
        assert ids(r) == {1}

    def test_contains_body(self, spark, logs):
        r = run_opl('logs | where contains(body, "error")', {"logs": logs})
        assert ids(r) == {1}

    def test_not_matches_raw_regex(self, spark, logs):
        r = run_opl(
            'logs | where not(matches(resource.attributes["k8s.pod.name"], r".*testing.*"))',
            {"logs": logs},
        )
        assert ids(r) == {3}  # null pod names → null → not() stays null

    def test_is_string_guard(self, spark, logs):
        r = run_opl(
            """logs |
            where
                attributes["http.target"] is String and
                contains(lower_case(attributes["http.target"]), "/api/")
            """,
            {"logs": logs},
        )
        assert ids(r) == {1}

    def test_resource_is_string(self, spark, logs):
        r = run_opl(
            'logs | where resource.attributes["service.version"] is String',
            {"logs": logs},
        )
        assert ids(r) == {1}


class TestAttrOperatorExamples:
    def test_rename_attr(self, spark, logs):
        r = run_opl(
            'logs | rename attributes "url.path" as "url.full"', {"logs": logs}
        )
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert rows[1]["url.full"] == "/v1/users" and "url.path" not in rows[1]
        assert rows[4] is None

    def test_rename_resource_attr_nested(self, spark, logs):
        r = run_opl(
            'logs | rename resource.attributes "k8s.namespace.name" as "k8s.ns"',
            {"logs": logs},
        )
        for x in r.default.collect():
            assert "k8s.ns" in x.resource.attributes
            assert "k8s.namespace.name" not in x.resource.attributes

    def test_rename_multiple_pairs_multiline(self, spark, logs):
        r = run_opl(
            """logs |
            rename attributes "url.path" as "p", "http.target" as "t"
            """,
            {"logs": logs},
        )
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert rows[1] == {"p": "/v1/users", "t": "/API/users"}

    def test_remove_attr(self, spark, logs):
        r = run_opl('logs | remove attributes["url.path"]', {"logs": logs})
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert all("url.path" not in (a or {}) for a in rows.values())

    def test_remove_mixed_nested(self, spark, logs):
        r = run_opl(
            """logs |
            remove
                attributes["url.path"],
                resource.attributes["k8s.pod.name"]
            """,
            {"logs": logs},
        )
        for x in r.default.collect():
            assert "url.path" not in (x.attributes or {})
            assert "k8s.pod.name" not in x.resource.attributes

    def test_apply_attributes_value_filter(self, spark):
        df = spark.createDataFrame(
            [(1, {"a": "ok", "b": "my password is x"})],
            "id int, attributes map<string,string>",
        )
        r = run_opl(
            """logs | apply attributes {
                where not(matches(value, r".*password.*"))
            }""",
            {"logs": df},
        )
        assert r.default.collect()[0].attributes == {"a": "ok"}

    def test_apply_attributes_key_prefix_filter(self, spark):
        df = spark.createDataFrame(
            [(1, {"internal.x": "1", "public": "2"})],
            "id int, attributes map<string,string>",
        )
        r = run_opl(
            """logs | apply attributes {
                where not(starts_with(key, "internal."))
            }""",
            {"logs": df},
        )
        assert r.default.collect()[0].attributes == {"public": "2"}


class TestFlowControlExamples:
    def test_if_else_attr_priority(self, spark, logs):
        r = run_opl(
            """logs | if (severity_text == "ERROR") {
                set attributes["error.priority"] = "high"
            } else {
                set attributes["error.priority"] = "low"
            }""",
            {"logs": logs},
        )
        rows = {x.id: (x.attributes or {}).get("error.priority")
                for x in r.default.collect()}
        assert rows[1] == "high" and rows[2] == "low"

    def test_if_branch_pipeline_with_where(self, spark, logs):
        r = run_opl(
            """logs |
            if (severity_text == "ERROR") {
                // among ERROR logs, only keep those from observability
                where resource.attributes["k8s.namespace.name"] == "observability" |
                set attributes["error.escalate"] = true
            }""",
            {"logs": logs},
        )
        rows = {x.id: x for x in r.default.collect()}
        assert rows[1].attributes["error.escalate"] == "true" or \
            rows[1].attributes["error.escalate"] is True
        assert set(rows) == {1, 2, 3, 4}  # non-ERROR rows untouched

    def test_comments_in_query(self, spark, logs):
        r = run_opl(
            """logs |
            if (severity_number < 9) {
                // discard debug and trace logs
                drop
            }""",
            {"logs": logs},
        )
        assert ids(r) == {1, 2, 3}

    def test_signal_type_router(self, spark):
        signals = spark.createDataFrame(
            [(1, "log", None), (2, "metric", None), (3, "span", None)],
            "id int, signal_type string, attributes map<string,string>",
        )
        r = run_opl(
            """signals |
            if (is Log) {
                set attributes["signal.source"] = "logs"
            } else if (is Metric) {
                set attributes["signal.source"] = "metrics"
            } else if (is Span) {
                set attributes["signal.source"] = "traces"
            }""",
            {"signals": signals},
        )
        got = {x.id: x.attributes["signal.source"] for x in r.default.collect()}
        assert got == {1: "logs", 2: "metrics", 3: "traces"}

    def test_where_is_log(self, spark):
        signals = spark.createDataFrame(
            [(1, "log"), (2, "metric"), (3, "span")], "id int, signal_type string"
        )
        r = run_opl("signals | where is Log", {"signals": signals})
        assert ids(r) == {1}


class TestTracesSource:
    def test_traces_query_over_spans_star_schema(self, spark, workdir):
        """The guide's traces example (types.md: `traces | where
        attributes[\"http.status_code\"] > 499`) over the actual spans star
        schema: exploded SPAN_ATTRS collected back to a map column, then
        the verbatim query."""
        from otel_arrow_spark.operators.attributes import collect_attrs
        from otel_arrow_spark.sources.spans import write_spans_parquet

        p = write_spans_parquet(f"{workdir}/spans_opl", 2000)
        spans = spark.read.parquet(f"{p}/spans.parquet")
        attrs = spark.read.parquet(f"{p}/span_attrs.parquet")
        # exploded attrs (typed columns) → map<string,string> per span
        amap = collect_attrs(
            attrs.select(
                F.col("parent_id").alias("id"),
                "key",
                F.coalesce(F.col("str"), F.col("int").cast("string")).alias("value"),
            )
            # OTel attrs are unique per key; the fixture can repeat one, so
            # reduce deterministically (min) before building the map
            .groupBy("id", "key").agg(F.min("value").alias("value")),
            ("id",),
        )
        traces = spans.join(amap, "id", "left")
        r = run_opl(
            'traces | where attributes["http.status_code"] > 499',
            {"traces": traces},
        )
        got = r.default
        # oracle: min status per span (matches the map reduction; status
        # codes are all 3 digits so lexicographic min == numeric min)
        want = (
            attrs.filter(F.col("key") == "http.status_code")
            .groupBy("parent_id").agg(F.min("int").alias("mn"))
            .filter(F.col("mn") > 499).count()
        )
        assert got.count() == want > 0


class TestFunctionsSurface:
    def test_every_functions_md_binding_callable(self, spark):
        """Every function the guide documents (functions.md:10-305) is
        callable from OPL text under its documented name."""
        df = spark.createDataFrame(
            [(1, "Hello World", 100.0, "2026-01-01 00:00:00")],
            "id int, s string, v double, t string",
        ).selectExpr("id", "s", "v", "cast(t as timestamp) ts")
        q = (
            "logs | set a1 = contains(s, 'World'), a2 = matches(s, r'W\\w+'), "
            "a3 = starts_with(s, 'He'), a4 = ends_with(s, 'ld'), a5 = lower_case(s), "
            "a6 = upper_case(s), a7 = concat(s, '!'), a8 = concat_ws('-', s, s), "
            "a9 = substring(s, 0, 5), a10 = replace(s, 'World', 'OPL'), "
            "a11 = ltrim(s), a12 = rtrim(s), a13 = regexp_capture(s, r'(W\\w+)', 1), "
            "a14 = regexp_substr(s, r'\\w+', 1, 2), a15 = sha256(s), a16 = sha512(s), "
            "a17 = md5(s), a18 = fnv(s), a19 = murmur3(s), a20 = xxh3(s), a21 = xxh128(s), "
            "a22 = encode(sha256(s), 'hex'), a23 = v * 2 + 1 - 3 / 4 % 2, a24 = log10(v), "
            "a25 = format_datetime(ts, 'yyyy-MM-dd'), a26 = uuid(), a27 = uuidv7(), "
            "a28 = coalesce(null, s)"
        )
        row = run_opl(q, {"logs": df}).default.collect()[0]
        assert row.a1 is True and row.a9 == "Hello" and row.a14 == "World"
        assert row.a25 == "2026-01-01" and row.a28 == "Hello World"
        assert row.a24 == 2.0


class TestSetAndFlowExamples:
    def test_drop_all(self, spark, logs):
        assert run_opl("logs | drop", {"logs": logs}).default.count() == 0

    def test_if_drop_debug(self, spark, logs):
        r = run_opl(
            "logs | if (severity_number < 9) {\n    drop\n}", {"logs": logs}
        )
        assert ids(r) == {1, 2, 3}

    def test_set_event_name(self, spark, logs):
        r = run_opl('logs | set event_name = "event.happened"', {"logs": logs})
        assert {x.event_name for x in r.default.collect()} == {"event.happened"}

    def test_set_attr(self, spark, logs):
        r = run_opl(
            'logs | set attributes["exception.type"] = "OSError"', {"logs": logs}
        )
        assert all(
            x.attributes["exception.type"] == "OSError" for x in r.default.collect()
        )

    def test_set_resource_attr_nested(self, spark, logs):
        r = run_opl(
            'logs | set resource.attributes["k8s.cluster.name"] = "dev-ca-central1"',
            {"logs": logs},
        )
        for x in r.default.collect():
            assert x.resource.attributes["k8s.cluster.name"] == "dev-ca-central1"
            # original keys intact
            assert "k8s.namespace.name" in x.resource.attributes

    def test_set_nested_plain_field(self, spark, logs):
        r = run_opl(
            'logs | set resource.schema_url = "https://opentelemetry.io/schemas/1.21.0"',
            {"logs": logs},
        )
        assert {x.resource.schema_url for x in r.default.collect()} == {
            "https://opentelemetry.io/schemas/1.21.0"
        }

    def test_compute_body(self, spark, logs):
        r = run_opl(
            'logs | set body = concat("[", severity_text, "]: ", event_name)',
            {"logs": logs},
        )
        got = {x.id: x.body for x in r.default.collect()}
        assert got[1] == "[ERROR]: http.request"

    def test_redact_attr_hash(self, spark, logs):
        import hashlib

        r = run_opl(
            'logs | set attributes["sensitive"] = encode(sha256(attributes["sensitive"]), "hex")',
            {"logs": logs},
        )
        got = {x.id: (x.attributes or {}).get("sensitive") for x in r.default.collect()}
        # sha256 binding emits hex text already; encode(•, 'hex') re-hexes
        # per the guide's composition — assert determinism + change
        assert got[3] is not None and got[3] != "s3cret"
        assert got[1] is None  # key absent stays absent? (upsert adds null)

    def test_multi_assignment_block(self, spark, logs):
        r = run_opl(
            """logs |
            set
                attributes["user.name"] = "alice",
                attributes["user.role"] = "admin",
                body = "hello world"
            """,
            {"logs": logs},
        )
        x = {row.id: row for row in r.default.collect()}[1]
        assert x.attributes["user.name"] == "alice"
        assert x.attributes["user.role"] == "admin"
        assert x.body == "hello world"
