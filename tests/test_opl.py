"""OPL front-end tests: parse/compile/execute vs hand-written DataFrame
plans and Python oracles (the reference's transform-processor test shape,
transform_processor/mod.rs:1311)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.plans.opl import OplSyntaxError, parse, run_opl


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "ERROR", "disk failure on /dev/sda", 17, {"env": "prod"}),
        (2, "INFO", "started ok", 9, {"env": "dev"}),
        (3, "WARN", "retrying connection", 13, None),
        (4, "ERROR", "oom killed", 17, {"env": "prod", "svc": "db"}),
        (5, "DEBUG", "tick", 5, {}),
    ]
    return spark.createDataFrame(
        rows, "id int, severity_text string, body string, severity_number int, "
              "attributes map<string,string>"
    )


class TestParse:
    def test_round_trip_shapes(self):
        q = parse("logs | where a == 1 and not (b =~ 'X') | set c = 2, d = lower_case(e) "
                  "| route_to \"p\" | summarize n = count(), s = sum(x) by k")
        assert q.source == "logs"
        assert len(q.stages) == 4

    def test_syntax_errors(self):
        for bad in ["| where x", "logs | frobnicate", "logs | where", "logs | set 1 = 2",
                    "logs | route_to port"]:
            with pytest.raises(OplSyntaxError):
                parse(bad)
                # some errors only surface at compile; force stage walk
                raise OplSyntaxError("parsed but should not")


class TestExecute:
    def test_where(self, spark, logs):
        r = run_opl("logs | where severity_text == 'ERROR'", {"logs": logs})
        assert {x.id for x in r.default.collect()} == {1, 4}

    def test_where_functions_and_ops(self, spark, logs):
        r = run_opl(
            "logs | where contains(body, 'fail') or (severity_number + 4 == 13 and "
            "starts_with(body, 'started'))",
            {"logs": logs},
        )
        assert {x.id for x in r.default.collect()} == {1, 2}

    def test_case_insensitive_eq(self, spark, logs):
        r = run_opl("logs | where severity_text =~ 'error'", {"logs": logs})
        assert {x.id for x in r.default.collect()} == {1, 4}

    def test_set_fields_and_attributes(self, spark, logs):
        r = run_opl(
            "logs | set sev_lower = lower_case(severity_text), "
            "attributes['checked'] = 'yes'",
            {"logs": logs},
        )
        rows = {x.id: x for x in r.default.collect()}
        assert rows[1].sev_lower == "error"
        assert rows[1].attributes["checked"] == "yes"
        assert rows[1].attributes["env"] == "prod"
        assert rows[3].attributes == {"checked": "yes"}  # null map → created

    def test_set_matches_dataframe_equivalent(self, spark, logs):
        r = run_opl(
            "logs | set h = sha256(body), m = substring(body, 0, 4)", {"logs": logs}
        )
        want = logs.withColumn("h", F.sha2(F.col("body").cast("string"), 256)).withColumn(
            "m", F.substring("body", 1, 4)
        )
        # exceptAll rejects map columns; compare without attributes
        got_cmp = r.default.drop("attributes")
        want_cmp = want.drop("attributes")
        assert got_cmp.exceptAll(want_cmp).count() == 0
        assert want_cmp.exceptAll(got_cmp).count() == 0

    def test_drop(self, spark, logs):
        r = run_opl("logs | where severity_text == 'ERROR' | drop", {"logs": logs})
        assert r.default.count() == 0

    def test_route_to(self, spark, logs):
        r = run_opl(
            "logs | where severity_number >= 13 | route_to \"alerts\"", {"logs": logs}
        )
        assert r.default.count() == 0  # default output empty after divert
        assert {x.id for x in r.ports["alerts"].collect()} == {1, 3, 4}

    def test_summarize(self, spark, logs):
        r = run_opl(
            "logs | summarize n = count(), mx = max(severity_number) by severity_text",
            {"logs": logs},
        )
        got = {x.severity_text: (x.n, x.mx) for x in r.default.collect()}
        assert got == {"ERROR": (2, 17), "INFO": (1, 9), "WARN": (1, 13), "DEBUG": (1, 5)}

    def test_summarize_extended_aggregates(self, spark, logs):
        """The widened KQL aggregate set: dcount (exact tier), countif,
        sumif, percentile, stdev, make_set."""
        r = run_opl(
            "logs | summarize d = dcount(severity_text), "
            "errs = countif(severity_number >= 13), "
            "esum = sumif(severity_number, severity_text == 'ERROR'), "
            "p50 = percentile(severity_number, 50), "
            "sets = make_set(severity_text)",
            {"logs": logs},
        )
        row = r.default.collect()[0]
        assert row.d == 4
        assert row.errs == 3            # 17, 13, 17
        assert row.esum == 34           # 17 + 17
        assert row.p50 == 13.0          # exact interpolated median of 5,9,13,17,17
        assert row.sets == ["DEBUG", "ERROR", "INFO", "WARN"]

    def test_arg_max_min(self, spark, logs):
        r = run_opl(
            "logs | summarize worst = arg_max(severity_number, body), "
            "best = arg_min(severity_number, body)",
            {"logs": logs},
        )
        row = r.default.collect()[0]
        assert row.worst in ("disk failure on /dev/sda", "oom killed")  # sev 17 tie
        assert row.best == "tick"                                       # sev 5

    def test_summarize_wrong_arity_raises(self, logs):
        from otel_arrow_spark.plans.opl import OplSyntaxError

        with pytest.raises(OplSyntaxError, match="argument count"):
            run_opl("logs | summarize x = sumif(id)", {"logs": logs})

    def test_sort_top_distinct_stages(self, spark, logs):
        """KQL sort by (default DESC) / top N by / distinct; top compiles
        to TakeOrderedAndProject (per-partition top-N, no global sort)."""
        r = run_opl("logs | sort by severity_number desc, id asc | take 3",
                    {"logs": logs})
        assert [x.id for x in r.default.collect()] == [1, 4, 3]
        r = run_opl("logs | sort by severity_number | take 1", {"logs": logs})
        assert r.default.collect()[0].severity_number == 17  # KQL default desc
        top = run_opl("logs | top 2 by severity_number", {"logs": logs}).default
        assert sorted(x.id for x in top.collect()) == [1, 4]
        assert "TakeOrdered" in top._jdf.queryExecution().executedPlan().toString()
        d = run_opl("logs | distinct severity_text", {"logs": logs}).default
        assert sorted(x.severity_text for x in d.collect()) == [
            "DEBUG", "ERROR", "INFO", "WARN"]
        # distinct * after projecting away the map column (Spark cannot
        # run set operations over MAP types — documented engine limit)
        assert run_opl(
            "logs | project id, severity_text | distinct *", {"logs": logs}
        ).default.count() == 5

    def test_join_and_union_stages(self, spark):
        """KQL join kind=... (source) on cols / union (source)."""
        orders = spark.createDataFrame(
            [(1, 10, "A"), (2, 20, "B"), (3, 10, "C")], "oid int, cust int, f string")
        cust = spark.createDataFrame([(10, "alice"), (20, "bob")],
                                     "cust int, name string")
        r = run_opl("orders | join kind=inner (cust) on cust | project oid, name",
                    {"orders": orders, "cust": cust})
        assert sorted((x.oid, x.name) for x in r.default.collect()) == [
            (1, "alice"), (2, "bob"), (3, "alice")]
        r = run_opl("orders | join kind=leftanti (cust) on cust",
                    {"orders": orders, "cust": cust.filter("cust = 10")})
        assert [x.oid for x in r.default.collect()] == [2]
        more = spark.createDataFrame([(9, 99, "Z")], "oid int, cust int, f string")
        r = run_opl("orders | union (more) | summarize n = count()",
                    {"orders": orders, "more": more})
        assert r.default.collect()[0].n == 4
        from otel_arrow_spark.plans.opl import OplSyntaxError
        with pytest.raises(OplSyntaxError, match="unknown join source"):
            run_opl("orders | join (nope) on cust", {"orders": orders})

    def test_tpch_q3_in_kql_text_matches_dataframe_version(self, spark):
        """The full Q3 shape — three-way join, filters, summarize, sort,
        take — written as KQL TEXT produces exactly the hand-built
        DataFrame plan's rows (Catalyst pushes the filters through the
        text-ordered joins)."""
        import __spark_entry__ as entry

        sf = "/root/testdata/sf0.001"
        a = {tuple(sorted(r.asDict().items()))
             for r in entry.q_kql_q3(spark, sf).collect()}
        b = {tuple(sorted(r.asDict().items()))
             for r in entry.q_tpch_q3(spark, sf).collect()}
        assert a == b and len(a) == 10

    def test_bare_count_stage(self, spark, logs):
        r = run_opl("logs | where severity_number >= 13 | count", {"logs": logs})
        assert r.default.collect() == [__import__("pyspark").sql.Row(Count=3)]

    def test_mv_expand(self, spark):
        """KQL mv-expand: arrays one row per element (outer — empty arrays
        keep the row with null), maps one row per {key, value} entry."""
        df = spark.createDataFrame(
            [(1, ["a", "b"], {"x": "1", "y": "2"}), (2, [], None)],
            "id int, tags array<string>, attrs map<string,string>")
        r = run_opl("t | mv-expand tags", {"t": df})
        assert sorted((x.id, x.tags) for x in r.default.collect()) == [
            (1, "a"), (1, "b"), (2, None)]
        r = run_opl("t | mv-expand attrs | where id == 1", {"t": df})
        got = sorted((x.attrs.key, x.attrs.value) for x in r.default.collect())
        assert got == [("x", "1"), ("y", "2")]
        with pytest.raises(OplSyntaxError, match="array or map"):
            run_opl("t | mv-expand id", {"t": df})

    def test_full_pipeline_on_transcripts(self, spark, tiny_transcripts):
        """OPL over the parsed transcript table: the reference's showcase
        shape (where → set → route_to) end-to-end."""
        from otel_arrow_spark.operators.parse import parse_transcripts

        parsed = parse_transcripts(spark.read.parquet(tiny_transcripts))
        r = run_opl(
            "turns | where severity_text == 'ERROR' or severity_text == 'FATAL' "
            "| set fingerprint = sha256(text) | route_to \"errors\"",
            {"turns": parsed},
        )
        errs = r.ports["errors"]
        want = parsed.filter(F.col("severity_text").isin("ERROR", "FATAL")).count()
        assert errs.count() == want > 0
        row = errs.limit(1).collect()[0]
        import hashlib

        assert row.fingerprint == hashlib.sha256(row.text.encode()).hexdigest()


class TestFlowAndKql:
    def test_if_else_branch_pipelines(self, spark, logs):
        r = run_opl(
            "logs | if (severity_number >= 17) { set tier = 'crit' } "
            "else if (severity_number >= 13) { set tier = 'warn' } "
            "else { set tier = 'info' }",
            {"logs": logs},
        )
        got = {x.id: x.tier for x in r.default.collect()}
        assert got == {1: "crit", 4: "crit", 3: "warn", 2: "info", 5: "info"}
        assert r.default.count() == 5  # exclusive: no row duplicated/lost

    def test_if_branch_can_route(self, spark, logs):
        r = run_opl(
            "logs | if (severity_text == 'ERROR') { route_to 'err' } "
            "else { set ok = true }",
            {"logs": logs},
        )
        assert {x.id for x in r.ports["err"].collect()} == {1, 4}
        assert {x.id for x in r.default.collect()} == {2, 3, 5}

    def test_nested_if(self, spark, logs):
        r = run_opl(
            "logs | if (severity_number >= 13) { "
            "if (contains(body, 'disk')) { set kind = 'disk' } "
            "else { set kind = 'other' } } "
            "else { set kind = 'low' }",
            {"logs": logs},
        )
        got = {x.id: x.kind for x in r.default.collect()}
        assert got[1] == "disk" and got[4] == "other" and got[3] == "other"
        assert got[2] == "low" and got[5] == "low"

    def test_kql_extend_project_take_summarize(self, spark, logs):
        from otel_arrow_spark.plans.opl import run_kql

        r = run_kql(
            "logs | extend dbl = severity_number * 2 | project severity_text, dbl "
            "| summarize n = count(), mx = max(dbl) by severity_text",
            {"logs": logs},
        )
        got = {x.severity_text: (x.n, x.mx) for x in r.default.collect()}
        assert got["ERROR"] == (2, 34)
        r2 = run_kql("logs | take 2", {"logs": logs})
        assert r2.default.count() == 2

    def test_apply_attributes_where_and_set(self, spark, logs):
        r = run_opl(
            "logs | apply attributes { where key != 'svc' "
            "| set value = upper_case(value) }",
            {"logs": logs},
        )
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert rows[4] == {"env": "PROD"}   # svc deleted, value uppercased
        assert rows[1] == {"env": "PROD"}
        assert rows[3] is None              # null map untouched

    def test_fork_string_form(self, spark, logs):
        """fork { … } { … } duplicates the batch per branch, outputs
        unioned (opl.pest:211-217, fork.rs:25-31)."""
        r = run_opl(
            "logs | fork { where severity_text == 'ERROR' | set via = 'a' } "
            "{ where severity_number >= 13 | set via = 'b' }",
            {"logs": logs},
        )
        got = {(x.id, x.via) for x in r.default.collect()}
        assert got == {(1, "a"), (4, "a"), (1, "b"), (3, "b"), (4, "b")}

    def test_fork_branches_can_route(self, spark, logs):
        r = run_opl(
            "logs | fork { where severity_text == 'ERROR' | route_to 'err' } "
            "{ summarize n = count() | route_to 'stats' }",
            {"logs": logs},
        )
        assert r.default.count() == 0
        assert {x.id for x in r.ports["err"].collect()} == {1, 4}
        assert r.ports["stats"].collect()[0].n == 5


class TestStringLiteralFuzz:
    """Hypothesis net over the tokenizer's string-literal handling (the
    round-1 escape bug's whole class): encode → parse → decoded value is
    identity for arbitrary text."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_plain_literal_round_trip(self, s):
        from otel_arrow_spark.plans.opl import parse

        enc = s.replace("\\", "\\\\").replace("'", "\\'")
        q = parse(f"logs | where x == '{enc}'")
        assert q.stages[0].predicate.right.value == s

    @given(st.text(alphabet=st.characters(blacklist_characters="'\\",
                                          blacklist_categories=("Cs",)),
                   max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_raw_literal_is_verbatim(self, s):
        from otel_arrow_spark.plans.opl import parse

        q = parse(f"logs | where x == r'{s}'")
        assert q.stages[0].predicate.right.value == s

    @given(st.text(alphabet="abcdef\\dswn+*.[]()|{}0123456789", max_size=20))
    @settings(max_examples=150, deadline=None)
    def test_unrecognized_escapes_preserved(self, s):
        """Backslashes before non-escape chars survive — the property the
        regex-pattern bug violated."""
        import re as _re

        from otel_arrow_spark.plans.opl import _unquote

        decoded = _unquote(f"'{s}'")
        # strip ONLY recognized escapes the same way a regex author would
        expect = _re.sub(
            r"\\(['\"\\ntr])",
            lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
            s,
        )
        assert decoded == expect


class TestAdviceRegressions:
    """Round-1 ADVICE fixes pinned: raw strings, escape preservation,
    same-port route_to union, unary minus, regexp_substr arg order."""

    def test_raw_string_regex(self, spark, logs):
        r = run_opl(r"logs | where matches(body, r'\d+')", {"logs": logs})
        assert {x.id for x in r.default.collect()} == set()  # no digits in bodies
        r2 = run_opl(r"logs | where matches(body, r'/dev/\w+')", {"logs": logs})
        assert {x.id for x in r2.default.collect()} == {1}

    def test_plain_string_preserves_backslash(self, spark, logs):
        # '\w' is not a recognized escape → backslash preserved → regex works
        r = run_opl("logs | where matches(body, '/dev/\\w+')", {"logs": logs})
        assert {x.id for x in r.default.collect()} == {1}
        # recognized escapes still decode
        r2 = run_opl(r"logs | set nl = 'a\nb' | take 1", {"logs": logs})
        assert r2.default.collect()[0].nl == "a\nb"

    def test_route_to_same_port_unions(self, spark, logs):
        r = run_opl(
            "logs | if (severity_text == 'ERROR') { route_to 'sink' } "
            "else if (severity_number >= 13) { set esc = true | route_to 'sink' }",
            {"logs": logs},
        )
        assert {x.id for x in r.ports["sink"].collect()} == {1, 3, 4}

    def test_unary_minus(self, spark, logs):
        r = run_opl("logs | where severity_number > -5", {"logs": logs})
        assert r.default.count() == 5
        r2 = run_opl("logs | set neg = -severity_number | take 1", {"logs": logs})
        assert r2.default.collect()[0].neg == -17

    def test_regexp_substr_reference_arg_order(self, spark, logs):
        # (str, pattern, start, occurrence, flags, group)
        r = run_opl(
            "logs | where id == 1 | set m = regexp_substr(body, r'\\w+', 1, 2), "
            "g = regexp_substr(body, r'(d\\w+) (f\\w+)', 1, 1, 'i', 2)",
            {"logs": logs},
        )
        row = r.default.collect()[0]
        assert row.m == "failure"
        assert row.g == "failure"

    def test_rename_stage(self, spark, logs):
        """rename <map> "old" as "new" (opl.pest:219-221), ordered pairs."""
        r = run_opl(
            "logs | rename attributes 'env' as 'environment', 'svc' as 'service'",
            {"logs": logs},
        )
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert rows[4] == {"environment": "prod", "service": "db"}
        assert rows[3] is None  # null map untouched

    def test_remove_and_project_away(self, spark, logs):
        """remove / project-away map keys (opl.pest:223-225)."""
        r = run_opl("logs | remove attributes['env']", {"logs": logs})
        rows = {x.id: x.attributes for x in r.default.collect()}
        assert rows[4] == {"svc": "db"} and rows[1] == {}
        r2 = run_opl(
            "logs | project-away attributes['env'], attributes['svc']",
            {"logs": logs},
        )
        rows2 = {x.id: x.attributes for x in r2.default.collect()}
        assert rows2[4] == {} and rows2[2] == {}

    def test_project_away_columns_keep_rename(self, spark, logs):
        """KQL column forms (kql.pest tabular_expressions): project-away
        drops columns, project-keep selects, project-rename renames."""
        r = run_opl("logs | project-away body, attributes", {"logs": logs})
        assert set(r.default.columns) == {"id", "severity_text", "severity_number"}
        r2 = run_opl("logs | project-keep id, body", {"logs": logs})
        assert r2.default.columns == ["id", "body"]
        r3 = run_opl("logs | project-rename sev = severity_text", {"logs": logs})
        assert "sev" in r3.default.columns and "severity_text" not in r3.default.columns

    def test_kql_scalar_functions(self, spark, logs):
        """KQL scalar surface (kql.pest:121-198): iff, case, casts, strcat,
        extract (regex-first arg order), strlen."""
        r = run_opl(
            "logs | set tier = iff(severity_number >= 17, 'crit', 'ok'), "
            "band = case(severity_number >= 17, 'high', severity_number >= 13, 'mid', 'low'), "
            "n = strlen(body), joined = strcat_delim('-', severity_text, tostring(id)), "
            "dev = extract(r'/dev/(\\w+)', 1, body), "
            "sevl = tolower(severity_text), half = todouble(severity_number) / 2",
            {"logs": logs},
        )
        rows = {x.id: x for x in r.default.collect()}
        assert rows[1].tier == "crit" and rows[2].tier == "ok"
        assert rows[1].band == "high" and rows[3].band == "mid" and rows[5].band == "low"
        assert rows[2].n == len("started ok")
        assert rows[2].joined == "INFO-2"
        assert rows[1].dev == "sda" and rows[2].dev is None
        assert rows[1].sevl == "error" and rows[1].half == 8.5

    def test_summarize_by_expression_keys(self, spark):
        """KQL group_by_expression: `by alias = expr` and bare expressions
        (the canonical `summarize count() by bin(ts, 1h)` shape)."""
        df = spark.createDataFrame(
            [(1, "2026-01-01 00:02:00", "a"), (2, "2026-01-01 00:07:00", "a"),
             (3, "2026-01-01 00:08:00", "b")],
            "id int, t string, g string",
        ).select("id", F.col("t").cast("timestamp_ntz").alias("ts"), "g")
        r = run_opl(
            "logs | summarize n = count() by tb = bin(ts, 5m), g",
            {"logs": df},
        )
        got = {(x.tb.minute, x.g): x.n for x in r.default.collect()}
        assert got == {(0, "a"): 1, (5, "a"): 1, (5, "b"): 1}
        # bare expression key auto-aliases
        r2 = run_opl("logs | summarize n = count() by bin(ts, 5m)", {"logs": df})
        assert "key0" in r2.default.columns
        assert {x.n for x in r2.default.collect()} == {1, 2}

    def test_let_scalar_bindings(self, spark, logs):
        """let name = expr; ... (kql.pest variable_definition_expression);
        later lets may reference earlier ones."""
        r = run_opl(
            "let thresh = 13; let above = thresh + 4; "
            "logs | where severity_number >= above",
            {"logs": logs},
        )
        assert {x.id for x in r.default.collect()} == {1, 4}

    def test_let_user_defined_function(self, spark, logs):
        """let f = (params) { body }; — scalar UDF inlined at compile time
        (kql.pest:373-378), with typed params, defaults, and inner lets."""
        r = run_opl(
            "let tag = (s: string, prefix: string = 'sev=') { "
            "  let low = lower_case(s); concat(prefix, low) }; "
            "logs | set t1 = tag(severity_text), t2 = tag(severity_text, '>>')",
            {"logs": logs},
        )
        rows = {x.id: x for x in r.default.collect()}
        assert rows[1].t1 == "sev=error" and rows[1].t2 == ">>error"

    def test_let_function_in_summarize(self, spark, logs):
        r = run_opl(
            "let is_high = (n: long) { n >= 13 }; "
            "logs | where is_high(severity_number) "
            "| summarize n = count() by severity_text",
            {"logs": logs},
        )
        got = {x.severity_text: x.n for x in r.default.collect()}
        assert got == {"ERROR": 2, "WARN": 1}

    def test_bin_and_datetime(self, spark):
        """KQL bin(value, roundTo) with timespan literals (kql.pest:211,125)
        and the datetime() constructor."""
        df = spark.createDataFrame(
            [(1, "2026-01-01 00:07:31", 17.0), (2, "2026-01-01 00:12:02", 3.0)],
            "id int, t string, v double",
        ).select("id", F.col("t").cast("timestamp_ntz").alias("ts"), "v")
        r = run_opl(
            "logs | set tb = bin(ts, 5m), vb = bin(v, 5), "
            "cut = datetime('2026-01-01 00:10:00')",
            {"logs": df},
        )
        rows = {x.id: x for x in r.default.collect()}
        assert rows[1].tb.minute == 5 and rows[2].tb.minute == 10
        assert rows[1].vb == 15.0 and rows[2].vb == 0.0
        assert rows[1].cut.minute == 10

    def test_timestamp_tagged_literal(self, spark):
        """timestamp"<iso8601>" tagged literal (opl.pest:24,
        expression.rs:791-797)."""
        df = spark.createDataFrame(
            [(1, "2026-01-01 00:00:05"), (2, "2026-01-01 00:00:15")],
            "id int, t string",
        ).select("id", F.col("t").cast("timestamp_ntz").alias("ts"))
        r = run_opl(
            "logs | where ts < timestamp'2026-01-01T00:00:10Z'", {"logs": df}
        )
        assert {x.id for x in r.default.collect()} == {1}

    def test_uuid_functions(self, spark, logs):
        import uuid as _uuid

        r = run_opl("logs | set u4 = uuid(), u7 = uuidv7() | take 3", {"logs": logs})
        rows = r.default.collect()
        for x in rows:
            assert _uuid.UUID(x.u4).version == 4
            assert _uuid.UUID(x.u7).version == 7
        assert len({x.u4 for x in rows}) == 3  # random → distinct


class TestMakeSeries:
    def test_grid_and_defaults(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        rows = [("a", "2026-01-01 00:10:00", 1.0),
                ("a", "2026-01-01 02:20:00", 2.0),
                ("b", "2026-01-01 01:05:00", 5.0)]
        df = spark.createDataFrame(rows, "k string, ts string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        out = run_opl(
            "t | make-series n = count() default = 0, s = sum(v) default = -1.0 "
            "on ts step 1h by k", {"t": df}).default
        got = {r.k: (list(r.n), list(r.s), len(r.ts)) for r in out.collect()}
        # global grid 00:00..02:00 → 3 bins for every key
        assert got["a"] == ([1, 0, 1], [1.0, -1.0, 2.0], 3)
        assert got["b"] == ([0, 1, 0], [-1.0, 5.0, -1.0], 3)

    def test_no_keys_and_count_total(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = run_opl(
            "events | make-series n = count() default = 0 on ts step 6h",
            {"events": ev}).default
        r = out.collect()
        assert len(r) == 1
        assert sum(r[0]["n"]) == ev.count()
        assert len(r[0]["n"]) == len(r[0]["ts"])

    def test_errors(self, spark):
        from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl

        df = spark.createDataFrame([("a",)], "k string")
        import pytest as _pytest

        with _pytest.raises(OplSyntaxError, match="timespan"):
            run_opl("t | make-series n = count() on k step 5", {"t": df})
        with _pytest.raises(OplSyntaxError, match="step"):
            run_opl("t | make-series n = count() on k by k", {"t": df})


class TestParseKv:
    """KQL `parse-kv` statement: keyed extraction from key=value text,
    first occurrence wins, missing untyped keys '' / typed keys NULL."""

    def _df(self, spark):
        return spark.createDataFrame(
            [
                ("type=click user=7 val=3.25",),
                ("user=9 type=view extra=x type=dup",),
                ("no pairs here",),
            ],
            "line string",
        )

    def test_extract_defaults(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        r = run_opl(
            "t | parse-kv line as (type, user:long, val:real)",
            {"t": self._df(spark)},
        ).default.collect()
        assert (r[0].type, r[0].user, r[0].val) == ("click", 7, 3.25)
        # order-independent, first occurrence wins for duplicate keys
        assert (r[1].type, r[1].user, r[1].val) == ("view", 9, None)
        # no pairs: '' for untyped, NULL for typed
        assert (r[2].type, r[2].user, r[2].val) == ("", None, None)

    def test_custom_delimiters_and_key_prefix_safety(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        df = spark.createDataFrame(
            [("a:1;ba:2;b:3",)], "line string"
        )
        r = run_opl(
            "t | parse-kv line as (a:long, b:long) "
            "with (pair_delimiter=';', kv_delimiter=':')",
            {"t": df},
        ).default.collect()[0]
        # 'b' must not match inside 'ba' (pair-start anchor)
        assert (r.a, r.b) == (1, 3)

    def test_syntax_errors(self, spark):
        import pytest

        from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl

        df = self._df(spark)
        for bad in (
            "t | parse-kv line",
            "t | parse-kv line as ()",
            "t | parse-kv line as (a) with (pair_delimiter='||')",
            "t | parse-kv line as (a) with (frobnicate='x')",
            "t | parse-frobnicate line as (a)",
        ):
            with pytest.raises(OplSyntaxError):
                run_opl(bad, {"t": df})

    def test_plan_pure_expressions(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        df = run_opl(
            "t | parse-kv line as (type, user:long)", {"t": self._df(spark)}
        ).default
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "Exchange" not in plan

    def test_fuzz_matches_python_replay(self, spark):
        """Hypothesis: random key/value bags (values may contain the kv
        delimiter, keys may prefix each other) against a Python dict
        replay of first-occurrence-wins."""
        import re

        from hypothesis import given, settings, strategies as st

        from otel_arrow_spark.plans.opl import run_opl

        word = st.text(alphabet="abxy=", min_size=1, max_size=5).filter(
            lambda s: "=" != s[0]
        )
        key = st.sampled_from(["a", "ab", "b", "k9"])

        @settings(max_examples=8, deadline=None)
        @given(pairs=st.lists(st.tuples(key, word), min_size=0, max_size=6))
        def run(pairs):
            line = " ".join(f"{k}={v}" for k, v in pairs)
            df = spark.createDataFrame([(line,)], "line string")
            got = run_opl(
                "t | parse-kv line as (a, ab, b, k9)", {"t": df}
            ).default.collect()[0]
            want = {}
            for k in ("a", "ab", "b", "k9"):
                m = re.search(rf"(?:^|[ ]){re.escape(k)}=([^ ]*)", line)
                want[k] = m.group(1) if m else ""
            assert (got.a, got.ab, got.b, got.k9) == (
                want["a"], want["ab"], want["b"], want["k9"]), line

        run()


class TestKqlParse:
    """KQL `parse` statement: literal/capture patterns → one anchored
    regex, typed captures NULL on non-match, strings keep KQL's
    empty-string convention."""

    def _df(self, spark):
        return spark.createDataFrame(
            [
                ("CALL tool=tool_03 args_len=120 status=ok dur_ms=5",),
                ("CALL tool=tool_09 args_len=7 status=error dur_ms=1500",),
                ("INFO [planner] hello world",),
            ],
            "text string",
        )

    def test_typed_captures_and_null_on_no_match(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        r = run_opl(
            "t | parse text with 'CALL tool=' tool2 ' args_len=' alen:long"
            " ' status=' st ' dur_ms=' dur:long"
            " | project text, tool2, alen, st, dur",
            {"t": self._df(spark)},
        )
        rows = {x.text[:4]: x for x in r.default.collect()}
        call = rows["CALL"]
        assert call.tool2 in ("tool_03", "tool_09")
        assert rows["INFO"].dur is None and rows["INFO"].alen is None
        assert rows["INFO"].tool2 == ""  # KQL string convention
        assert r.default.filter("dur = 1500 and st = 'error'").count() == 1

    def test_star_skip_and_trailing_capture(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        r = run_opl(
            "t | parse text with * '[' comp ']' rest | project comp, rest",
            {"t": self._df(spark)},
        )
        got = {(x.comp, x.rest) for x in r.default.collect()}
        assert ("planner", " hello world") in got

    def test_regex_metachars_in_literals_are_escaped(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        df = spark.createDataFrame([("v=(1.5)+x",)], "text string")
        r = run_opl(
            "t | parse text with 'v=(' num:real ')+' tail | project num, tail",
            {"t": df},
        )
        [row] = r.default.collect()
        assert row.num == 1.5 and row.tail == "x"

    def test_plan_is_pure_expression(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        r = run_opl(
            "t | parse text with 'CALL tool=' tool2 ' dur_ms=' dur:long",
            {"t": self._df(spark)},
        )
        plan = r.default._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "Exchange" not in plan

    def test_syntax_errors(self, spark):
        import pytest as _pytest

        from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl

        df = self._df(spark)
        with _pytest.raises(OplSyntaxError, match="capture"):
            run_opl("t | parse text with 'only literal'", {"t": df})
        with _pytest.raises(OplSyntaxError, match="separated"):
            run_opl("t | parse text with 'x' a b", {"t": df})
        with _pytest.raises(OplSyntaxError, match="with"):
            run_opl("t | parse text 'x' a", {"t": df})


class TestTopHitters:
    def _events(self, spark):
        rows = []
        for t, users in (("A", [1, 1, 1, 2, 2, 3]), ("B", [7, 7, 8, 9]),
                         ("C", [5, 5])):
            rows += [(t, u, 10 * u) for u in users]
        return spark.createDataFrame(rows, "t string, u long, v long")

    def test_count_mode(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        out = run_opl("events | top-hitters 2 of t",
                      {"events": self._events(spark)}).default
        assert [(r.t, r.approximate_count_t) for r in out.collect()] == [
            ("A", 6), ("B", 4)]

    def test_sum_mode_and_tiebreak(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        # sums: A=100, B=310, C=100 → top-2 = B, then the A/C tie at 100
        # resolves value-asc → A
        out = run_opl("events | top-hitters 2 of t by v",
                      {"events": self._events(spark)}).default
        assert [(r.t, r.approximate_sum_v) for r in out.collect()] == [
            ("B", 310), ("A", 100)]
        out = run_opl("events | top-hitters 3 of u by v",
                      {"events": self._events(spark)}).default.collect()
        assert [(r.u, r.approximate_sum_v) for r in out] == [
            (7, 140), (5, 100), (9, 90)]

    def test_plan_is_takeordered_over_aggregate(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        df = run_opl("events | top-hitters 2 of t",
                     {"events": self._events(spark)}).default
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrdered" in plan and "HashAggregate" in plan

    def test_syntax_errors(self, spark):
        import pytest

        from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl

        ev = self._events(spark)
        for bad in (
            "events | top-hitters of t",
            "events | top-hitters 2 t",
            "events | top-hitters 2 of 5",
            "events | top-hitters 2 of t by 'v'",
            "events | top-frobnicate 2 of t",
        ):
            with pytest.raises(OplSyntaxError):
                run_opl(bad, {"events": ev})


class TestTopNested:
    def _events(self, spark):
        rows = []
        # type A: 6 rows, B: 4, C: 2 — top-2 types = A, B
        for t, users in (("A", [1, 1, 1, 2, 2, 3]), ("B", [7, 7, 8, 9]),
                         ("C", [5, 5])):
            rows += [(t, u, 10 * u) for u in users]
        return spark.createDataFrame(rows, "t string, u long, v long")

    def test_hierarchical_topk(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        out = run_opl(
            "events | top-nested 2 of t by count(), "
            "top-nested 2 of u by sum(v)",
            {"events": self._events(spark)},
        ).default
        got = sorted((r.t, r.aggregated_t, r.u, r.aggregated_u)
                     for r in out.collect())
        # A: u=2 sum 40 > u=1 sum 30 > u=3 sum 30... top-2 by sum desc,
        # tiebreak u asc: (2,40),(1,30). B: (7,140),(9,90) > (8,80)
        assert got == [
            ("A", 6, 1, 30), ("A", 6, 2, 40),
            ("B", 4, 7, 140), ("B", 4, 9, 90),
        ]

    def test_single_level_equals_plain_top_by_agg(self, spark):
        from otel_arrow_spark.plans.opl import run_opl

        out = run_opl(
            "events | top-nested 1 of t by count()",
            {"events": self._events(spark)},
        ).default.collect()
        assert [(r.t, r.aggregated_t) for r in out] == [("A", 6)]

    def test_syntax_errors(self, spark):
        import pytest

        from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl

        ev = self._events(spark)
        for bad in (
            "events | top-nested of t by count()",
            "events | top-nested 2 t by count()",
            "events | top-nested 2 of t count()",
            "events | top-nested 2 of t by u",
        ):
            with pytest.raises(OplSyntaxError):
                run_opl(bad, {"events": ev})
