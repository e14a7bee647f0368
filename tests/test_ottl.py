"""OTTL front-end tests: editor semantics, where-guards, statement
ordering, and OPL↔OTTL parity on the shared IR (the reference routes all
three languages into one PipelineExpression — transform_processor/
mod.rs:150-199)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.plans.opl import OplSyntaxError, run_opl
from otel_arrow_spark.plans.ottl import parse_statement, run_ottl


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "ERROR", "disk failure on /dev/sda", 17, {"env": "prod", "secret": "x"}),
        (2, "INFO", "started ok", 9, {"env": "dev"}),
        (3, "WARN", "retrying connection 123", 13, None),
        (4, "ERROR", "oom killed", 17, {"env": "prod", "svc": "db"}),
    ]
    return spark.createDataFrame(
        rows, "id int, severity_text string, body string, severity_number int, "
              "attributes map<string,string>"
    )


class TestParse:
    def test_statement_shapes(self):
        st = parse_statement('set(attributes["x"], "y") where id == 1')
        assert st.editor.name == "set" and st.where is not None
        st2 = parse_statement("set(a, b)")
        assert st2.where is None

    def test_nil_literal(self):
        st = parse_statement("set(a, nil)")
        from otel_arrow_spark.plans.opl import Lit

        assert isinstance(st.editor.args[1], Lit)
        assert st.editor.args[1].value is None

    def test_syntax_errors(self):
        for bad in ["set(a, b) trailing", "where x", "frobnicate(a)", "set(1, 2)"]:
            with pytest.raises(OplSyntaxError):
                run_ottl_noop(bad)


def run_ottl_noop(stmt):
    # parse-only helper: editors validate targets at compile time, so give
    # them a real (empty-plan) DataFrame via a lazy import of the fixture
    st = parse_statement(stmt)
    if st.editor.name not in {
        "set", "delete_key", "delete_matching_keys", "keep_keys",
        "keep_matching_keys", "replace_pattern", "replace_all_patterns",
        "truncate_all",
    }:
        raise OplSyntaxError("unknown editor")
    from otel_arrow_spark.plans.opl import Col, AttrAccess

    if st.editor.name == "set" and not isinstance(st.editor.args[0], (Col, AttrAccess)):
        raise OplSyntaxError("bad set target")
    return st


class TestEditors:
    def test_set_field_unconditional(self, spark, logs):
        out = run_ottl(logs, 'set(tier, "hot")')
        assert {r.tier for r in out.collect()} == {"hot"}
        assert out.count() == 4  # never filters rows

    def test_set_field_where_guard(self, spark, logs):
        out = run_ottl(logs, 'set(tier, "crit") where severity_number >= 17')
        got = {r.id: r.tier for r in out.collect()}
        assert got == {1: "crit", 4: "crit", 2: None, 3: None}

    def test_set_existing_field_preserved_outside_guard(self, spark, logs):
        out = run_ottl(logs, 'set(severity_text, "SEV") where id == 2')
        got = {r.id: r.severity_text for r in out.collect()}
        assert got == {1: "ERROR", 2: "SEV", 3: "WARN", 4: "ERROR"}

    def test_set_attribute_upsert(self, spark, logs):
        out = run_ottl(logs, 'set(attributes["checked"], "yes") where id != 2')
        rows = {r.id: r.attributes for r in out.collect()}
        assert rows[1]["checked"] == "yes" and rows[1]["env"] == "prod"
        assert rows[3] == {"checked": "yes"}  # null map → created
        assert rows[2] == {"env": "dev"}      # guard excluded

    def test_delete_key(self, spark, logs):
        out = run_ottl(logs, 'delete_key(attributes, "secret")')
        rows = {r.id: r.attributes for r in out.collect()}
        assert rows[1] == {"env": "prod"}
        assert rows[3] is None  # null map untouched

    def test_keep_keys(self, spark, logs):
        out = run_ottl(logs, 'keep_keys(attributes, ["env"])')
        rows = {r.id: r.attributes for r in out.collect()}
        assert rows[1] == {"env": "prod"} and rows[4] == {"env": "prod"}

    def test_matching_key_editors(self, spark, logs):
        out = run_ottl(logs, 'delete_matching_keys(attributes, "^sec")')
        assert {r.id: r.attributes for r in out.collect()}[1] == {"env": "prod"}
        out2 = run_ottl(logs, 'keep_matching_keys(attributes, "^s")')
        rows2 = {r.id: r.attributes for r in out2.collect()}
        assert rows2[1] == {"secret": "x"} and rows2[4] == {"svc": "db"}

    def test_replace_pattern_field_and_attr(self, spark, logs):
        out = run_ottl(logs, r'replace_pattern(body, "\d+", "#")')
        assert {r.id: r.body for r in out.collect()}[3] == "retrying connection #"
        out2 = run_ottl(logs, r'replace_pattern(attributes["env"], "prod", "PROD")')
        rows2 = {r.id: r.attributes for r in out2.collect()}
        assert rows2[1]["env"] == "PROD" and rows2[1]["secret"] == "x"

    def test_replace_all_patterns_and_truncate(self, spark, logs):
        out = run_ottl(logs, 'replace_all_patterns(attributes, "value", "^p", "P")')
        assert {r.id: r.attributes for r in out.collect()}[1]["env"] == "Prod"
        out2 = run_ottl(logs, 'replace_all_patterns(attributes, "key", "env", "ENV")')
        assert "ENV" in {r.id: r.attributes for r in out2.collect()}[1]
        out3 = run_ottl(logs, "truncate_all(attributes, 2)")
        assert {r.id: r.attributes for r in out3.collect()}[1] == {"env": "pr", "secret": "x"}

    def test_statement_list_order(self, spark, logs):
        # set then delete → key gone; delete then set → key present
        a = run_ottl(logs, ['set(attributes["k"], "v")', 'delete_key(attributes, "k")'])
        b = run_ottl(logs, ['delete_key(attributes, "k")', 'set(attributes["k"], "v")'])
        assert "k" not in a.collect()[0].attributes
        assert {r.id: r.attributes for r in b.collect()}[1]["k"] == "v"


class TestStreaming:
    def test_ottl_statements_run_on_streams(self, spark, tiny_transcripts, workdir):
        """OTTL statements are pure projections, so the same statement list
        runs unmodified on a streaming frame and matches the batch result
        (the shared-PipelineStage property)."""
        from otel_arrow_spark.sources.transcripts import transcripts_schema

        stmts = ['set(src, "x") where role == "user"',
                 'set(rl, toupper(role))']
        stream = spark.readStream.schema(transcripts_schema()).parquet(tiny_transcripts)
        out = f"{workdir}/ottl_stream"
        q = (
            run_ottl(stream, stmts)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", f"{workdir}/ottl_stream_ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.read.parquet(out)
        want = run_ottl(spark.read.parquet(tiny_transcripts), stmts)
        assert got.count() == want.count() > 0
        g = {(r.conv_id, r.turn_idx): (r.src, r.rl) for r in got.collect()}
        w = {(r.conv_id, r.turn_idx): (r.src, r.rl) for r in want.collect()}
        assert g == w


class TestParity:
    def test_opl_ottl_set_parity(self, spark, logs):
        """The same transform expressed in both languages compiles to the
        same result (shared IR, transform_processor/mod.rs:150-199)."""
        via_opl = run_opl(
            "logs | set tier = lower_case(severity_text), "
            "attributes['seen'] = 'y'",
            {"logs": logs},
        ).default
        via_ottl = run_ottl(
            logs,
            ['set(tier, lower_case(severity_text))', 'set(attributes["seen"], "y")'],
        )
        a = {(r.id, r.tier, tuple(sorted((r.attributes or {}).items())))
             for r in via_opl.collect()}
        b = {(r.id, r.tier, tuple(sorted((r.attributes or {}).items())))
             for r in via_ottl.collect()}
        assert a == b

    def test_single_project_plan(self, spark, logs):
        """Guarded editors collapse into projections — no filter/join/shuffle
        nodes appear in the plan."""
        out = run_ottl(
            logs,
            ['set(tier, "crit") where severity_number >= 17',
             'set(attributes["t"], tier)',
             'delete_key(attributes, "secret")'],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Filter" not in plan
