"""Unit tests for the processor-style operators (filter, attributes,
sampling, flow control) — the analog of the reference's per-module
#[cfg(test)] suites (e.g. transform_processor/mod.rs:1311)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.operators.attributes import (
    attrs_delete,
    attrs_hash,
    attrs_insert,
    attrs_rename,
    attrs_update,
    attrs_upsert,
    apply_attributes_filter,
    collect_attrs,
    explode_attrs,
)
from otel_arrow_spark.operators.filter import MatchRules, cascade_filter, filter_processor
from otel_arrow_spark.operators.flow import conditional_branches, fork
from otel_arrow_spark.operators.route import route_by_value
from otel_arrow_spark.operators.sample import ratio_sample, zip_sample


@pytest.fixture(scope="module")
def attrs_df(spark):
    return spark.createDataFrame(
        [(1, {"env": "prod", "user": "alice"}), (2, {"env": "dev"}), (3, None)],
        "id int, attributes map<string,string>",
    )


def _attrs(df, rid):
    row = df.filter(F.col("id") == rid).collect()[0]
    return row.attributes


class TestAttributes:
    def test_insert_only_when_absent(self, attrs_df):
        out = attrs_insert(attrs_df, "attributes", "env", F.lit("X"))
        assert _attrs(out, 1)["env"] == "prod"  # present → untouched
        out2 = attrs_insert(attrs_df, "attributes", "region", F.lit("eu"))
        assert _attrs(out2, 1)["region"] == "eu"
        assert _attrs(out2, 3) == {"region": "eu"}  # null map → created

    def test_update_only_when_present(self, attrs_df):
        out = attrs_update(attrs_df, "attributes", "env", F.lit("stage"))
        assert _attrs(out, 1)["env"] == "stage"
        out2 = attrs_update(attrs_df, "attributes", "missing", F.lit("x"))
        assert "missing" not in (_attrs(out2, 1) or {})
        assert _attrs(out2, 3) is None

    def test_upsert(self, attrs_df):
        out = attrs_upsert(attrs_df, "attributes", "env", F.lit("stage"))
        assert _attrs(out, 1)["env"] == "stage"
        assert _attrs(out, 3) == {"env": "stage"}

    def test_delete(self, attrs_df):
        out = attrs_delete(attrs_df, "attributes", "env")
        assert "env" not in _attrs(out, 1)
        assert _attrs(out, 1)["user"] == "alice"

    def test_apply_actions_order_sensitivity(self, attrs_df):
        """Ordered Action list (attributes_processor/mod.rs:77):
        rename-then-hash hashes the value under the NEW key;
        hash-then-rename leaves the same bytes but proves order matters
        when the hash key refers to the renamed name."""
        import hashlib

        from otel_arrow_spark.operators.attributes import apply_actions

        a = apply_actions(
            attrs_df, "attributes",
            [("rename", "env", "env2"), ("hash", "env2", "s!")],
        )
        b = apply_actions(
            attrs_df, "attributes",
            [("hash", "env2", "s!"), ("rename", "env", "env2")],
        )
        want = hashlib.sha256(b"s!prod").hexdigest()
        assert _attrs(a, 1)["env2"] == want         # rename first → hashed
        assert _attrs(b, 1)["env2"] == "prod"       # hash saw no env2 → raw
        # insert/upsert/delete compose in order too
        c = apply_actions(
            attrs_df, "attributes",
            [("insert", "k", "v1"), ("upsert", "k", "v2"), ("delete", "k")],
        )
        assert "k" not in _attrs(c, 1)

    def test_rename(self, attrs_df):
        out = attrs_rename(attrs_df, "attributes", "env", "environment")
        assert _attrs(out, 1)["environment"] == "prod"
        assert "env" not in _attrs(out, 1)
        assert _attrs(out, 3) is None

    def test_hash_matches_sha256(self, attrs_df):
        import hashlib

        out = attrs_hash(attrs_df, "attributes", "user", salt="s!")
        expected = hashlib.sha256(b"s!alice").hexdigest()
        assert _attrs(out, 1)["user"] == expected
        assert _attrs(out, 1)["env"] == "prod"  # other keys untouched

    def test_apply_attributes_filter(self, attrs_df):
        out = apply_attributes_filter(
            attrs_df, "attributes", lambda k, v: k != F.lit("user")
        )
        assert _attrs(out, 1) == {"env": "prod"}

    def test_explode_collect_round_trip(self, attrs_df, spark):
        long = explode_attrs(attrs_df.filter("id < 3"), "attributes", ("id",))
        back = collect_attrs(long, ("id",))
        got = {r.id: r.attributes for r in back.collect()}
        assert got == {1: {"env": "prod", "user": "alice"}, 2: {"env": "dev"}}


class TestFilter:
    def test_strict_include_exclude(self, spark):
        df = spark.createDataFrame(
            [("ERROR",), ("WARN",), ("INFO",), (None,)], "sev string"
        )
        out = filter_processor(
            df,
            "sev",
            include=MatchRules("strict", ["ERROR", "WARN", "INFO"]),
            exclude=MatchRules("strict", ["INFO"]),
        )
        assert {r.sev for r in out.collect()} == {"ERROR", "WARN"}

    def test_regexp_match(self, spark):
        df = spark.createDataFrame([("abc-1",), ("xyz-2",), ("abc-9",)], "name string")
        out = filter_processor(df, "name", include=MatchRules("regexp", [r"^abc-\d$"]))
        assert out.count() == 2

    def test_cascade_filter(self, spark):
        root = spark.createDataFrame([(1, "keep"), (2, "drop")], "id int, v string")
        child = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "parent_id int, k string"
        )
        kept_root, kept_child = cascade_filter(root, child, F.col("v") == "keep")
        assert kept_root.count() == 1
        assert {r.k for r in kept_child.collect()} == {"a", "b"}


class TestRouting:
    def test_route_by_value_with_default(self, spark):
        df = spark.createDataFrame([("a",), ("b",), ("zz",)], "k string")
        out = route_by_value(df, "k", {"a": "s1", "b": "s2"}, default_route="fallback")
        got = {r.k: r.route for r in out.collect()}
        assert got == {"a": "s1", "b": "s2", "zz": "fallback"}

    def test_route_no_default_drops(self, spark):
        df = spark.createDataFrame([("a",), ("zz",)], "k string")
        out = route_by_value(df, "k", {"a": "s1"})
        assert out.count() == 1

    def test_case_insensitive(self, spark):
        df = spark.createDataFrame([("Prod",)], "k string")
        out = route_by_value(df, "k", {"prod": "s1"}, case_sensitive=False)
        assert out.collect()[0].route == "s1"


class TestSampling:
    def test_zip_caps_per_window(self, spark, tiny_transcripts):
        from otel_arrow_spark.operators.parse import parse_transcripts

        df = spark.read.parquet(tiny_transcripts)
        out = zip_sample(df, n_per_window=2, window_duration="1 hour")
        counts = (
            out.groupBy(F.window("ts", "1 hour")).count().agg(F.max("count")).collect()
        )
        assert counts[0][0] <= 2

    def test_ratio_sample_deterministic_and_partition_invariant(
        self, spark, tiny_transcripts
    ):
        df = spark.read.parquet(tiny_transcripts)
        a = ratio_sample(df, 1, 10, ("conv_id", "turn_idx"))
        b = ratio_sample(df.repartition(13), 1, 10, ("conv_id", "turn_idx"))
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        frac = a.count() / df.count()
        assert 0.05 < frac < 0.15


class TestFlow:
    def test_conditional_branches_exclusive_first_match(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], "x int")
        out = conditional_branches(
            df,
            [
                (F.col("x") < 3, lambda d: d.withColumn("b", F.lit("lo"))),
                (F.col("x") < 6, lambda d: d.withColumn("b", F.lit("mid"))),
            ],
            otherwise=lambda d: d.withColumn("b", F.lit("hi")),
        )
        got = {r.x: r.b for r in out.collect()}
        assert got == {0: "lo", 1: "lo", 2: "lo", 3: "mid", 4: "mid", 5: "mid",
                       6: "hi", 7: "hi", 8: "hi", 9: "hi"}
        assert out.count() == 10  # no row lost or duplicated

    def test_fork_duplicates(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "x int")
        outs = fork(df, [lambda d: d.filter("x=1"), lambda d: d.filter("x>=1")])
        assert [o.count() for o in outs] == [1, 2]
        df.unpersist()
