"""Schema-evolution tests: generation union semantics (SURVEY §1.4 —
Optional columns + dictionary width upgrade as parquet generations)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from otel_arrow_spark.sources.evolution import (
    evolved_union,
    merge_field_type,
    merge_schemas,
    read_evolving,
)


class TestMergeTypes:
    def test_int_and_float_widening(self):
        assert merge_field_type(T.IntegerType(), T.LongType()) == T.LongType()
        assert merge_field_type(T.LongType(), T.ByteType()) == T.LongType()
        assert merge_field_type(T.FloatType(), T.DoubleType()) == T.DoubleType()

    def test_non_widening_raises(self):
        with pytest.raises(TypeError):
            merge_field_type(T.StringType(), T.LongType())
        with pytest.raises(TypeError):
            merge_field_type(T.IntegerType(), T.DoubleType())  # int vs float: not a widening

    def test_merge_schemas_order_and_append(self):
        a = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType())])
        b = T.StructType([T.StructField("y", T.StringType()), T.StructField("x", T.LongType()),
                          T.StructField("z", T.DoubleType())])
        m = merge_schemas(a, b)
        assert [f.name for f in m.fields] == ["x", "y", "z"]
        assert m["x"].dataType == T.LongType()


class TestEvolvedUnion:
    def test_absent_column_nulls_and_widening(self, spark):
        g1 = spark.createDataFrame([(1, 1.5)], "id int, v float")
        g2 = spark.createDataFrame([(2, 2.5, "p")], "id long, v double, props string")
        out = evolved_union(g1, g2)
        assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
            "id": "bigint", "v": "double", "props": "string"
        }
        rows = {r.id: r for r in out.collect()}
        assert rows[1].props is None and rows[2].props == "p"
        assert rows[1].v == 1.5 and rows[2].v == 2.5

    def test_conflict_raises(self, spark):
        g1 = spark.createDataFrame([(1,)], "x int")
        g2 = spark.createDataFrame([("a",)], "x string")
        with pytest.raises(TypeError):
            evolved_union(g1, g2)

    def test_no_shuffle_no_python(self, spark):
        g1 = spark.createDataFrame([(1, 1.5)], "id int, v float")
        g2 = spark.createDataFrame([(2, 2.5, "p")], "id long, v double, props string")
        plan = evolved_union(g1, g2)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestReadEvolving:
    def test_two_generations(self, spark, workdir):
        spark.createDataFrame([(1, 10)], "id int, n int").write.parquet(f"{workdir}/gen1")
        spark.createDataFrame([(2, 20, "x")], "id long, n long, tag string").write.parquet(
            f"{workdir}/gen2"
        )
        out = read_evolving(spark, f"{workdir}/gen1", f"{workdir}/gen2")
        assert out.count() == 2
        assert out.schema["n"].dataType == T.LongType()

    def test_spark_merge_schema_rejects_widening(self, spark, workdir):
        """Documents WHY read_evolving exists: Spark's own mergeSchema
        handles added columns but refuses the width upgrade."""
        spark.createDataFrame([(1.5,)], "v float").write.parquet(f"{workdir}/mg/a")
        spark.createDataFrame([(2.5,)], "v double").write.parquet(f"{workdir}/mg/b")
        with pytest.raises(Exception, match="merge|MERGE|Merge"):
            spark.read.option("mergeSchema", "true").parquet(
                f"{workdir}/mg/a", f"{workdir}/mg/b"
            ).collect()
