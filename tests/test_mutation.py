"""WritableTable copy-on-write mutation semantics (DeleteOperator parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensql_presto_spark.mutation import WritableTable

PATH = "spark-warehouse/mutation_unit_test"


def _fresh(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        ["k", "s", "v"],
    )
    return WritableTable.create(spark, PATH, df)


def test_delete_null_predicate_rows_survive(spark):
    t = _fresh(spark)
    t.delete(F.col("v") < 20)  # NULL v -> predicate NULL -> NOT deleted
    assert sorted(r.k for r in t.read().collect()) == [2, 3, 4]
    assert t.version == 1


def test_update_only_matching_rows(spark):
    t = _fresh(spark)
    t.update({"s": F.lit("X")}, F.col("k") % 2 == 1)
    got = {r.k: r.s for r in t.read().collect()}
    assert got == {1: "X", 2: "b", 3: "X", 4: None}


def test_merge_update_and_insert(spark):
    t = _fresh(spark)
    src = t.spark.createDataFrame([(3, 300.0), (9, 900.0)], ["k", "v"])
    t.merge(
        src,
        on=["k"],
        when_matched_update={"v": F.col("s_v")},
        when_not_matched_insert={
            "k": F.col("k"), "s": F.lit("new"), "v": F.col("s_v"),
        },
    )
    got = {r.k: (r.s, r.v) for r in t.read().collect()}
    assert got[3] == ("c", 300.0)
    assert got[9] == ("new", 900.0)
    assert got[1] == ("a", 10.0) and len(got) == 5


def test_merge_without_insert_keeps_target_keys(spark):
    t = _fresh(spark)
    src = t.spark.createDataFrame([(1, 111.0), (8, 888.0)], ["k", "v"])
    t.merge(src, on=["k"], when_matched_update={"v": F.col("s_v")})
    got = {r.k: r.v for r in t.read().collect()}
    assert got[1] == 111.0 and 8 not in got and len(got) == 4


def test_versions_accumulate_and_latest_wins(spark):
    t = _fresh(spark)
    t.delete(F.col("k") == 1)
    t.delete(F.col("k") == 2)
    assert t.version == 2
    assert sorted(r.k for r in t.read().collect()) == [3, 4]
