"""Expectations module: declarative DQ checks raise on violation and fold
into a single pass where possible (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartpool_bigdata_spark.expectations import (
    ExpectationError,
    ForeignKey,
    InRange,
    InSet,
    NotNull,
    PartitionedBy,
    RowCountBetween,
    Suite,
    Unique,
)


@pytest.fixture
def clean(spark):
    return spark.createDataFrame(
        [(1, "a", 7.0), (2, "b", 6.5), (3, "a", 8.1)],
        ["id", "kind", "ph"],
    )


def test_clean_df_passes_all(spark, clean):
    dim = spark.createDataFrame([("a",), ("b",)], ["k"])
    suite = (
        Suite()
        .add(NotNull(["id", "kind"]))
        .add(InSet("kind", ["a", "b"]))
        .add(InRange("ph", 0.0, 14.0))
        .add(RowCountBetween(1, 100))
        .add(Unique(["id"]))
        .add(ForeignKey("kind", dim, "k"))
    )
    suite.validate(clean)  # must not raise


def test_all_violations_reported_together(spark):
    df = spark.createDataFrame(
        [(1, None, 99.0), (1, "z", -3.0)],
        ["id", "kind", "ph"],
    )
    suite = (
        Suite()
        .add(NotNull(["kind"]))
        .add(InSet("kind", ["a", "b"]))
        .add(InRange("ph", 0.0, 14.0))
        .add(RowCountBetween(5))
        .add(Unique(["id"]))
    )
    with pytest.raises(ExpectationError) as exc:
        suite.validate(df)
    msg = str(exc.value)
    for frag in ("not_null", "in_set", "in_range", "row_count", "unique"):
        assert frag in msg, f"missing {frag} in: {msg}"


def test_foreign_key_orphan(spark, clean):
    dim = spark.createDataFrame([("a",)], ["k"])
    violations = Suite().add(ForeignKey("kind", dim, "k")).profile(clean)
    assert len(violations) == 1 and violations[0].check == "foreign_key"


def test_nulls_do_not_trip_domain_or_range(spark):
    df = spark.createDataFrame([(None, None)], "kind string, ph double")
    violations = (
        Suite().add(InSet("kind", ["a"])).add(InRange("ph", 0.0, 1.0)).profile(df)
    )
    assert violations == []


def test_partitioned_by(spark, clean, tmp_path):
    path = str(tmp_path / "t")
    clean.write.partitionBy("kind").parquet(path)
    assert PartitionedBy(path, ["kind"]).check() == []
    bad = PartitionedBy(path, ["ph"]).check()
    assert len(bad) == 1 and "ph" in bad[0].detail


def test_single_pass_fold(spark, clean):
    """Foldable checks produce one aggregate row, not one job per check."""
    suite = Suite().add(NotNull(["id"])).add(InRange("ph", 0.0, 14.0)).add(
        RowCountBetween(1)
    )
    aggs = [a for c in suite.checks for a in c.aggs()]
    assert len(clean.agg(*aggs).collect()) == 1


def test_audit_columns_injectable(spark, clean):
    from smartpool_bigdata_spark.ops import with_audit_columns

    out = with_audit_columns(
        clean, source="unit", ingest_ts=F.lit("2024-06-01 12:00:00").cast("timestamp")
    )
    row = out.select("_ingest_ts", "_ingest_date", "_source").first()
    assert str(row["_ingest_date"]) == "2024-06-01" and row["_source"] == "unit"


def test_observe_validates_during_action(spark, clean, tmp_path):
    """Suite.observe rides the foldable checks on the write action itself
    (zero extra scans); validate_observation raises from the observed
    metrics and still runs own-job checks when given the df."""
    suite = (
        Suite()
        .add(NotNull(["id", "kind"]))
        .add(InRange("ph", 0.0, 14.0))
        .add(RowCountBetween(1, 100))
        .add(Unique(["id"]))  # own-job: not foldable into the observation
    )
    observed, obs = suite.observe(clean)
    observed.write.mode("overwrite").parquet(str(tmp_path / "t"))  # the action
    suite.validate_observation(obs, clean)  # no violations -> no raise

    dirty = clean.union(
        spark.createDataFrame([(3, None, 99.0)], clean.schema)  # dup id, null kind, ph out
    )
    observed, obs = suite.observe(dirty)
    observed.write.mode("overwrite").parquet(str(tmp_path / "t2"))
    with pytest.raises(ExpectationError) as err:
        suite.validate_observation(obs, dirty)
    msg = str(err.value)
    assert "not_null" in msg and "in_range" in msg and "unique" in msg


def test_observe_with_no_foldable_checks(spark, clean):
    """No foldable checks -> no Observation (obs.get would block forever);
    own-job checks still run."""
    suite = Suite().add(Unique(["id"]))
    observed, obs = suite.observe(clean)
    assert obs is None
    observed.count()
    suite.validate_observation(obs, clean)  # clean id column -> passes


def test_duplicate_check_instances_get_unique_aliases(spark, clean):
    """Two same-typed checks on the same column (two InRange('ph', ...)
    with different bounds) must fold into ONE agg/observe list without
    alias collisions — and each must report against ITS OWN bounds
    (ADVICE.md r3: duplicate '__ir_ph' aliases failed analysis or read
    the wrong metric)."""
    suite = (
        Suite()
        .add(InRange("ph", 0.0, 14.0))   # passes on clean
        .add(InRange("ph", 7.0, 7.1))    # fails on clean (ph spans wider)
        .add(RowCountBetween(1, 100))
        .add(RowCountBetween(9999, None))  # fails: clean has few rows
    )
    violations = suite.profile(clean)
    kinds = sorted(str(v) for v in violations)
    assert len(violations) == 2
    assert any("[7.0, 7.1]" in v for v in kinds)
    assert any("[9999, None]" in v for v in kinds)

    observed, obs = suite.observe(clean)
    observed.count()
    with pytest.raises(ExpectationError) as err:
        suite.validate_observation(obs)
    assert "[7.0, 7.1]" in str(err.value) and "[9999, None]" in str(err.value)


def test_quarantine_split_first_match_wins(spark):
    """Ordered rules: a row matching several rules lands in exactly one
    bucket (the first); valid + invalid partitions the input."""
    from pyspark.sql import functions as F

    from smartpool_bigdata_spark.expectations import quarantine_split

    df = spark.createDataFrame(
        [(1, -5.0, "bogus"), (2, 3.0, "bogus"), (3, 4.0, "view"), (4, -1.0, "view")],
        "id int, value double, event_type string",
    )
    valid, invalid = quarantine_split(
        df,
        [
            ("neg_value", F.col("value") < 0),
            ("bad_type", F.col("event_type") == "bogus"),
        ],
    )
    got = {r["id"]: r["dq_reason"] for r in invalid.collect()}
    # id=1 matches BOTH rules -> first rule wins
    assert got == {1: "neg_value", 2: "bad_type", 4: "neg_value"}
    assert [r["id"] for r in valid.collect()] == [3]
    assert "dq_reason" not in valid.columns
    assert valid.count() + invalid.count() == df.count()


def test_quarantine_split_requires_rules(spark):
    import pytest as _pytest

    from smartpool_bigdata_spark.expectations import quarantine_split

    df = spark.range(3)
    with _pytest.raises(ValueError, match="at least one rule"):
        quarantine_split(df, [])


def test_grouped_cardinality_per_group_verdicts(spark):
    """DQ6 per-group cardinality (reference: 24 rows/day/region): the
    verdict is computed per group as a column expression, extra aggs
    ride the same hash aggregate, and both verdict values appear."""
    from smartpool_bigdata_spark.expectations import grouped_cardinality

    df = spark.createDataFrame(
        [("d1", "r1", 1.0), ("d1", "r1", 2.0), ("d1", "r2", 3.0),
         ("d2", "r1", 4.0), ("d2", "r1", 5.0), ("d2", "r1", 6.0)],
        ["day", "region", "v"],
    )
    out = grouped_cardinality(
        df,
        ["day", "region"],
        RowCountBetween(lo=2, hi=2),
        extra_aggs=[F.sum("v").alias("total_v")],
    )
    assert out.columns == ["day", "region", "n_rows", "total_v", "cardinality_check"]
    got = {
        (r["day"], r["region"]): (r["n_rows"], r["total_v"], r["cardinality_check"])
        for r in out.collect()
    }
    assert got == {
        ("d1", "r1"): (2, 3.0, "ok"),
        ("d1", "r2"): (1, 3.0, "VIOLATION:1"),
        ("d2", "r1"): (3, 15.0, "VIOLATION:3"),
    }
