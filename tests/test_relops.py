"""Relational pipeline operators: sessionize, as-of join, range join,
distinct counts — golden assertions on hand-built frames plus a pandas
merge_asof differential check."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from okay_spark.relops import asof_join, range_join, session_stats, sessionize


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a >30s gap
        (1, _ts(0), 1.0),
        (1, _ts(0, 10), 2.0),
        (1, _ts(0, 50), 3.0),  # 40s gap -> new session
        # user 2: one session, microsecond-close events
        (2, _ts(5, 0, 1), 4.0),
        (2, _ts(5, 0, 2), 5.0),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, value double")


def test_sessionize_gap_boundary_is_strict(spark, events):
    out = sessionize(events, gap_seconds=30.0).orderBy("user_id", "ts").collect()
    assert [(r["user_id"], r["session_idx"]) for r in out] == [
        (1, 1),
        (1, 1),
        (1, 2),
        (2, 1),
        (2, 1),
    ]
    # exactly-30s gap stays in session (strict >)
    ev = spark.createDataFrame(
        [(9, _ts(0), 0.0), (9, _ts(0, 30), 0.0)], "user_id int, ts timestamp, value double"
    )
    got = sessionize(ev, gap_seconds=30.0).agg(F.max("session_idx")).first()[0]
    assert got == 1


def test_session_stats(events):
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(events, gap_seconds=30.0).collect()
    }
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["duration_sec"] == 10.0
    assert s11["sum_value"] == 3.0
    assert out[(2, 1)]["duration_sec"] == pytest.approx(1e-6)


def test_asof_join_backward_with_ties_and_left_nulls(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (2, _ts(1), "p3")],
        "k int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "c1"), (1, _ts(10), "c2"), (1, _ts(15), "c3"), (3, _ts(0), "cx")],
        "k int, rts timestamp, cid string",
    )
    out = {
        r["pid"]: r["cid"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["cid"]
        ).collect()
    }
    # equal timestamps match (<= semantics); key 2 has no right rows -> null
    assert out == {"p1": "c2", "p2": "c3", "p3": None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(10), "p1")], "k int, ts timestamp, pid string")
    right = spark.createDataFrame([(1, _ts(0), "c1")], "k int, rts timestamp, cid string")
    kw = dict(on="k", left_ts="ts", right_ts="rts", right_cols=["cid"])
    assert asof_join(left, right, tolerance_seconds=599.0, **kw).first()["cid"] is None
    assert asof_join(left, right, tolerance_seconds=600.0, **kw).first()["cid"] == "c1"


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_l),
            "ts": pd.to_datetime(rng.randint(0, 10**6, n_l) * 1000, unit="us"),
            "lid": np.arange(n_l),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_r),
            "rts": pd.to_datetime(rng.randint(0, 10**6, n_r) * 1000, unit="us"),
            "rid": np.arange(n_r),
        }
    )
    # merge_asof demands unique sort keys per group for determinism
    rpdf = rpdf.drop_duplicates(subset=["k", "rts"])
    want = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    ).set_index("lid")["rid"]
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_cols=["rid"],
    ).collect()
    for r in got:
        w = want.loc[r["lid"]]
        if r["rid"] is None:
            assert pd.isna(w)
        else:
            assert r["rid"] == w


def test_range_join_bands_and_plan(spark):
    fact = spark.createDataFrame(
        [(0.0,), (4.99,), (5.0,), (99.0,), (-1.0,)], "value double"
    )
    bands = [("lo", 0.0, 5.0), ("hi", 5.0, 100.0)]
    out = range_join(fact, bands, value_col="value")
    got = {r["value"]: r["band"] for r in out.collect()}
    assert got == {0.0: "lo", 4.99: "lo", 5.0: "hi", 99.0: "hi", -1.0: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_distinct_counts_exact_and_approx(spark):
    from okay_spark.checks import approx_distinct_counts, distinct_counts

    df = spark.range(0, 10_000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 7).alias("b"), F.lit(None).cast("string").alias("c")
    )
    exact = {r["col_name"]: r["n_distinct"] for r in distinct_counts(df, ["a", "b", "c"]).collect()}
    assert exact == {"a": 97, "b": 7, "c": 0}
    approx = {
        r["col_name"]: r["n_distinct_approx"]
        for r in approx_distinct_counts(df, ["a", "b", "c"], rsd=0.02).collect()
    }
    assert approx["b"] == 7 and approx["c"] == 0
    assert abs(approx["a"] - 97) <= 0.1 * 97


def test_session_window_stats_agrees_with_windowed(spark):
    from okay_spark.relops import session_stats, session_window_stats

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("ts").isNotNull()
    )
    a = {
        (r["user_id"], r["t_start"]): (r["n_events"], r["sum_value"])
        for r in session_stats(ev, gap_seconds=1800.0).collect()
    }
    b = {
        (r["user_id"], r["t_start"]): (r["n_events"], r["sum_value"])
        for r in session_window_stats(ev, gap="30 minutes").collect()
    }
    assert a == b


def test_session_window_boundary_agrees(spark, events):
    """Exactly-gap event merges under BOTH formulations (session_window
    extends through ts+gap inclusive; sessionize splits on strict > gap)."""
    from okay_spark.relops import session_window_stats, sessionize

    ev = spark.createDataFrame(
        [(9, _ts(0), 0.0), (9, _ts(0, 30), 0.0)], "user_id int, ts timestamp, value double"
    )
    assert sessionize(ev, gap_seconds=30.0).agg(F.max("session_idx")).first()[0] == 1
    assert session_window_stats(ev, gap="30 seconds").count() == 1
    # one microsecond past the gap splits both
    ev2 = spark.createDataFrame(
        [(9, _ts(0), 0.0), (9, _ts(0, 30, 1), 0.0)], "user_id int, ts timestamp, value double"
    )
    assert sessionize(ev2, gap_seconds=30.0).agg(F.max("session_idx")).first()[0] == 2
    assert session_window_stats(ev2, gap="30 seconds").count() == 2


def test_heavy_hitters_and_entropy(spark):
    import math

    from okay_spark.checks import column_entropy, heavy_hitters

    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 700, F.lit("hot")).otherwise(F.col("id").cast("string")).alias("k"),
        F.lit("const").alias("c"),
        (F.col("id") % 4).cast("string").alias("u"),
    )
    hh = heavy_hitters(df, "k", k=3).collect()
    assert hh[0]["value"] == "hot" and hh[0]["cnt"] == 700 and hh[0]["share"] == 0.7
    ent = {r["col_name"]: r["entropy_nats"] for r in column_entropy(df, ["c", "u"]).collect()}
    assert ent["c"] == 0.0  # constant column
    assert abs(ent["u"] - math.log(4)) < 1e-6  # uniform over 4 values


def test_sessionize_single_window_exchange(spark, events):
    """lag + running sum must share one sort/partitioning: no second exchange."""
    plan = sessionize(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
