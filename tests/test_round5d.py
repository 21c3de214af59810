"""Late-round-5 operators: PMI collocations, boilerplate-line profile,
k-anonymity audit, per-group staleness, corpus-concentration stats.

Each test pins exact values (hand-computed where feasible) plus the edge
cases the docstrings promise (empty inputs, single-token docs, NULL
timestamps, single-group Gini), and the scale-shape invariants that keep
these operators safe at 100 TB (no posting lists, totals derived from
aggregated frames)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_exact_value_and_cut(spark):
    from okay_spark.textops import pmi_collocations

    # "new york" appears 4 times; unigram counts and totals are exact.
    rows = [
        (1, "new york new york"),
        (2, "new york and new york"),
        (3, "old york old town"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = pmi_collocations(df, min_count=2, top_n=10).collect()
    by_pair = {(r.w1, r.w2): r for r in out}
    assert ("new", "york") in by_pair
    r = by_pair[("new", "york")]
    # bigram totals: doc1 has 3 pairs, doc2 4, doc3 3 -> nb = 10
    # unigrams: nu = 13; new=4, york=5
    assert (r.n_pair, r.n_w1, r.n_w2) == (4, 4, 5)
    expected = math.log((4 / 10) / ((4 / 13) * (5 / 13)))
    assert r.pmi == round(expected, 6)
    # min_count prunes: ("old", "york") occurs once -> absent
    assert ("old", "york") not in by_pair


def test_pmi_short_docs_never_crash(spark):
    from okay_spark.textops import pmi_collocations

    rows = [(1, ""), (2, "solo"), (3, "  "), (4, "a b a b a b a b")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = pmi_collocations(df, min_count=2, top_n=5).collect()
    # only doc 4 produces pairs: (a,b) x4, (b,a) x3
    assert {(r.w1, r.w2) for r in out} == {("a", "b"), ("b", "a")}


def test_pmi_tie_break_is_deterministic(spark):
    from okay_spark.textops import pmi_collocations

    # two pairs with identical counts -> identical PMI; cut of 1 must keep
    # the lexicographically smaller pair on any engine
    rows = [(i, "x y") for i in range(5)] + [(100 + i, "x z") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = pmi_collocations(df, min_count=2, top_n=1).collect()
    assert [(r.w1, r.w2) for r in out] == [("x", "y")]


# ---------------------------------------------------------------------------
# boilerplate_lines
# ---------------------------------------------------------------------------


def _lined(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, source: string, text: string")


def test_boilerplate_counts_distinct_docs(spark):
    from okay_spark.textops import boilerplate_lines

    footer = "all rights reserved"
    rows = [
        (1, "a", f"body one\n{footer}"),
        (2, "a", f"body two\n{footer}\n{footer}"),  # twice in ONE doc: counts once
        (3, "a", "body three"),
        (4, "b", f"other domain\n{footer}"),  # different group: not pooled
    ]
    out = boilerplate_lines(
        _lined(spark, rows), group_col="source", min_docs=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source, r.line, r.n_docs, r.n_docs_group) == ("a", footer, 2, 3)
    assert r.doc_frac == 2 / 3


def test_boilerplate_min_frac_and_ungrouped(spark):
    from okay_spark.textops import boilerplate_lines

    rows = [(i, "a", "shared line\nunique %d" % i) for i in range(10)]
    df = _lined(spark, rows)
    strict = boilerplate_lines(df, min_docs=2, min_frac=0.99).collect()
    assert [(r.line, r.n_docs, r.n_docs_group) for r in strict] == [
        ("shared line", 10, 10)
    ]
    # empty lines never flag
    rows2 = [(1, "a", "\n\nx"), (2, "a", "\n\nx")]
    out2 = boilerplate_lines(_lined(spark, rows2), min_docs=2).collect()
    assert [r.line for r in out2] == ["x"]


# ---------------------------------------------------------------------------
# k_anonymity_violations
# ---------------------------------------------------------------------------


def test_k_anonymity_flags_small_groups_and_nulls(spark):
    from okay_spark.checks import k_anonymity_violations

    rows = (
        [("us", "m")] * 5  # safe at k=5
        + [("us", "f")] * 4  # violating
        + [("de", None)] * 2  # NULL groups normally -> violating
        + [(None, None)]  # all-null singleton -> violating
    )
    df = spark.createDataFrame(rows, "country: string, gender: string")
    out = k_anonymity_violations(df, ["country", "gender"], k=5).collect()
    got = {(r.country, r.gender): r.n_rows for r in out}
    assert got == {("us", "f"): 4, ("de", None): 2, (None, None): 1}


# ---------------------------------------------------------------------------
# group_staleness
# ---------------------------------------------------------------------------


def test_group_staleness_microsecond_exact(spark):
    import datetime as dt

    from okay_spark.checks import group_staleness

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0),
        ("a", t0 + dt.timedelta(seconds=10, microseconds=250_000)),
        ("b", t0 + dt.timedelta(seconds=4)),
        ("c", None),  # only-NULL group: NULL bounds, NULL lag
        ("b", None),  # NULL inside a live group: counted, ignored by max
    ]
    df = spark.createDataFrame(rows, "g: string, ts: timestamp_ntz")
    out = {r.g: r for r in group_staleness(df, "ts", "g").collect()}
    assert out["a"].lag_seconds == 0.0
    assert out["b"].lag_seconds == 6.25  # exact micros / 1e6
    assert out["b"].n_rows == 2
    assert out["c"].max_ts is None and out["c"].lag_seconds is None


# ---------------------------------------------------------------------------
# concentration_stats
# ---------------------------------------------------------------------------


def test_concentration_known_distribution(spark):
    from okay_spark.balance import concentration_stats

    # counts: a=1, b=2, c=3, d=4 -> total 10
    rows = ["a"] + ["b"] * 2 + ["c"] * 3 + ["d"] * 4
    df = spark.createDataFrame([(g,) for g in rows], "g: string")
    r = concentration_stats(df, "g").collect()[0]
    assert (r.n_groups, r.n_rows) == (4, 10)
    assert r.top_share == 0.4
    # gini = (2*S - (n+1)*T) / (n*T), S = 1*1 + 2*2 + 3*3 + 4*4 = 30
    assert r.gini == (2 * 30 - 5 * 10) / (4 * 10)
    assert r.hhi == pytest.approx(0.01 + 0.04 + 0.09 + 0.16, abs=1e-12)


def test_concentration_edges(spark):
    from okay_spark.balance import concentration_stats

    one = spark.createDataFrame([("a",)] * 7, "g: string")
    r = concentration_stats(one, "g").collect()[0]
    assert (r.n_groups, r.n_rows, r.top_share, r.gini) == (1, 7, 1.0, 0.0)

    empty = spark.createDataFrame([], "g: string")
    r = concentration_stats(empty, "g").collect()[0]
    assert (r.n_groups, r.n_rows) == (0, 0)
    assert r.top_share is None and r.hhi is None and r.gini is None


# ---------------------------------------------------------------------------
# scale-shape pins
# ---------------------------------------------------------------------------


def test_pmi_and_staleness_scan_once(spark):
    """The totals (bigram/unigram sums, global max) must re-derive from the
    aggregated frames — the corpus scan appears once per frame in the plan,
    never a second df.count()-style pass (the key_skew_stats discipline)."""
    from okay_spark.checks import group_staleness

    df = spark.createDataFrame([("a", None)], "g: string, ts: timestamp_ntz")
    plan = group_staleness(df, "ts", "g")._jdf.queryExecution().toString()
    # one scan of the input: the LocalRelation/scan appears once outside
    # the broadcast of the 1-row global-max frame
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------


def test_mutual_information_exact_cases(spark):
    from okay_spark.checks import mutual_information

    # perfectly dependent: y == x -> mi == h_x == h_y == h_xy, nmi == 1
    dep = spark.createDataFrame(
        [("a", "a")] * 2 + [("b", "b")] * 2, "x: string, y: string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert r.n_rows == 4
    assert r.h_x == pytest.approx(math.log(2), abs=1e-12)
    assert r.mi == pytest.approx(math.log(2), abs=1e-12)
    assert r.nmi == pytest.approx(1.0, abs=1e-12)

    # independent 2x2 uniform: mi == 0 (up to float), h_xy == 2 ln 2
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(3)],
        "x: string, y: string",
    )
    r = mutual_information(ind, "x", "y").collect()[0]
    assert r.h_xy == pytest.approx(2 * math.log(2), abs=1e-12)
    assert abs(r.mi) < 1e-12

    # constant column: h_x == 0 -> nmi null; nulls excluded from the base
    const = spark.createDataFrame(
        [("k", "p"), ("k", "q"), ("k", None)], "x: string, y: string"
    )
    r = mutual_information(const, "x", "y").collect()[0]
    # h_x is 0 up to the decimal(38,12) term quantization (deterministic
    # and twin-replayed, not float noise)
    assert r.n_rows == 2 and abs(r.h_x) < 1e-12 and r.nmi is None

    # empty after null filtering: all-null guards
    r = mutual_information(
        spark.createDataFrame([(None, "p")], "x: string, y: string"), "x", "y"
    ).collect()[0]
    assert r.n_rows == 0 and r.mi is None


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------


def test_chi2_independence_exact_cases(spark):
    from okay_spark.checks import chi2_independence

    # perfect dependence 2x2 (2+2 rows): every cell term is exactly 1
    # -> chi2 == n == 4, V == 1, dof == 1
    dep = spark.createDataFrame(
        [("a", "a")] * 2 + [("b", "b")] * 2, "x: string, y: string"
    )
    r = chi2_independence(dep, "x", "y").collect()[0]
    assert (r.n_rows, r.n_x, r.n_y, r.dof) == (4, 2, 2, 1)
    assert r.chi2 == pytest.approx(4.0, abs=1e-12)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-12)

    # independent uniform 2x2: o == e exactly in every cell -> chi2 == 0.0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(3)],
        "x: string, y: string",
    )
    r = chi2_independence(ind, "x", "y").collect()[0]
    assert r.chi2 == 0.0 and r.cramers_v == 0.0 and r.dof == 1

    # observed-zero cells must contribute expected counts: 2x2 with one
    # empty cell — (a,p) 1, (a,q) 1, (b,p) 1, (b,q) 0. Hand-computed
    # chi2 = 3/4 (cells 1/6+1/6+... marginals cx=(2,1), cy=(2,1), n=3)
    sparse = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p")], "x: string, y: string"
    )
    r = chi2_independence(sparse, "x", "y").collect()[0]
    exp = (
        (1 - 4 / 3) ** 2 / (4 / 3)
        + (1 - 2 / 3) ** 2 / (2 / 3)
        + (1 - 2 / 3) ** 2 / (2 / 3)
        + (0 - 1 / 3) ** 2 / (1 / 3)
    )
    assert r.chi2 == pytest.approx(exp, rel=1e-9)

    # constant column: dof 0 -> V null; nulls excluded from the base
    const = spark.createDataFrame(
        [("k", "p"), ("k", "q"), ("k", None)], "x: string, y: string"
    )
    r = chi2_independence(const, "x", "y").collect()[0]
    assert (r.n_rows, r.n_x, r.dof) == (2, 1, 0) and r.cramers_v is None

    # empty after null filtering
    r = chi2_independence(
        spark.createDataFrame([(None, "p")], "x: string, y: string"), "x", "y"
    ).collect()[0]
    assert r.n_rows == 0 and r.chi2 is None and r.dof is None


# ---------------------------------------------------------------------------
# transition_stats
# ---------------------------------------------------------------------------


def test_transition_stats_exact(spark):
    from okay_spark.relops import transition_stats

    rows = [
        # user 1: A -> B -> A -> C  (ties broken by event_id)
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "C"),
        # user 2: A -> B (null state in the middle drops out, B and the
        # next A become adjacent) -> A
        (2, 1, "A"), (2, 2, None), (2, 3, "B"), (2, 4, "A"),
        # null user: never sequenced
        (None, 1, "A"), (None, 2, "B"),
        # user 3: single event — no transition
        (3, 1, "C"),
    ]
    df = spark.createDataFrame(
        [(u, i, s) for (u, i, s) in rows],
        "user_id: long, event_id: long, event_type: string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    # identical ts everywhere: event_id must carry the total order
    out = {
        (r.from_state, r.to_state): (r.cnt, r.prob)
        for r in transition_stats(df).collect()
    }
    assert out == {
        ("A", "B"): (2, 2 / 3),   # u1 A->B, u2 A->B
        ("A", "C"): (1, 1 / 3),   # u1 A->C
        ("B", "A"): (2, 1.0),     # u1 B->A, u2 B->A (across the null)
    }
    # probabilities leaving each state sum to 1 exactly on this data
    assert sum(p for (f, _), (_, p) in out.items() if f == "A") == 1.0


def test_cohort_retention_exact(spark):
    from okay_spark.relops import cohort_retention

    # week of 2026-01-05 (Mon) and 2026-01-12 (Mon):
    #   u1 first event Wed Jan 7, active again Jan 13 -> cohort 01-05,
    #     active weeks {01-05, 01-12}
    #   u2 first event Jan 12 -> cohort 01-12 only
    #   u3 two events same week -> ONE distinct row in its cohort week
    rows = [
        (1, "2026-01-07 10:00:00"),
        (1, "2026-01-13 09:00:00"),
        (2, "2026-01-12 00:00:00"),
        (3, "2026-01-06 08:00:00"),
        (3, "2026-01-09 23:59:59"),
        (None, "2026-01-07 10:00:00"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        (str(r.cohort_week), str(r.activity_week)): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert out == {
        ("2026-01-05", "2026-01-05"): 2,  # u1 + u3 cohort size
        ("2026-01-05", "2026-01-12"): 1,  # u1 retained
        ("2026-01-12", "2026-01-12"): 1,  # u2 cohort size
    }


def test_funnel_conversion_exact(spark):
    from okay_spark.relops import funnel_conversion

    rows = [
        # u1 completes the whole funnel in order
        (1, "2026-01-01 00:00:00", "view"),
        (1, "2026-01-01 00:01:00", "click"),
        (1, "2026-01-01 00:02:00", "purchase"),
        # u2 stops after click
        (2, "2026-01-01 00:00:00", "view"),
        (2, "2026-01-01 00:01:00", "click"),
        # u3 view only
        (3, "2026-01-01 00:00:00", "view"),
        # u4 clicks without a prior view -> never enters the funnel
        (4, "2026-01-01 00:01:00", "click"),
        # u5 equal timestamps: strictness does NOT advance the funnel
        (5, "2026-01-01 00:00:00", "view"),
        (5, "2026-01-01 00:00:00", "click"),
        # u6 purchase BEFORE click -> purchase step not credited
        (6, "2026-01-01 00:00:00", "view"),
        (6, "2026-01-01 00:02:00", "purchase"),
        (6, "2026-01-01 00:03:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: string, event_type: string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.step_index: (r.step_name, r.n_users, r.conversion)
        for r in funnel_conversion(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {
        1: ("view", 5, 1.0),
        2: ("click", 3, 3 / 5),   # u1, u2, u6
        3: ("purchase", 1, 1 / 5),  # u1 only
    }
    # empty first step: conversion NULL, counts 0
    out0 = {
        r.step_index: (r.n_users, r.conversion)
        for r in funnel_conversion(df, ["error", "view"]).collect()
    }
    assert out0 == {1: (0, None), 2: (0, None)}


def test_transition_stats_single_scan_and_plan(spark):
    from okay_spark.relops import transition_stats

    df = spark.createDataFrame(
        [(1, i, "2026-01-01 00:00:00", t) for i, t in enumerate("ABAB")],
        "user_id: long, event_id: long, ts: string, event_type: string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = transition_stats(df)
    assert r.count() == 2
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the totals join is broadcast, never a shuffled join of the frame
    assert "SortMergeJoin" not in plan
