"""Property tests for the continuation-session statistics: each operator's
distributed counts-frame formulation must equal a naive pure-Python
reference on randomized inputs (the hypothesis strategy keeps cardinality
low so ties — the hard part of every rank statistic — are exercised
heavily)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# low-cardinality values so ties occur constantly
vals = st.integers(min_value=0, max_value=6)
rows = st.lists(st.tuples(vals, st.booleans()), min_size=2, max_size=40)
pairs = st.lists(st.tuples(vals, vals), min_size=3, max_size=40)


def naive_auc(data):
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def ranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    r = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            r[order[k]] = avg
        i = j + 1
    return r


def naive_spearman(data):
    xs = [a for a, _ in data]
    ys = [b for _, b in data]
    rx, ry = ranks(xs), ranks(ys)
    n = len(data)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    if dx == 0 or dy == 0:
        return None
    return num / (dx * dy)


def naive_kendall_tau_b(data):
    n = len(data)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            xa, ya = data[i]
            xb, yb = data[j]
            if xa == xb and ya == yb:
                tx += 1
                ty += 1
            elif xa == xb:
                tx += 1
            elif ya == yb:
                ty += 1
            elif (xa < xb) == (ya < yb):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) / 2
    if n0 - tx <= 0 or n0 - ty <= 0:
        return None
    return (c - d) / math.sqrt((n0 - tx) * (n0 - ty))


def naive_gini(xs):
    xs = sorted(xs)
    n = len(xs)
    total = sum(xs)
    if total == 0:
        return None
    rank_sum = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * rank_sum - (n + 1) * total) / (n * total)


def naive_w1(a, b):
    if not a or not b:
        return None
    support = sorted(set(a) | set(b))
    w = 0.0
    ca = cb = 0
    for v, nxt in zip(support, support[1:]):
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        w += abs(ca / len(a) - cb / len(b)) * (nxt - v)
    return w


@SET
@given(rows)
def test_roc_auc_matches_pair_counting(spark, data):
    from okay_spark.checks import roc_auc

    df = spark.createDataFrame(
        [(float(s), y) for s, y in data], "s double, y boolean"
    )
    got = roc_auc(df, F.col("s"), F.col("y")).collect()[0]["auc"]
    want = naive_auc(data)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-6)


@SET
@given(pairs)
def test_spearman_matches_rank_pearson(spark, data):
    from okay_spark.checks import spearman_corr

    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in data], "x double, y double"
    )
    got = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["rho"]
    want = naive_spearman(data)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-6)


@SET
@given(pairs)
def test_kendall_matches_pair_counting(spark, data):
    from okay_spark.checks import kendall_tau_b

    df = spark.createDataFrame(data, "x int, y int")
    got = kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0]["tau_b"]
    want = naive_kendall_tau_b(data)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-6)


@SET
@given(st.lists(vals, min_size=1, max_size=40))
def test_gini_matches_sorted_rank_identity(spark, xs):
    from okay_spark.checks import gini_inequality

    df = spark.createDataFrame([("g", int(x)) for x in xs], "g string, v bigint")
    got = gini_inequality(df, "g", "v").collect()[0]["gini"]
    want = naive_gini(xs)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-6)


@SET
@given(st.lists(vals, min_size=1, max_size=25), st.lists(vals, min_size=1, max_size=25))
def test_wasserstein_matches_cdf_integral(spark, a, b):
    from okay_spark.checks import wasserstein_exact

    rows_ab = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows_ab, "g string, v double")
    got = wasserstein_exact(df, "v", "g", "a", "b").collect()[0]["w1"]
    want = naive_w1(a, b)
    assert got == pytest.approx(want, abs=1e-6)
