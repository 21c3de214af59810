"""Relational pipeline operators: sessionization, as-of join, range join.

The reference has no joins or windows at all (single-document validator —
``/root/reference/docs/user-guide.md:529``); these are engine-level
operations a large-scale training-data pipeline needs around validation
(event sessionization for per-session rules, as-of alignment of feature
streams, banded range classification). All are pure DataFrame plans:

- ``sessionize``      one shuffle on the user key (window lag + running sum);
- ``asof_join``       the union/last-value formulation — ONE shuffle on the
                      join key, no range explosion, no per-row Python; this
                      is the scalable shape (a naive join + groupBy max would
                      shuffle the full cross product of key matches);
- ``range_join``      broadcast nested-loop against a tiny bands dim — the
                      right physical plan when the dim is a handful of rows.

Timestamp arithmetic uses ``timestamp_diff(MICROSECOND, ...)`` which is
timezone-free and exact for TIMESTAMP and TIMESTAMP_NTZ alike (casting NTZ
through double/long is both forbidden and session-timezone-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import DataType, DateType, TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType, DateType)


def _is_ts(dtype: DataType) -> bool:
    return isinstance(dtype, _TS_TYPES)


def epoch_seconds(col: Column, dtype: DataType) -> Column:
    """Microsecond-exact epoch seconds as double, timezone-free: micros since
    1970-01-01 00:00:00 in the column's own type (NTZ stays naive — matches
    DuckDB ``epoch_us`` semantics on naive timestamps)."""
    zero = F.lit("1970-01-01 00:00:00").cast(dtype.simpleString())
    return F.timestamp_diff("MICROSECOND", zero, col) / F.lit(1e6)


def diff_seconds(later: Column, earlier: Column, dtype: DataType) -> Column:
    """(later - earlier) in seconds; microsecond-exact for timestamp types,
    plain subtraction for numeric ordering columns."""
    if _is_ts(dtype):
        return F.timestamp_diff("MICROSECOND", earlier, later) / F.lit(1e6)
    return later.cast("double") - earlier.cast("double")


def decimal_sum(col: Column | str, *, scale: int = 12) -> Column:
    """Order-independent sum of a double column: sum in ``decimal(38, scale)``
    (exact, associative) and cast back to double. A plain ``sum(double)``
    accumulates in binary floating point, so the result's last ulp depends on
    partial-aggregation order — which varies with partitioning run to run and
    flips rounded digits sitting on a rounding boundary (the one flaky oracle
    cell of round 1). Decimal summation is exact, so any partitioning yields
    the identical bit pattern — and DuckDB's ``SUM(CAST(x AS DECIMAL(38,12)))``
    reproduces it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def decimal_avg(col: Column | str, *, scale: int = 12) -> Column:
    """Order-independent mean: exact decimal sum divided by the non-null
    count (both deterministic), NULL for empty groups (ANSI-safe: the
    division is guarded, never 0-divide)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    return F.when(n > 0, decimal_sum(c, scale=scale) / n)


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    out: str = "session_idx",
) -> DataFrame:
    """Assign per-user session indices: a new session starts when the gap to
    the previous event exceeds ``gap_seconds`` (strict).

    One hash shuffle on ``user_col``; the two window functions (lag + running
    sum) share the same partitioning/ordering so Catalyst plans a single
    sort+Window pipeline — no second exchange."""
    dtype = df.schema[ts_col].dataType
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = diff_seconds(F.col(ts_col), prev, dtype)
    is_new = F.when(prev.isNull() | (gap > F.lit(gap_seconds)), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, F.sum(is_new).over(running))


def transition_stats(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    state_col: str = "event_type",
) -> DataFrame:
    """Per-group ordered state-transition profile — the empirical Markov
    matrix of the event flow. One row per observed ``(from_state,
    to_state)`` pair: ``cnt`` transitions, ``prob = cnt / (all transitions
    leaving from_state)``. Reads: a funnel whose checkout -> payment row
    suddenly halves, or a bot whose self-loop probability spikes toward 1,
    shows up as drift in this frame (feed consecutive snapshots to
    :func:`okay_spark.checks.js_divergence_frame`). Complements
    :func:`sessionize` (gap structure) with the ORDER structure of the
    same event streams, and :func:`okay_spark.checks.
    adjacent_pair_violations` (a hard rule on consecutive elements) with
    the soft distribution over them.

    Semantics: rows with a null group or null state are dropped BEFORE
    sequencing (the surviving events become adjacent — nulls are the
    battery's null_value rule, not a state); each group's first surviving
    event has no predecessor and opens no transition. ``order_cols`` must
    be a TOTAL order within a group (the default adds ``event_id`` to
    break timestamp ties) — with ties left unresolved the lag pairing is
    engine- and partitioning-dependent.

    Exactness: ``cnt`` is an exact count; ``prob`` is ONE int/int IEEE
    division (never a float sum), so the DuckDB twin is bit-identical —
    the twin's window must spell ``ASC NULLS FIRST`` (Spark's default
    ascending null placement; DuckDB defaults to NULLS LAST).

    Scale shape: ONE hash shuffle on ``group_col`` for the lag window
    (offset frame — the sort is per-group, bounded by the group's event
    count, never a global sort), then a hash aggregate down to the
    |states|^2-bounded transition frame (lazily localCheckpoint-ed); the
    per-from totals re-aggregate that bounded frame and broadcast back —
    the event table is scanned once."""
    g, s = F.col(group_col), F.col(state_col)
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    trans = (
        df.filter(g.isNotNull() & s.isNotNull())
        .select(F.lag(s).over(w).alias("from_state"), s.alias("to_state"))
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # feeds both the output rows and the per-from totals — one evaluation
        .localCheckpoint(eager=False)
    )
    # fresh _gfrom alias: the totals frame joins back onto trans, and
    # reusing trans's own attribute id would trip the self-join resolver
    totals = trans.groupBy(F.col("from_state").alias("_gfrom")).agg(
        F.sum("cnt").cast("bigint").alias("_tot")
    )
    return (
        trans.join(F.broadcast(totals), trans["from_state"] == F.col("_gfrom"))
        .select(
            "from_state",
            "to_state",
            "cnt",
            (F.col("cnt").cast("double") / F.col("_tot").cast("double")).alias(
                "prob"
            ),
        )
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: one row per ``(cohort_week,
    activity_week)`` with the exact count of that cohort's users active in
    that week. A user's cohort is the Monday-truncated week of their FIRST
    event; ``cohort_week = activity_week`` rows are the cohort sizes, and
    each later column over a fixed cohort is the classic retention curve.
    Reads: a week whose retention column sags across ALL cohorts is a
    product/ingest regression; a single cohort sagging is an acquisition-
    quality signal. Complements :func:`sessionize` (within-visit
    structure) and :func:`okay_spark.checks.group_staleness` (last-seen
    lag) with the long-horizon return structure.

    Semantics: rows with a null user or null timestamp are dropped (no
    cohort to anchor). Output weeks are DATE-typed Mondays — consumers
    derive the period index as ``datediff / 7``; keeping the raw weeks
    avoids an engine-specific integer-division seam. Counts are exact
    distinct users (two-phase — never ``count_distinct`` over a raw
    shuffle of the fact table). Week truncation is Monday-anchored on
    both engines (Spark ``date_trunc('week')`` and DuckDB agree), so the
    twin is bit-identical with no float anywhere.

    Scale shape: per-user first-event aggregate (map-side combinable hash
    shuffle on the user — the ONE fact-table shuffle), the cohort joined
    back user-to-user (co-partitioned with the aggregate's output — AQE
    reuses the exchange; the firsts side is #users rows, not events),
    then the distinct (cohort, week, user) pre-pass and the final
    (cohort, week) count re-aggregate frames already bounded by #users x
    #active-weeks. Per-key state everywhere is bounded by one user's
    event count — a bot user is a wide group, never a wide reducer
    posting list."""
    u, t = F.col(user_col), F.col(ts_col)
    base = df.filter(u.isNotNull() & t.isNotNull()).select(
        u.alias("_u"), t.alias("_t")
    )
    # fresh _fu alias: firsts joins back onto base, and reusing base's own
    # attribute id would trip the ambiguous-self-join resolver
    firsts = base.groupBy(F.col("_u").alias("_fu")).agg(
        F.date_trunc("week", F.min("_t")).cast("date").alias("cohort_week")
    )
    return (
        base.join(firsts, base["_u"] == F.col("_fu"))
        .select(
            "cohort_week",
            F.date_trunc("week", base["_t"]).cast("date").alias("activity_week"),
            base["_u"].alias("_user"),
        )
        # two-phase exact distinct: collapse to (cohort, week, user) FIRST
        .groupBy("cohort_week", "activity_week", "_user")
        .agg(F.lit(1).alias("_one"))
        .groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many users completed steps
    ``1..k`` IN ORDER (each step strictly after the previous one's first
    completion). One row per step: ``(step_index, step_name, n_users,
    conversion)`` with ``conversion = n_users / n_users(step 1)`` — the
    classic signup -> activation -> purchase curve, and the third member
    of the event-flow family (:func:`transition_stats` = local order
    structure, :func:`cohort_retention` = long-horizon return,
    this = directed multi-step completion).

    Semantics: a user completes step i at the MINIMUM timestamp of a
    step-i event STRICTLY after their step-(i-1) completion time (first-
    touch attribution; equal timestamps do NOT advance the funnel —
    strictness makes the result independent of any within-timestamp
    ordering, so no tiebreak column is needed). Rows with a null user,
    null timestamp, or a state outside ``steps`` are ignored. Repeated
    step names are allowed (``A -> A`` requires two strictly-increasing
    A events). ``conversion`` is NULL when step 1 has no completions.

    Exactness: completion times are exact MINs; counts are exact;
    ``conversion`` is ONE int/int IEEE division — nothing engine-specific
    anywhere, so the DuckDB twin (chained min-after joins) is
    bit-identical.

    Scale shape: the fact table is projected/filtered to the funnel's
    event types ONCE (lazily localCheckpoint-ed — each of the k steps
    re-reads that materialized frame, not the corpus); every chaining
    join is user-to-user between per-user frames (co-partitioned with the
    step aggregates), and per-key state is bounded by one user's event
    count. The k step counts are single-row aggregates of #users-bounded
    frames unioned into a k-row result."""
    if not steps:
        raise ValueError("funnel_conversion needs at least one step")
    u, t, s = F.col(user_col), F.col(ts_col), F.col(state_col)
    base = (
        df.filter(u.isNotNull() & t.isNotNull() & s.isin(list(steps)))
        .select(u.alias("_u"), t.alias("_t"), s.alias("_s"))
        # every step re-reads this bounded projection, not the corpus
        .localCheckpoint(eager=False)
    )
    cur = (
        base.filter(F.col("_s") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_done"))
    )
    counts = [cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))]
    for step in steps[1:]:
        # fresh _pu alias per round: cur joins back onto base's lineage
        prev = cur.select(F.col("_u").alias("_pu"), F.col("_done").alias("_pt"))
        cur = (
            base.filter(F.col("_s") == step)
            .join(prev, F.col("_u") == F.col("_pu"))
            .filter(F.col("_t") > F.col("_pt"))
            .groupBy("_u")
            .agg(F.min("_t").alias("_done"))
        )
        counts.append(cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))
    spark = df.sparkSession
    labeled = None
    for i, c in enumerate(counts):
        row = c.select(
            F.lit(i + 1).cast("int").alias("step_index"),
            F.lit(steps[i]).alias("step_name"),
            "n_users",
        )
        labeled = row if labeled is None else labeled.unionByName(row)
    first = counts[0].select(F.col("n_users").alias("_n1"))
    return labeled.crossJoin(F.broadcast(first)).select(
        "step_index",
        "step_name",
        "n_users",
        F.when(
            F.col("_n1") > 0,
            F.col("n_users").cast("double") / F.col("_n1").cast("double"),
        ).alias("conversion"),
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates (events, span, value sum) on top of
    :func:`sessionize`. The groupBy reuses the sessionize shuffle's
    partitioning (both key on ``user_col``), so no second full exchange of
    the event rows is needed."""
    dtype = df.schema[ts_col].dataType
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
    ]
    if value_col is not None:
        aggs.append(F.round(decimal_sum(value_col), 4).alias("sum_value"))
    out = s.groupBy(F.col(user_col), F.col("session_idx")).agg(*aggs)
    return out.withColumn(
        "duration_sec",
        F.round(diff_seconds(F.col("t_end"), F.col("t_start"), dtype), 6),
    )


def session_window_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates via Spark's native ``session_window`` — the
    idiomatic grouped-session aggregation (one shuffle, merge-able session
    state, works unchanged on a STREAMING DataFrame with a watermark, which
    the window-function formulation in :func:`session_stats` cannot).

    Boundary semantics match :func:`sessionize` exactly: an event exactly
    ``gap`` after the previous one MERGES into the session (session_window
    extends through ``ts + gap`` inclusive; sessionize splits only on strict
    ``> gap``) — asserted by the conformance tests, including the boundary
    case."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
    ]
    if value_col is not None:
        aggs.append(F.round(decimal_sum(value_col), 4).alias("sum_value"))
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("__w"))
        .agg(*aggs)
        .drop("__w")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key (ties on equal
    timestamps take the right row — the "<=" side).

    Scalable formulation: tag and union both sides, one hash shuffle on the
    key, then ``last(..., ignorenulls=True)`` over a running window carries
    the most recent right payload forward — O(n log n) per key, never a
    key-match cross product. Equivalent to DuckDB/pandas ASOF JOIN (the
    conformance oracle uses DuckDB's native ``ASOF LEFT JOIN``).
    """
    dtype = right.schema[right_ts].dataType
    lcols = list(left.columns)
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast(dtype.simpleString()).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        within = diff_seconds(F.col("__ts"), F.col("__match.__rts"), dtype) <= F.lit(
            tolerance_seconds
        )
        out = out.withColumn("__match", F.when(within, F.col("__match")))
    sel = [F.col(c) for c in lcols] + [
        F.col(f"__match.{c}").alias(c + suffix if c in lcols else c) for c in right_cols
    ]
    return out.select(*sel)


def range_join(
    fact: DataFrame,
    bands: list[tuple],
    *,
    value_col: str,
    band_schema: str = "band string, lo double, hi double",
) -> DataFrame:
    """Join a fact table against a small list of [lo, hi) bands.

    The dim is a handful of literal rows, so the correct physical plan is a
    broadcast nested-loop join on the non-equi predicate — each task streams
    its fact partition once against the in-memory bands; no shuffle."""
    spark = fact.sparkSession
    dim = F.broadcast(spark.createDataFrame(bands, band_schema))
    cond = (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi"))
    return fact.join(dim, cond, "left")


def grouped_cume_dist(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | str,
) -> DataFrame:
    """Exact within-group cumulative distribution of a numeric column with
    BOUNDED window state: one row per distinct (group, value) —
    ``(group..., value, cnt, cume)`` where ``cume = P(X <= value)`` inside
    the group. The filtering primitive behind "drop the bottom 5% of docs
    per language by quality score" — the rank table is tiny relative to
    the data, and rows pick their percentile up with one broadcast-able
    equi-join back on (group, value).

    Scale shape — why not ``F.cume_dist()`` over the raw rows: a window
    over 10^12 rows sorts EVERY row of a group inside one task. Here rows
    first collapse to (group, value) COUNTS (hash aggregate, map-side
    partial combine — a hot (lang, length) pair costs one row per map
    task), and the ordered window runs over distinct values only, bounded
    by value cardinality (lengths, scores in fixed precision), not rows.
    NULL values are excluded (they are the battery's null_value rule).

    Exactness: cnt/cume are exact; ``cume`` is ONE bigint/bigint IEEE
    division (the rare_token_stats rule), so any engine reproduces it
    bit-for-bit. No ties are possible in the ordering (values are
    distinct after the aggregate), so the window is deterministic.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*groups)
    return counts.select(
        *groups,
        "value",
        "cnt",
        (F.sum("cnt").over(w_cum) / F.sum("cnt").over(w_tot)).alias("cume"),
    )


def cooccurrence_lift(
    df: DataFrame,
    entity_col: str = "user_id",
    item_col: str = "event_type",
) -> DataFrame:
    """Market-basket association between item pairs across entities:
    for every unordered pair of items that co-occur in at least one
    entity's basket, the exact support counts, confidence in both
    directions, and lift ``P(a,b) / (P(a) P(b))`` — the which-behaviors-
    travel-together profile (event types per user here; tags per
    document, sources per author equally). Corpus-level association —
    no reference counterpart (/root/reference/src/okay/validator.py).

    Output, one row per co-occurring pair (``item_a < item_b``):
    ``(item_a, item_b, n_both, n_a, n_b, n_entities, conf_a_to_b,
    conf_b_to_a, lift)``. Confidences are single int/int IEEE
    divisions; lift is spelled ``(n_both * n) / (n_a * n_b)`` with the
    bigint products first and ONE double division, so the DuckDB twin
    is bit-identical (products bigint-safe to ~3B entities).

    Scale shape: the DISTINCT (entity, item) frame is the only
    corpus-width aggregate (lazily localCheckpoint-ed — it feeds the
    pair join's both sides, the item marginals, and the entity count);
    the pair generation is a self-equi-join on the entity whose per-key
    fan-out is bounded by the ITEM VOCABULARY (an entity contributes at
    most |items| rows — never a posting list over entities); marginals
    and the entity total are bounded re-aggregates broadcast back."""
    e = (
        df.filter(F.col(entity_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(entity_col).alias("_ent"), F.col(item_col).alias("_it"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = e.select(F.col("_ent").alias("_ea"), F.col("_it").alias("item_a"))
    b = e.select(F.col("_ent").alias("_eb"), F.col("_it").alias("item_b"))
    pairs = (
        a.join(b, F.col("_ea") == F.col("_eb"))
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    marg = e.groupBy(F.col("_it")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_it")
    )
    tot = e.agg(F.count_distinct(F.col("_ent")).cast("bigint").alias("_n_ent"))
    ma = marg.select(F.col("_it").alias("_ia"), F.col("_n_it").alias("n_a"))
    mb = marg.select(F.col("_it").alias("_ib"), F.col("_n_it").alias("n_b"))
    d = lambda c: c.cast("double")  # noqa: E731
    joined = (
        pairs.join(F.broadcast(ma), F.col("item_a") == F.col("_ia"))
        .join(F.broadcast(mb), F.col("item_b") == F.col("_ib"))
        .crossJoin(F.broadcast(tot))
    )
    lift = d(F.col("n_both") * F.col("_n_ent")) / d(F.col("n_a") * F.col("n_b"))
    return joined.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        F.col("_n_ent").alias("n_entities"),
        F.round(d(F.col("n_both")) / d(F.col("n_a")), 6).alias("conf_a_to_b"),
        F.round(d(F.col("n_both")) / d(F.col("n_b")), 6).alias("conf_b_to_a"),
        F.round(lift, 6).alias("lift"),
    )


def coverage_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "user_id",
    *,
    min_gap_days: int = 2,
) -> DataFrame:
    """Temporal-coverage holes per group: calendar-day stretches with NO
    rows between two active days — the did-ingestion-silently-skip-a-day
    check a pipeline runs before trusting per-day aggregates or trend
    monitors (:func:`okay_spark.checks.mann_kendall_trend` on a gappy
    feed reads the gap as signal). A gap is reported when consecutive
    DISTINCT active days are ``min_gap_days`` or more apart. No reference
    counterpart (/root/reference/src/okay/validator.py).

    Output, one row per gap: ``(grp, gap_start, gap_end, gap_days)`` —
    the first/last MISSING day (both inclusive) and the exact missing-day
    count (``datediff - 1``, pure integer). Leading/trailing silence is
    out of scope by construction (no boundary rows exist to compare).

    Exactness: dates come from ``to_date`` on the raw timestamp; the
    only arithmetic is integer ``datediff`` — the DuckDB twin (date
    subtraction, ``lag`` ordered ASC) is trivially bit-identical.

    Scale shape: one DISTINCT (group, day) aggregate bounds everything
    by active-day cardinality (calendar days x groups, never row
    count); the lag window sorts that bounded frame within each group;
    no join, no collect, no Python."""
    days = (
        df.filter(F.col(ts_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"), F.to_date(ts_col).alias("_day")
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("_day")
    lagged = days.select(
        "grp", "_day", F.lag("_day").over(w).alias("_prev")
    )
    gap = F.datediff(F.col("_day"), F.col("_prev"))
    return lagged.filter(
        F.col("_prev").isNotNull() & (gap >= F.lit(min_gap_days))
    ).select(
        "grp",
        F.date_add(F.col("_prev"), 1).alias("gap_start"),
        F.date_sub(F.col("_day"), 1).alias("gap_end"),
        (gap - F.lit(1)).cast("bigint").alias("gap_days"),
    )


def burstiness(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "user_id",
) -> DataFrame:
    """Inter-event burstiness per group — Goh & Barabási's ``B = (sigma -
    mu) / (sigma + mu)`` over the inter-arrival gaps: B near -1 is a
    metronome (a cron job or scripted client), near 0 a Poisson process
    (organic traffic), toward +1 heavy-tailed bursts (scraping, retry
    storms). The bot/automation signal a pipeline reads per user or per
    source before trusting event volumes. NULL timestamps/groups are
    excluded; groups with fewer than 2 events have no gaps and are
    omitted. No reference counterpart
    (/root/reference/src/okay/validator.py).

    Output, one row per group with >= 1 gap: ``(grp, n_gaps,
    mean_gap_us, burstiness)`` — ``burstiness`` NULL when there is only
    one gap or sigma + mu == 0 (all gaps zero).

    Exactness: gaps are exact integer microseconds
    (``timestamp_diff(MICROSECOND, ...)`` — the TIMESTAMP_NTZ-safe
    route, relops module note); with duplicate timestamps the multiset
    of consecutive gaps is tie-order-invariant (equal stamps produce
    zero gaps), so moments are deterministic without a tiebreak; sums
    accumulate per-row decimal(38,12) casts of the double gap and its
    square (the moment discipline — a 30-day gap squared is ~7e24,
    past bigint but exact in decimal); sigma/mu/B are ONE fixed IEEE
    expression each. The DuckDB twin (``date_diff('microsecond',...)``,
    lag ORDER BY ts ASC) replays it bit-for-bit.

    Scale shape: one window (lag) partitioned by the group key — the
    same single shuffle as sessionize — then one map-side-combined
    aggregate per group. No join, no collect, no Python."""
    base = df.filter(F.col(ts_col).isNotNull() & F.col(group_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(ts_col)
    gap = F.timestamp_diff(
        "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
    ).cast("bigint")
    gaps = (
        base.select(F.col(group_col).alias("grp"), gap.alias("_g"))
        .filter(F.col("_g").isNotNull())
    )
    gd = F.col("_g").cast("double")
    agg = gaps.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(gd.cast("decimal(38,12)")).cast("double").alias("_s1"),
        F.sum((gd * gd).cast("decimal(38,12)")).cast("double").alias("_s2"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    n = d(F.col("n_gaps"))
    mu = F.col("_s1") / n
    var = F.col("_s2") / n - (F.col("_s1") / n) * (F.col("_s1") / n)
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = F.when(
        (F.col("n_gaps") >= 2) & (sigma + mu > 0), (sigma - mu) / (sigma + mu)
    )
    return agg.select(
        "grp",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_us"),
        F.round(b, 6).alias("burstiness"),
    )


def km_survival(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "click",
    end_type: str = "purchase",
) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-conversion: per user, the
    day count from the FIRST ``start_type`` event to the first STRICTLY
    LATER ``end_type`` event (the funnel discipline — an equal timestamp
    never converts), right-censored at the corpus's last observed
    timestamp for users who never convert. The estimator every
    time-to-event readout needs where a naive mean-of-converted-users is
    survivorship-biased (slow converters haven't converted YET). KM 1958.
    No reference counterpart (/root/reference/src/okay/validator.py).

    Output, one row per distinct EVENT day-duration t: ``(t_days,
    n_risk, n_event, survival)`` — ``survival`` the KM product
    ``prod_{t_j <= t} (1 - d_j / n_j)``.

    Exactness: durations are integer day differences; at-risk counts
    come from a descending cumulative window over the per-duration
    counts (exact bigints; censored-at-t users count as at risk at t —
    the standard convention); the KM product is a zero-indexed
    SEQUENTIAL fold over the PREFIX SLICE of the day-ordered support
    array (the ewma_anomalies discipline — DuckDB ``list_reduce`` with
    a ``[1.0]`` seed replays Spark's ``aggregate`` with a 1.0 seed
    element-for-element), each factor ONE int/int division.

    Scale shape: two per-user min-aggregates + one bounded min-join
    build the durations frame (one row per start_type user); everything
    after is bounded by DISTINCT DURATION cardinality (calendar days —
    a survival curve's state is inherently days): per-duration counts,
    one descending window over counts, one collect_list bounded by
    days, row-local prefix folds. No posting lists, no per-row state."""
    ts, u, ty = F.col(ts_col), F.col(user_col), F.col(type_col)
    base = df.filter(ts.isNotNull() & u.isNotNull() & ty.isNotNull())
    starts = (
        base.filter(ty == start_type)
        .groupBy(u.alias("_u"))
        .agg(F.min(ts).alias("_t0"))
    )
    ends = base.filter(ty == end_type).select(
        u.alias("_ue"), ts.alias("_te")
    )
    conv = (
        starts.join(
            ends, (F.col("_u") == F.col("_ue")) & (F.col("_te") > F.col("_t0")), "left"
        )
        .groupBy("_u", "_t0")
        .agg(F.min("_te").alias("_t1"))
    )
    obs_end = base.agg(F.max(ts).alias("_tmax"))
    durs = conv.crossJoin(F.broadcast(obs_end)).select(
        F.when(
            F.col("_t1").isNotNull(),
            F.datediff(F.to_date("_t1"), F.to_date("_t0")),
        )
        .otherwise(F.datediff(F.to_date("_tmax"), F.to_date("_t0")))
        .cast("bigint")
        .alias("_dur"),
        F.col("_t1").isNotNull().alias("_event"),
    )
    counts = durs.groupBy("_dur").agg(
        F.sum(F.when(F.col("_event"), 1).otherwise(0)).cast("bigint").alias("_d"),
        F.count(F.lit(1)).cast("bigint").alias("_c"),
    )
    wdesc = (
        Window.orderBy(F.col("_dur").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = counts.select(
        "_dur", "_d", F.sum("_c").over(wdesc).cast("bigint").alias("_n")
    ).filter(F.col("_d") > 0)
    packed = risk.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_dur"), F.col("_d"), F.col("_n")))
        ).alias("_arr")
    )
    exploded = packed.select(
        F.posexplode(F.col("_arr")).alias("_i", "_s"), F.col("_arr")
    )
    surv = F.aggregate(
        F.slice(F.col("_arr"), 1, F.col("_i") + 1),
        F.lit(1.0),
        lambda acc, s: acc
        * (F.lit(1.0) - s["_d"].cast("double") / s["_n"].cast("double")),
    )
    return exploded.select(
        F.col("_s")["_dur"].alias("t_days"),
        F.col("_s")["_n"].alias("n_risk"),
        F.col("_s")["_d"].alias("n_event"),
        F.round(surv, 6).alias("survival"),
    )
