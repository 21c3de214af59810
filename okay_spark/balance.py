"""Corpus-balancing operators: per-group caps and resampling the corpus to
a target group distribution.

Both are training-data-pipeline stages (domain capping and language/domain
rebalancing a la CCNet/RedPajama); the reference validator is per-document
only (/root/reference/src/okay/validator.py) and has no corpus-level
counterpart. Decisions are derived from md5 of a stable key
(:mod:`okay_spark.sampling`), so membership is reproducible across cluster
sizes, partitionings, and engines — the DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_fraction


def cap_per_group(
    df: DataFrame,
    group_col: str | list[str],
    *,
    max_rows: int,
    order_col: str,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, by ascending ``order_col``
    (ties broken by the column itself — pass a unique key for determinism).

    Scale shape: a naive ``row_number`` over ``partitionBy(group)`` makes
    one reducer sort an entire hot group (a crawl dump where one domain is
    40% of rows). Here a pre-prune pass ranks within
    ``(group, spark_partition_id)`` — the exchange key carries the partition
    id, so a hot group spreads over all reducers — and keeps the per-shard
    top-``max_rows``, a superset of the global top-``max_rows`` (same order
    key, so any global winner is also a shard winner). The final window then
    sorts at most ``max_rows x shards`` rows per group instead of the whole
    group."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    shard = Window.partitionBy(*groups, F.spark_partition_id()).orderBy(order_col)
    pre = (
        df.withColumn("_srn", F.row_number().over(shard))
        .filter(F.col("_srn") <= max_rows)
        .drop("_srn")
    )
    final = Window.partitionBy(*groups).orderBy(order_col)
    return (
        pre.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def sample_to_token_budget(
    df: DataFrame,
    group_col: str | list[str],
    *,
    budget_tokens: int,
    token_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Fill each group with documents until its TOKEN budget is reached —
    the "N billion tokens per language/domain" step of training-mix
    construction, where :func:`cap_per_group` counts rows and this counts
    tokens. Docs are taken in md5(key) order (a reproducible shuffle, so
    the kept set is unbiased, engine-portable, and stable across runs and
    cluster sizes); a doc is kept while the running token total INCLUDING
    it stays <= ``budget_tokens``. The rule is take-while, not knapsack:
    the first doc whose inclusion crosses the budget ends the group
    (deterministic, order-respecting, exactly SQL-replayable — a
    skip-and-continue greedy fill would depend on pathological token
    distributions and be much harder to audit). Token counts must be
    non-negative and non-null (both take-while passes rely on the running
    total being monotone).

    Scale shape: the naive form is a cumulative-sum window over
    ``partitionBy(group)`` — one reducer sorts an entire hot group. A
    pre-prune pass runs a take-while within ``(group,
    spark_partition_id)``, keeping each row whose PRECEDING within-shard
    sum is within budget (i.e. the shard's first budget-breaker survives
    too). That preceding shard sum is computed over a subset of the row's
    global md5-predecessors, so it under-counts: any row it drops has
    preceding-global-sum > budget and is over budget globally. Keeping the
    breaker is what makes the global pass EXACT — the true kept-prefix K
    consists of rows whose predecessors all lie in K (subset sums <=
    budget, so they all survive), the first global breaker's predecessors
    are exactly K (so it survives), and therefore every later row's
    survivor cumsum includes K plus the breaker and exceeds the budget.
    Dropping breakers instead (the naive `shard cumsum <= budget` filter)
    deletes their tokens from the global sum and falsely keeps rows past
    the true boundary — partition-DEPENDENT output (caught in round-3
    review; regression-pinned by the adversarial-partitioning pytest).
    The global pass sorts at most ~``budget_tokens``-worth of
    positive-token rows (+1 breaker) per (group, shard), never the whole
    group."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    order = hash_fraction(key_col, salt=salt)
    toks = F.col(token_col).cast("bigint")

    def take_while(win: Window) -> Column:
        return F.sum(toks).over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    shard = Window.partitionBy(*groups, F.spark_partition_id()).orderBy(
        order, F.col(key_col)
    )
    pre = df.withColumn("_sct", take_while(shard)).filter(
        F.col("_sct") - toks <= budget_tokens
    ).drop("_sct")
    final = Window.partitionBy(*groups).orderBy(order, F.col(key_col))
    return (
        pre.withColumn("_ct", take_while(final))
        .filter(F.col("_ct") <= budget_tokens)
        .drop("_ct")
    )


def resample_to_target(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    *,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Downsample so the kept corpus follows the ``targets`` distribution
    (group value -> target weight; weights are relative, they need not sum
    to 1). No group is upsampled: the binding group — the one most
    underrepresented relative to its target — keeps everything, and every
    other group keeps the deterministic fraction that brings it into
    proportion. Groups absent from ``targets`` are dropped.

    keep_frac(g) = min_h(count_h / w_h) * w_g / count_g  (<= 1 by choice of
    the min), membership = md5-fraction(key) < keep_frac — data-dependent
    where :func:`okay_spark.sampling.stratified_sample` is static.

    Scale shape: one count aggregate over the grouping column (map-side
    partial combine), a scalar min over #groups rows, and a broadcast join
    of #targets rows back onto the fact table; the per-row decision is a
    JVM md5 expression, no Python, no extra shuffle of the fact table."""
    tgt = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in targets.items()], f"{group_col} string, _w double"
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(tgt, group_col)
    )
    cmin = counts.agg(F.min(F.col("_cnt") / F.col("_w")).alias("_cmin"))
    fracs = counts.crossJoin(F.broadcast(cmin)).select(
        group_col,
        (F.col("_cmin") * F.col("_w") / F.col("_cnt")).alias("_keep_frac"),
    )
    return (
        df.join(F.broadcast(fracs), group_col)
        .filter(hash_fraction(key_col, salt=salt) < F.col("_keep_frac"))
        .drop("_keep_frac")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    *,
    text_col: str = "text",
    alpha: float = 0.5,
    budget_tokens: int | None = None,
) -> DataFrame:
    """Alpha-temperature data-mixing weights per source/domain — the
    sampling-probability computation behind multi-corpus LM training mixes
    (the Pile / XLM-R / LLaMA recipe): ``w_g = share_g^alpha /
    sum_h(share_h^alpha)`` where ``share_g`` is the group's token share.
    ``alpha < 1`` flattens the mix toward small sources, ``alpha = 1``
    is proportional sampling, ``alpha = 0`` uniform. The reference
    validates one document at a time (/root/reference/src/okay/
    validator.py) and has no corpus-composition counterpart.

    Output, one row per group: ``(group, n_docs, n_tokens, share, weight
    [, epochs])`` — ``epochs`` (how many passes over the group one
    training run makes at ``budget_tokens`` total) only when a budget is
    given: ``epochs = (weight * budget) / n_tokens``; a value > 1 flags a
    source the mix would repeat (the usual upsampling-duplication
    warning). Feed ``weight`` per group into
    :func:`resample_to_target` ``targets`` to realize the mix
    deterministically.

    Exactness: ``share`` is one double division of exact bigint sums;
    ``alpha`` in {0.5, 1.0, 2.0} routes through sqrt / identity / x*x
    (IEEE-exact on every engine — sqrt is correctly rounded, pow is not),
    other alphas use ``pow`` and may differ in the last ulp across
    engines. The weight denominator accumulates in decimal(38,12) (the
    moment discipline) so it is independent of aggregation order.

    Scale shape: ONE hash aggregate over the fact table (map-side
    partial combine) down to #groups rows; the token total and the weight
    denominator re-derive from that aggregated frame and broadcast back
    (the key_skew_stats discipline — never a second ``df.count()`` scan),
    so the fact table is read once. Everything past the aggregate is
    O(#groups)."""
    from .textops import tokens

    g = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(tokens(text_col)).cast("bigint"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        # the aggregated frame feeds the totals AND the final projection —
        # pin it so the fact-table scan/aggregate runs once
        .localCheckpoint(eager=False)
    )
    tot = g.agg(F.sum("n_tokens").cast("bigint").alias("_tot"))
    share = F.col("n_tokens").cast("double") / F.col("_tot").cast("double")
    if alpha == 0.5:
        scaled = F.sqrt(share)
    elif alpha == 1.0:
        scaled = share
    elif alpha == 2.0:
        scaled = share * share
    else:  # cross-engine last-ulp caveat in the docstring
        scaled = F.pow(share, F.lit(float(alpha)))
    g2 = g.crossJoin(F.broadcast(tot)).withColumn("_scaled", scaled)
    denom = g2.agg(
        F.sum(F.col("_scaled").cast("decimal(38,12)")).cast("double").alias("_den")
    )
    out = g2.crossJoin(F.broadcast(denom)).select(
        group_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot").cast("double")).alias(
            "share"
        ),
        (F.col("_scaled") / F.col("_den")).alias("weight"),
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "epochs",
            (F.col("weight") * F.lit(float(budget_tokens)))
            / F.col("n_tokens").cast("double"),
        )
    return out


def concentration_stats(df: DataFrame, group_col: str) -> DataFrame:
    """One-row corpus-concentration profile over a grouping column (source,
    domain, language): is the mix dominated by a few groups? Emits the
    three standard inequality measures a data-mixing review reads before
    setting :func:`mixture_weights` — top-1 share, the Herfindahl-
    Hirschman index (sum of squared shares: 1/HHI is the "effective number
    of groups"), and the Gini coefficient of the group-size distribution.

    Output, ONE row: ``(n_groups, n_rows, top_share, hhi, gini)``; an
    empty input yields ``(0, 0, null, null, null)``, a single group
    ``gini = 0.0``.

    Exactness: ``top_share`` is one int/int IEEE division. ``hhi``
    accumulates per-group ``share^2`` (a double) in decimal(38,12) — the
    moment discipline, so the sum is independent of aggregation order and
    the DuckDB twin replays it through the VARCHAR decimal route. ``gini``
    uses the exact rank formulation over counts sorted ascending (ties
    broken on the group key — a deterministic total order): ``gini =
    (2*sum(rank*cnt) - (n+1)*total) / (n*total)`` with both sides
    accumulated as exact integers in decimal(38,0) (rank*cnt can pass
    2^63 at corpus scale) and ONE double division at the end — both
    engines correctly round the same two integers, so the quotient is
    bit-identical.

    Scale shape: one map-side-combinable hash aggregate down to #groups
    rows; everything after (window rank, the three measures) runs over
    the aggregated frame — bounded by group cardinality, never the fact
    table. The rank window sorts #groups rows, not the corpus."""
    counts = (
        df.groupBy(F.col(group_col).alias("_g"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
        # feeds the rank window AND the scalar rollup — one evaluation
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy(F.col("_cnt").asc(), F.col("_g").asc())
    ranked = counts.withColumn("_r", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum("_cnt"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.max("_cnt").cast("bigint").alias("_top"),
        F.sum(F.col("_cnt").cast("decimal(38,0)") * F.col("_r").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_s"),
    )
    shares = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("_cnt").cast("bigint").alias("_t")))
    )
    sq = F.col("_cnt").cast("double") / F.col("_t").cast("double")
    hhi = shares.agg(
        F.sum((sq * sq).cast("decimal(38,12)")).cast("double").alias("hhi")
    )
    d = lambda c: c.cast("double")  # noqa: E731
    n, t, s = F.col("n_groups"), F.col("n_rows"), F.col("_s")
    gini = F.when(
        (n > 0) & (t > 0),
        d(
            (F.lit(2).cast("decimal(38,0)") * s)
            - ((n + 1).cast("decimal(38,0)") * t.cast("decimal(38,0)"))
        )
        / d(n.cast("decimal(38,0)") * t.cast("decimal(38,0)")),
    )
    return agg.crossJoin(F.broadcast(hhi)).select(
        "n_groups",
        "n_rows",
        F.when(t > 0, d(F.col("_top")) / d(t)).alias("top_share"),
        F.when(t > 0, F.col("hhi")).alias("hhi"),
        gini.alias("gini"),
    )


def effective_sample_size(
    df: DataFrame, weight, group_col: str | None = None
) -> DataFrame:
    """Kish effective sample size of an importance-weighted corpus —
    ``ESS = (sum w)^2 / sum(w^2)`` per group: the number a weighted
    resample (:func:`mixture_weights` alphas, DSIR importance ratios,
    quality-as-weight sampling) ACTUALLY behaves like. An ESS ratio near
    1 means the weights are nearly uniform (the resample is honest);
    near 0 means a few documents carry all the mass and the "resampled
    corpus" is those few documents repeated — reweighting collapsed the
    data before training ever saw it. Rows with NULL or negative
    weights are excluded. No reference counterpart
    (/root/reference/src/okay/validator.py).

    Output, one row per group (one row total when ``group_col`` is
    None, with ``grp = '(all)'``): ``(grp, n, ess, ess_ratio)`` —
    ``ess`` NULL when every weight is zero.

    Exactness: both moments accumulate per-row decimal(38,12) casts of
    the double weight and its square (the moment discipline); ESS is
    ONE fixed IEEE expression ``(s1*s1)/s2`` and the ratio one further
    division — the DuckDB twin replays them bit-for-bit.

    Scale shape: ONE map-side-combinable hash aggregate on the group
    key (or a single-row reduce); no window, no join, no collect."""
    from pyspark.sql import Column

    w = weight if isinstance(weight, Column) else F.col(weight)
    g = F.col(group_col) if group_col is not None else F.lit("(all)")
    base = df.filter(w.isNotNull() & (w >= 0)).select(
        g.alias("grp"), w.cast("double").alias("_w")
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_w").cast("decimal(38,12)")).cast("double").alias("_s1"),
        F.sum((F.col("_w") * F.col("_w")).cast("decimal(38,12)"))
        .cast("double")
        .alias("_s2"),
    )
    ess = F.when(
        F.col("_s2") > 0, (F.col("_s1") * F.col("_s1")) / F.col("_s2")
    )
    return agg.select(
        "grp",
        "n",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n").cast("double"), 6).alias("ess_ratio"),
    )
