"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the point of each design):

- **exact**: one hash aggregate on the content fingerprint — partial
  (map-side) combine means duplicates cost one row per input partition.
- **MinHash+LSH**: signatures are Column expressions (md5 is used as the
  hash family so the DuckDB oracle reproduces values bit-for-bit); the
  candidate join is banded — only rows sharing a (band, band-hash) bucket
  ever meet, so the shuffle is O(rows x bands), never O(rows^2).
- **SimHash**: a single ``aggregate()`` over tokens builds the bit-majority
  vector; near-dups join on band keys of the signature (Hamming-LSH).
- **embedding cosine**: random-hyperplane LSH buckets (deterministic,
  hash-derived hyperplanes) prune the pair space; exact cosine re-checks
  candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textops import normalize_text, word_shingles

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    include_ids: bool = False,
) -> DataFrame:
    """Groups of identical (normalized) content: (fp, cnt, keep_id[, ids]).

    The default output carries only scalars per group (count + deterministic
    min-id winner), so the aggregate partial-combines map-side and a
    pathological 10M-copy boilerplate group costs one row per input
    partition, never 10M ids on one reducer. ``include_ids=True`` adds the
    full sorted id array via ``collect_list`` — unbounded per-group state, a
    debugging/sampling aid for corpora where the largest duplicate group is
    known to be small; leave it off on the scale path."""
    fp = F.md5(normalize_text(text_col))
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.min(id_col).alias("keep_id"),
    ]
    if include_ids:
        aggs.append(F.sort_array(F.collect_list(id_col)).alias("ids"))
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(*aggs)
        .filter(F.col("cnt") > 1)
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per content group (deterministic winner). One
    shuffle on the fingerprint; no window over the full table."""
    fp = F.md5(normalize_text(text_col)).alias("_fp")
    keep = df.select(fp, F.col(id_col).alias("_keep")).groupBy("_fp").agg(F.min("_keep").alias("_keep"))
    return (
        df.withColumn("_fp", F.md5(normalize_text(text_col)))
        .join(keep, on="_fp", how="inner")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_fp", "_keep")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column | str, *, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """array<string> of ``num_hashes`` min-hashes over word shingles.

    Hash family: ``md5(i || '|' || shingle)``, minimum by lexicographic
    order — fully portable (identical in DuckDB), deterministic, and
    uniformly distributed per salt ``i``."""
    sh = word_shingles(text, shingle_k)
    # One nested transform keeps the (expensive) shingle subtree in the plan
    # exactly once: a Python-level loop over hash indices would inline it
    # num_hashes times (CollapseProject), exploding the expression tree and
    # Catalyst analysis time. The salt comes from the outer lambda variable.
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s)))
        ),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition narrow inputs (e.g. a single parquet file) so expensive
    per-row projections parallelize; no-op when already wide enough."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _shingled(df: DataFrame, text_col: str, id_col: str, shingle_k: int) -> DataFrame:
    """(id, _sh) — word-shingle set per document; shingle-less docs (< k
    tokens) are dropped: their Jaccard with anything is 0, so they can never
    clear a positive near-dup threshold, and keeping them would collapse into
    one degenerate all-identical-signature bucket."""
    return _spread(df).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("_sh")
    ).filter(F.size("_sh") > 0)


def minhash_lsh_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band, bucket) — one row per (doc, band); bucket = md5 of the
    band's slice of the signature."""
    return _buckets_from_shingled(
        _shingled(df, text_col, id_col, shingle_k), id_col, num_hashes=num_hashes, bands=bands
    )


def _buckets_from_shingled(
    shingled: DataFrame, id_col: str, *, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    rows_per_band = num_hashes // bands
    # Expression subtrees referenced inside higher-order-function lambdas are
    # re-evaluated PER ELEMENT at runtime (no common-subexpression reuse), so
    # tokenize+shingle must be materialized once per row before fanning out
    # per band/hash. A plain extra select() doesn't help — CollapseProject
    # re-inlines single-use expressions — but a Generate (explode) is an
    # optimizer barrier: its child projection computes the shingle array once
    # per input row, and everything above reads the materialized attribute.
    per_band = shingled.select(
        id_col,
        "_sh",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    )
    bucket = _band_bucket_expr(num_hashes, bands)
    return per_band.select(id_col, "band", bucket.alias("bucket"))


def _band_bucket_expr(num_hashes: int, bands: int) -> Column:
    """The bit-exact band-bucket recipe (md5 of the band's slice of the
    minhash signature over the materialized ``_sh``/``band`` attributes) —
    shared by every batch bucket builder AND the streaming cross-dedup path
    so a stream row lands in the identical bucket as its batch twin. Callers
    must place it ABOVE a Generate that materializes ``_sh`` (see the
    optimizer-barrier note in :func:`_buckets_from_shingled`)."""
    rows_per_band = num_hashes // bands
    sh = F.col("_sh")
    return F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(
                    F.col("band") * rows_per_band,
                    F.col("band") * rows_per_band + (rows_per_band - 1),
                ),
                lambda h: F.array_min(
                    F.transform(sh, lambda s: F.md5(F.concat(h.cast("string"), F.lit("|"), s)))
                ),
            ),
        )
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_bucket_size: int | None = 1_000,
    **lsh_kwargs,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH bucket.

    One hash-aggregate groups ids per (band, bucket) and pairs are expanded
    within each bucket — signatures are computed once (a bucket self-join
    would compute them per join side) and the only shuffle is the groupBy.
    Bucket sizes are small by construction (that is what LSH is for) — but a
    boilerplate-heavy corpus (templated pages, licence headers) can flood one
    bucket with millions of near-identical docs, and the per-bucket
    ``collect_list`` state is O(bucket size). ``max_bucket_size`` (default
    1,000 — the ``max_doc_freq`` analogue) bounds it in TWO phases: a
    scalar ``count`` aggregate (partial-combines map-side, O(1) state) finds
    oversized buckets, then an anti-join removes their rows BEFORE the
    collect — the reducer never materializes the giant list. Dropped buckets
    are observable (not silent) via :func:`minhash_oversized_buckets`, which
    shares the same bucketing; a flooded bucket means the docs are
    boilerplate-duplicates better handled by exact dedup on fingerprints.
    ``max_bucket_size=None`` restores the uncapped behavior."""
    # no broadcast hint inside the cap: the oversize set is normally tiny
    # (AQE will broadcast it), but pathological corpora could make it wide
    # and a forced broadcast would be its own OOM
    buckets = _cap_bucket_flood(
        minhash_lsh_buckets(df, text_col, id_col, **lsh_kwargs), max_bucket_size
    )
    return _pairs_from_buckets(buckets, id_col)


def _pairs_from_buckets(buckets: DataFrame, id_col: str) -> DataFrame:
    grouped = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    ids = F.col("_ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)), lambda b: F.struct(a.alias("a"), b.alias("b"))
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .distinct()
    )


def minhash_oversized_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_bucket_size: int = 1_000,
    **lsh_kwargs,
) -> DataFrame:
    """(band, bucket, size) of every LSH bucket larger than
    ``max_bucket_size`` — the buckets :func:`minhash_candidate_pairs` drops
    under the same cap. Run (or count) this alongside a capped dedup pass so
    truncation is reported, never silent; scalar count aggregate only, no
    posting lists."""
    return (
        minhash_lsh_buckets(df, text_col, id_col, **lsh_kwargs)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") > max_bucket_size)
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, shingle_k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage after
    LSH). Shingle sets are computed once per doc and broadcast through the
    join keyed by id."""
    sh = _spread(docs).select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), shingle_k).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb"))
    joined = df_pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    return joined.select(
        "a", "b", F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard")
    )


def _cap_posting_flood(rows: DataFrame, key: str, max_doc_freq: int | None) -> DataFrame:
    """Two-phase posting-list cap shared by the inverted-index pair
    generators (:func:`ngram_jaccard_pairs`, :func:`winnow_shared_pairs`) —
    the :func:`_cap_bucket_flood` pattern generalized to a shingle /
    fingerprint key: scalar ``count`` per key, anti-join the over-cap keys
    out BEFORE the ``collect_list``, so one boilerplate shingle shared by
    10M documents never materializes (or sorts) its full posting list on a
    single reducer. ``rows`` must carry one row per distinct (doc, key) —
    both callers guarantee that (``word_shingles`` / winnowing fingerprints
    are per-doc distinct), so ``count(1)`` per key IS the doc frequency and
    the anti-join is value-identical to the old post-collect size filter.

    The rows frame feeds both the count pre-pass and the anti-join probe
    side; Spark cannot reuse the subplan across that diamond, so without
    materialization the tokenize/shingle/md5 pipeline would execute twice —
    ``localCheckpoint`` pins it to one evaluation, the same discipline as
    :func:`_cap_bucket_flood`."""
    if max_doc_freq is None:
        return rows
    rows = rows.localCheckpoint(eager=True)
    over = (
        rows.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_doc_freq)
        .select(key)
    )
    return rows.join(over, [key], "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_k: int = 3,
    threshold: float = 0.3,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold, without a cross join.

    Inverted-index formulation: explode distinct shingles, group ids per
    shingle, expand in-posting pairs, and count pair co-occurrences — the
    count IS |A ∩ B|, and |A ∪ B| = |A| + |B| - |A ∩ B| from per-doc set
    sizes carried through the expansion. Two shuffles total (posting-list
    groupBy, pair-count groupBy); work is sum of posting-list sizes squared,
    which is what makes it exact-but-scalable when shingles are
    discriminative.

    ``max_doc_freq`` (default 10,000) drops shingles appearing in more
    documents than the cap — the standard stopword-n-gram guard. Without it,
    ONE ubiquitous shingle at corpus scale means one reducer holding the full
    posting list and an O(df^2) in-bucket pair expansion (round 1 defaulted
    to unguarded and was flagged as the scale-killer). The cap is TWO-PHASE
    (:func:`_cap_posting_flood`): a scalar count pre-pass anti-joins
    over-cap shingles out BEFORE the ``collect_list``, so both the reducer
    state and the df^2 expansion are bounded at max_doc_freq per shingle —
    a post-collect size filter would bound only the expansion while still
    materializing the flooded list. Pairs supported ONLY by dropped shingles
    score approximately low; pass ``max_doc_freq=None`` for strict exactness
    on corpora known to lack degenerate shingles.
    """
    sh = _spread(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_k).alias("_sh"),
    )
    sized = sh.select("_id", F.size("_sh").alias("_sz"), F.explode("_sh").alias("shingle"))
    sized = _cap_posting_flood(sized, "shingle", max_doc_freq)
    posting = sized.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("_id", "_sz"))).alias("_ids")
    )
    posting = posting.filter(F.size("_ids") > 1)
    ids = F.col("_ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(
                    a["_id"].alias("a"),
                    b["_id"].alias("b"),
                    a["_sz"].alias("sa"),
                    b["_sz"].alias("sb"),
                ),
            ),
        )
    )
    pairs = (
        posting.select(F.explode(pair_arr).alias("_p"))
        .groupBy("_p.a", "_p.b", "_p.sa", "_p.sb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    inter = F.col("_inter").cast("double")
    union = (F.col("sa") + F.col("sb")).cast("double") - inter
    return pairs.select(
        "a", "b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-token gram, slide a ``window`` over
    the gram-hash sequence, keep each window's minimum — one row per
    distinct ``(doc_id, fp)``. The winnowing GUARANTEE: any shared token
    run of length >= k + window - 1 between two documents shares at least
    one fingerprint, so this catches PARTIAL overlap at substring
    granularity — the detection layer between whole-document minhash and
    verbatim line-dedup. Density is ~2/(window+1) fingerprints per token:
    state per doc is bounded and tunable.

    Short-document edges (replayed exactly by the SQL twin): fewer than
    ``k`` tokens -> no grams, no fingerprints; fewer grams than
    ``window`` -> one fingerprint, the global gram minimum. Gram hashes
    are md5 hex strings and the window minimum is the LEXICOGRAPHIC min —
    fixed-width lowercase hex, so string order == 128-bit value order on
    every engine (no conv needed: the hex string IS the fingerprint).

    Plan shape: entirely row-local Column expressions (split -> gram
    md5s -> window mins -> distinct -> explode) — zero shuffles, the
    battery property. Cost is one md5 per token, same order as shingling.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col), grams.alias("_g"))
    )
    ng = F.size(F.col("_g"))
    fps = (
        F.when(
            ng >= window,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), ng - window),
                    lambda j: F.array_min(F.slice(F.col("_g"), j + 1, window)),
                )
            ),
        )
        .when(ng > 0, F.array(F.array_min(F.col("_g"))))
        .otherwise(F.array().cast("array<string>"))
    )
    return base.select(F.col(id_col), F.explode(fps).alias("fp"))


def winnow_shared_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    substring-overlap candidates with exact shared counts, via the same
    df-capped inverted-index formulation as :func:`ngram_jaccard_pairs`:
    posting list per fingerprint (two-phase bounded by ``max_doc_freq`` via
    :func:`_cap_posting_flood` — count pre-pass + anti-join BEFORE the
    ``collect_list``, the boilerplate-fingerprint guard; dropped postings
    are the observable analog of the LSH bucket cap), in-posting pair
    expansion, pair-count aggregate. Returns ``(a, b, shared)``, ``a < b``.

    By the winnowing guarantee, a pair sharing a token run of length
    >= k + window - 1 + (min_shared - 1) appears here (each extra
    fingerprint needs at most one more window step on the shared run).
    Two shuffles total; reducer state and expansion bounded at
    max_doc_freq (df^2 for the expansion) per fingerprint.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k=k, window=window)
    fps = _cap_posting_flood(fps, "fp", max_doc_freq)
    posting = fps.groupBy("fp").agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
    posting = posting.filter(F.size("_ids") > 1)
    ids = F.col("_ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    return (
        posting.select(F.explode(pair_arr).alias("_p"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 1_000,
) -> DataFrame:
    """Full pipeline: LSH candidates -> exact Jaccard filter >= threshold.

    The shingle frame is computed ONCE and ``localCheckpoint``-ed: it feeds
    the signature/bucket pipeline AND both sides of the exact re-rank join
    — without the pin the re-rank (via :func:`ngram_jaccard`) would
    re-tokenize the corpus a second and third time."""
    sh = _shingled(df, text_col, id_col, shingle_k).localCheckpoint(eager=True)
    buckets = _cap_bucket_flood(
        _buckets_from_shingled(sh, id_col, num_hashes=num_hashes, bands=bands),
        max_bucket_size,
    )
    pairs = _pairs_from_buckets(buckets, id_col)
    a = sh.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    joined = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select("a", "b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_cross_duplicates(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 1_000,
) -> DataFrame:
    """Docs in ``corpus`` with a near-duplicate in ``reference`` — the
    CROSS-CORPUS form of :func:`minhash_near_duplicates`: dedup a new crawl
    against the already-kept corpus, or document-level benchmark
    decontamination (the n-gram variant is
    :func:`okay_spark.textops.ngram_contamination`; this one catches whole
    near-duplicate documents the n-gram overlap score can under-rank).

    Returns ``(a, b, jaccard)`` with ``a`` from corpus, ``b`` from
    reference, exact word-shingle Jaccard >= ``threshold``.

    Scale shape: signatures/buckets are computed per side with the SAME
    md5 hash family, so candidates meet through an equi-join on
    (band, bucket) — never corpus x reference. Each side's flooded buckets
    are removed by the same two-phase ``max_bucket_size`` cap as the
    self-join path, bounding the join fan-out per bucket at
    ``max_bucket_size**2``. The exact-Jaccard re-rank joins each side's
    shingle set by id (broadcastable when the candidate set is small).
    At ``threshold=1.0`` the output is EXACT, not approximate: equal
    shingle sets produce identical signatures, so verbatim (and
    shingle-set-equal) cross-corpus duplicates share every band bucket and
    LSH recall is 1 by construction — the driver entry pins that case
    against a DuckDB shingle-fingerprint join."""
    # one shingle pass per side, pinned: feeds that side's signature/bucket
    # pipeline AND its leg of the exact re-rank join
    shc = _shingled(corpus, text_col, id_col, shingle_k).localCheckpoint(eager=True)
    shr = _shingled(reference, text_col, id_col, shingle_k).localCheckpoint(eager=True)
    bc = _cap_bucket_flood(
        _buckets_from_shingled(shc, id_col, num_hashes=num_hashes, bands=bands),
        max_bucket_size,
    ).select(F.col(id_col).alias("a"), "band", "bucket")
    br = _cap_bucket_flood(
        _buckets_from_shingled(shr, id_col, num_hashes=num_hashes, bands=bands),
        max_bucket_size,
    ).select(F.col(id_col).alias("b"), "band", "bucket")
    pairs = bc.join(br, ["band", "bucket"]).select("a", "b").distinct()

    sha = shc.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    shb = shr.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    joined = pairs.join(sha, "a").join(shb, "b")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = (F.size("_sha") + F.size("_shb")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select("a", "b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _cap_bucket_flood(buckets: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """The two-phase bucket cap shared by the self-join and cross-corpus
    candidate generators: scalar count per (band, bucket), anti-join the
    oversized set out before anything expands.

    The buckets frame feeds BOTH the count pre-pass and the anti-join probe
    side, and Spark cannot reuse the subplan across the diamond (the
    exchanges differ) — without materialization the MinHash signature
    pipeline (num_hashes x |shingles| md5s per doc, the dominant cost of the
    whole operator) executes twice. ``localCheckpoint`` pins it to one
    evaluation (MEMORY_AND_DISK, 3 narrow columns), the same discipline as
    the edges checkpoint in :func:`connected_components`."""
    if max_bucket_size is None:
        return buckets
    buckets = buckets.localCheckpoint(eager=True)
    oversize = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select("band", "bucket")
    )
    return buckets.join(oversize, ["band", "bucket"], "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column | str, *, bits: int = 32) -> Column:
    """Bit-majority SimHash over whitespace tokens (bigint).

    Token hash = first 8 hex chars of md5 (portable); one ``aggregate()``
    accumulates per-bit counts; the sign vector packs into a long. Pure
    Column expressions — no UDF."""
    from .textops import tokens

    toks = tokens(text)
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")  # noqa: E731
    # shiftleft/shiftright take only Python-int shift amounts, so bit i is
    # extracted arithmetically: (h div 2^i) mod 2 (values < 2^32, exact in
    # double).
    bit = lambda v, i: F.pmod(  # noqa: E731
        F.floor(v / F.pow(F.lit(2.0), i.cast("double"))).cast("bigint"), F.lit(2)
    )
    zero = F.array_repeat(F.lit(0).cast("int"), bits)
    counts = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: F.when(bit(h(t), i) == 1, 1).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda c, i: F.when(c > 0, F.pow(F.lit(2.0), i.cast("double")).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return packed


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming-LSH: split the signature into bands; pairs sharing any band
    value are candidates; exact Hamming distance filters."""
    sig = simhash(F.col(text_col), bits=bits)
    n_bands = bits // band_bits
    # one reference to _sig: bands via transform over the band index (a
    # Python loop would re-inline the 32-bit aggregate expression per band)
    bands_arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.pmod(
                F.floor(
                    F.col("_sig") / F.pow(F.lit(2.0), (b * band_bits).cast("double"))
                ).cast("bigint"),
                F.lit(1 << band_bits),
            ).alias("key"),
        ),
    )
    base = df.select(F.col(id_col), sig.alias("_sig"))
    buckets = base.select(id_col, "_sig", F.explode(bands_arr).alias("_b")).select(
        id_col, "_sig", F.col("_b.band").alias("band"), F.col("_b.key").alias("key")
    )
    left = buckets.select(F.col(id_col).alias("a"), F.col("_sig").alias("_siga"), "band", "key")
    right = buckets.select(F.col(id_col).alias("b"), F.col("_sig").alias("_sigb"), "band", "key")
    pairs = (
        left.join(right, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "_siga", "_sigb")
        .distinct()
    )
    hamming = F.bit_count(F.col("_siga").bitwiseXOR(F.col("_sigb")))
    return pairs.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_distance: int = 40,
    bits: int = 32,
    band_bits: int = 4,
    max_hamming: int = 7,
) -> DataFrame:
    """EXACT Levenshtein near-dup pairs, gated by a SimHash Hamming prefilter.

    Semantics (well-defined, oracle-checkable): pairs whose 32-bit SimHash
    Hamming distance is <= ``max_hamming`` AND whose exact Levenshtein
    distance is <= ``max_distance``. The Hamming gate is banded
    (:func:`simhash_near_duplicates` — pigeonhole-complete for the gate, so
    the candidate set is exact, never a recall guess), which is what keeps
    the O(len^2)-per-pair edit-distance kernel off the full pair space at
    corpus scale: only banded candidates ever join their texts. The
    Levenshtein itself runs JVM-side with the threshold variant
    (early-exit rows above ``max_distance``).
    """
    pairs = simhash_near_duplicates(
        df, text_col, id_col, bits=bits, band_bits=band_bits, max_hamming=max_hamming
    )
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    a = texts.select(F.col("_tid").alias("a"), F.col("_txt").alias("_ta"))
    b = texts.select(F.col("_tid").alias("b"), F.col("_txt").alias("_tb"))
    joined = pairs.join(a, "a").join(b, "b")
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    return (
        joined.select("a", "b", "hamming", dist.alias("edit_distance"))
        .filter((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_distance))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (LSH over random hyperplanes)
# ---------------------------------------------------------------------------


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1] derived
    from a hash — no RNG, same plane every run on every executor."""
    import hashlib

    out = []
    for j in range(dim):
        digest = hashlib.md5(f"plane:{plane_idx}:{j}".encode()).digest()
        v = int.from_bytes(digest[:4], "big") / 2**31 - 1.0
        out.append(v)
    return out


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(v, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, z: acc + z)
    )
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def hyperplane_bucket(vec: Column, dim: int, *, planes: int = 8) -> Column:
    """LSH bucket id: sign bits against ``planes`` deterministic hyperplanes."""
    bits = []
    for p in range(planes):
        plane = F.lit(_hyperplane(dim, p)).cast("array<double>")
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: (x * h).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("int")


def sample_bucket_anchors(
    side: DataFrame,
    bucket_col: str,
    id_col: str,
    max_bucket_size: int | None,
    *,
    salt: str = "bktcap",
) -> DataFrame:
    """Deterministically downsample each LSH bucket to ~``max_bucket_size``
    ANCHOR rows (md5-keyed membership — stable across runs, partitionings,
    and engines). An equi self-join on bucket has no unbounded reducer
    *state* (sort-merge spills), but its fan-out is O(bucket^2) rows of
    cosine work — a degenerate corpus (one near-identical cluster) turns one
    bucket into n^2 compute. Keeping ~cap anchors per bucket bounds the
    fan-out at n x cap while every non-anchor still meets every anchor of
    its bucket, which is what downstream connected-components clustering
    needs to merge the flood into one component. Scalar count aggregate +
    join; ``None`` = no sampling."""
    from .sampling import hash_fraction

    if max_bucket_size is None:
        return side
    # side feeds both the size pre-pass and the join probe; pin it so the
    # upstream bucket computation (hyperplane dot products) runs once
    side = side.localCheckpoint(eager=True)
    sizes = side.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_bn"))
    return (
        side.join(sizes, bucket_col)
        .filter(
            (F.col("_bn") <= max_bucket_size)
            | (hash_fraction(F.col(id_col), salt=salt) < F.lit(float(max_bucket_size)) / F.col("_bn"))
        )
        .drop("_bn")
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    dim: int,
    threshold: float = 0.95,
    planes: int = 8,
    multiprobe: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold.

    Candidates come from hyperplane-LSH buckets (optionally multiprobing the
    ``planes`` single-bit-flip neighbor buckets so near-misses across a
    hyperplane still meet); exact cosine verifies. Shuffle is bucket-local.

    ``max_bucket_size`` (opt-in) bounds the quadratic join fan-out of a
    flooded bucket: the right side keeps ~cap md5-sampled ANCHORS per
    bucket and the pair condition relaxes to ``!=`` with least/greatest
    normalization, so every flooded doc still meets every surviving anchor
    (one connected component downstream) at n x cap instead of n^2 cosine
    evaluations. Default ``None`` = exact candidate set: unlike the minhash
    ``collect_list`` this join holds no unbounded reducer state, so the cap
    is a compute policy, not a memory guard."""
    bucket = hyperplane_bucket(F.col(vec_col), dim, planes=planes)
    base = df.select(F.col(id_col), F.col(vec_col), bucket.alias("_bkt"))
    if multiprobe:
        probes = F.array(
            F.col("_bkt"), *[F.col("_bkt").bitwiseXOR(F.lit(1 << p)) for p in range(planes)]
        )
        left = base.select(id_col, vec_col, F.explode(probes).alias("_probe"))
    else:
        left = base.select(id_col, vec_col, F.col("_bkt").alias("_probe"))
    right = base.select(
        F.col(id_col).alias("_id2"), F.col(vec_col).alias("_vec2"), F.col("_bkt").alias("_probe")
    )
    if max_bucket_size is None:
        joined = left.join(right, on="_probe").filter(F.col(id_col) < F.col("_id2"))
    else:
        right = sample_bucket_anchors(right, "_probe", "_id2", max_bucket_size)
        joined = left.join(right, on="_probe").filter(F.col(id_col) != F.col("_id2"))
    pairs = (
        joined.select(
            F.least(F.col(id_col), F.col("_id2")).alias("a"),
            F.greatest(F.col(id_col), F.col("_id2")).alias("b"),
            cosine(F.col(vec_col), F.col("_vec2")).alias("cos"),
        )
        .distinct()
    )
    return pairs.filter(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    *,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected edge list by iterative
    min-label propagation: ``(node, component)`` where ``component`` is the
    smallest node id reachable from ``node``.

    This is the clustering step every near-dup pipeline needs between
    "candidate pairs" (MinHash/SimHash/LSH output) and "keep one doc per
    cluster": pairs (a,b),(b,c) must collapse to one cluster {a,b,c} even
    though (a,c) was never emitted as a pair.

    Scale design: per round, one join of the current labels against the
    symmetrized edges + one min-aggregate — both shuffles keyed on node id,
    so skew follows node degree (already bounded upstream by the banded LSH
    emitters, which never produce super-nodes beyond band-bucket caps).
    Label frames are ``localCheckpoint``-ed each round to truncate lineage
    (the classic iterative-DataFrame OOM) and the loop exits as soon as a
    round changes nothing. Each round combines neighbor propagation with a
    pointer-doubling compression join, so rounds needed = O(log diameter)
    (a 10^6-long pathological chain converges in ~20 rounds, not 10^6).
    No counterpart in the reference (single-dict validator).

    If ``nodes`` is given (a frame with ``id_col``), isolated documents are
    kept as singleton components; otherwise only endpoint nodes appear.

    Raises ``RuntimeError`` if the loop exhausts ``max_iter`` while labels
    are still changing: a partially-merged labeling silently mislabels
    clusters, so an unconverged run must never be mistaken for an exact one.
    With pointer doubling, 25 rounds cover diameters up to ~2^25 — hitting
    the cap means the graph is pathological or max_iter was lowered.
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # edges are typically the output of an expensive LSH self-join;
        # materialize once or every propagation round re-runs that join
        .localCheckpoint(eager=True)
    )
    endpoints = sym.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        universe = nodes.select(F.col(id_col).alias("node")).distinct()
    else:
        universe = endpoints
    labels = universe.select("node", F.col("node").alias("component")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # candidate label for each node: min over its own label and its
        # neighbors' labels this round
        neighbor = (
            sym.join(labels, on=sym.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        propagated = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer doubling (path compression): follow each node's label to
        # THAT node's label in the same round — chain length halves per
        # round, so a diameter-D path converges in O(log D) rounds instead
        # of O(D). The parent always exists in the frame (labels are node
        # ids from the same universe) and parent.component <= component by
        # the min invariant, so `least` only ever improves.
        parent = propagated.select(
            F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
        )
        new_labels = (
            propagated.join(parent, on=propagated.component == parent._pnode, how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_pcomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds; labels are partially merged — raise max_iter "
            "(pointer doubling needs only O(log diameter) rounds)"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Full dedup decision table: ``(doc_id, component, is_canonical)``.

    ``component`` is the connected-component id over the candidate-pair
    graph (singletons included); ``is_canonical`` marks the one document per
    cluster a dedup pipeline would keep (smallest id — deterministic)."""
    comp = connected_components(
        edges, a_col, b_col, nodes=df, id_col=id_col, max_iter=max_iter
    )
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def dedup_keep_best(
    df: DataFrame,
    edges: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """:func:`dedup_clusters` with a KEEPER POLICY: the canonical document
    per cluster is the one with the highest ``score_col`` (ties broken by
    smallest id) instead of the smallest id — real pipelines keep the
    longest / highest-quality member of a duplicate cluster, not an
    arbitrary one. Returns ``(id, component, score, is_canonical)``.

    Scale shape: after the O(log diameter) component rounds, the keeper is
    two scalar hash aggregates (max score per component, then min id among
    the maxima) plus broadcast-or-shuffle joins keyed on component — no
    window over members, no per-cluster state beyond two scalars, so a
    10M-member boilerplate cluster costs the same per row as a pair."""
    comp = connected_components(
        edges, a_col, b_col, nodes=df, id_col=id_col, max_iter=max_iter
    )
    scored = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(score_col).alias("score")),
        "node",
    )
    best = scored.groupBy("component").agg(F.max("score").alias("_smax"))
    winners = (
        scored.join(best, "component")
        .filter(F.col("score") == F.col("_smax"))
        .groupBy("component")
        .agg(F.min("node").alias("_keep"))
    )
    return scored.join(winners, "component").select(
        F.col("node").alias(id_col),
        "component",
        "score",
        (F.col("node") == F.col("_keep")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Exact duplicated-span removal (substring dedup at token granularity)
# ---------------------------------------------------------------------------


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Remove token spans that occur verbatim in ``min_doc_freq`` or more
    documents (exact substring dedup at token-n-gram granularity, after
    "Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022 — the reference validator has no corpus-level operator at all;
    validation there is per-document, /root/reference/src/okay/validator.py).

    A position is struck when ANY cross-document n-gram covers it, so
    overlapping duplicated grams merge into one removed span — equivalent to
    removing every maximal duplicated substring of length >= n tokens.

    Output: ``(doc_id, n_tokens, n_kept, text_dedup)`` — one row per input
    document (documents shorter than ``n`` tokens pass through unchanged;
    documents that are entirely duplicated text come back empty, not
    dropped, so the caller can distinguish "all boilerplate" from "absent").

    Scale shape (everything is a Column expression — zero Python eval):

    - grams are built per-document with ``transform(sequence(...))`` — no
      cross-document state; the explode is O(total tokens).
    - duplicate detection is ``count_distinct(doc_id)`` per gram. Spark
      expands a distinct aggregate into a two-phase plan keyed on
      ``(gram, doc_id)`` first, so a boilerplate gram present in 10M docs
      spreads over reducers by doc_id instead of pinning one — this is why
      no ``max_doc_freq`` posting cap is needed here, unlike
      ``ngram_jaccard_pairs`` (nothing ever collects a posting list).
    - covered positions come from a shuffle join grams->dup-grams on the
      gram hash, then ``sequence(start, start+n-1)`` explode + distinct on
      ``(doc_id, pos)`` — per-doc bounded state.
    - reconstruction is one hash aggregate per doc_id; per-group state is
      bounded by document length.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = _spread(df).select(F.col(id_col), toks.alias("_w")).localCheckpoint(eager=False)
    gram_arr = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_w") - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, F.lit(n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(F.col(id_col), F.posexplode(gram_arr).alias("start", "gram"))
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("gram")
    )
    cov = (
        grams.join(dup, "gram")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"),
        )
        .distinct()
    )
    tokpos = base.select(F.col(id_col), F.posexplode("_w").alias("pos", "tok"))
    kept = tokpos.join(cov, on=[id_col, "pos"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("_text"),
    )
    return (
        base.select(F.col(id_col), F.size("_w").alias("n_tokens"))
        .join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("_n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("_text"), F.lit("")).alias("text_dedup"),
        )
    )


def drop_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n",
    min_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (CCNet / Dolma-style paragraph
    dedup): a line that occurs verbatim in ``min_doc_freq`` or more distinct
    documents is removed from EVERY document. Complements
    :func:`strip_duplicate_spans` (token n-grams, boilerplate inside a line)
    — this is the coarse-granularity pass real pretraining pipelines run
    first because it is an order of magnitude cheaper: one gram per line
    instead of one per token. The reference validator has no corpus-level
    operator at all (validation there is per-document,
    /root/reference/src/okay/validator.py).

    Output: ``(doc_id, n_lines, n_kept, text_dedup)`` — one row per input
    document. Blank lines (empty after the split) are neither counted nor
    dedup keys; they are dropped from the rebuilt text, so ``text_dedup`` is
    the surviving lines joined by ``sep``. Documents whose every line is
    corpus-duplicated come back as ``""`` with ``n_kept = 0``, not dropped.

    Scale shape (all Column expressions — zero Python eval):

    - lines come from one ``split`` + ``posexplode`` — O(total lines), and
      total lines << total tokens.
    - duplicate detection is ``count_distinct(doc_id)`` per line, which
      Spark expands into a two-phase plan keyed on ``(line, doc_id)`` first:
      a boilerplate line present in 10M docs spreads across reducers by
      doc_id instead of pinning one (same discipline as
      strip_duplicate_spans — nothing ever collects a posting list).
    - the strike is a left-anti join of the per-doc line table against the
      duplicated-line keys; reconstruction is one hash aggregate per doc
      with state bounded by document length.
    - ``base`` is localCheckpoint-ed (lazy) so the split/explode lineage is
      evaluated once across the count pre-pass and the anti-join probe —
      the `_cap_bucket_flood` lesson applied from the start.
    """
    # sep is a Java-regex pattern (default: a literal newline)
    lines_arr = F.filter(F.split(F.col(text_col), sep, -1), lambda x: x != "")
    base = (
        _spread(df)
        .select(F.col(id_col), F.posexplode_outer(lines_arr).alias("pos", "line"))
        .localCheckpoint(eager=False)
    )
    dup = (
        base.filter(F.col("line").isNotNull())
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("line")
    )
    kept = base.filter(F.col("line").isNotNull()).join(dup, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_text"),
    )
    totals = base.groupBy(id_col).agg(
        F.count(F.col("line")).alias("n_lines")
    )
    return totals.join(rebuilt, on=id_col, how="left").select(
        F.col(id_col),
        "n_lines",
        F.coalesce(F.col("_n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("_text"), F.lit("")).alias("text_dedup"),
    )


def semantic_oversized_clusters(
    assignments: DataFrame, max_cluster_size: int
) -> DataFrame:
    """Observability companion of :func:`semantic_duplicates`: the k-means
    clusters its ``max_cluster_size`` cap excluded from pairing —
    ``(list_id, n_members)`` — so truncation is visible, never silent (the
    minhash_oversized_buckets discipline)."""
    return (
        assignments.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_cluster_size)
    )


def semantic_duplicates(
    df: DataFrame,
    *,
    n_lists: int = 8,
    iters: int = 1,
    threshold: float = 0.999,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with deterministic k-means, then
    within each cluster flag every vector with a lower-id neighbor whose
    cosine similarity is >= ``threshold``. The reference validates one
    document at a time (validator.py:7-11) and has no notion of
    corpus-level semantic redundancy; this is the embedding-space member of
    the dedup family (exact / MinHash / SimHash / winnowing / line / span /
    embedding-LSH / semantic-cluster).

    Output: one row per duplicate — ``(vec_id, kept_id, list_id, score)``
    where ``kept_id`` is the best keeper (max cosine, then min id — picked
    by a window ordered on the RAW score; rounding to 6dp happens after
    selection) and ``list_id`` the shared cluster.

    Exactness: clustering reuses :func:`okay_spark.similarity.
    ivf_assignments` — md5-seeded init, decimal(38,12) centroid means,
    argmax-cosine assignment — the ENGINE-PORTABLE k-means whose every
    value the DuckDB twin replays bit-for-bit; cosines are the same
    sequential IEEE folds as the LSH/IVF twins.

    Scale shape: the k-means is iters broadcast+hash-aggregate scans (no
    vector shuffle); the pair stage is a self-join on ``list_id``, so
    pair work is sum over clusters of c^2 — bounded by choosing
    ``n_lists ~ n / target_cluster_size`` (SemDeDup's own knob) and, for
    skewed corpora where k-means still floods one cluster (a constant
    embedding from boilerplate docs), by ``max_cluster_size``: a scalar
    count pre-pass + broadcast anti-join excludes oversized clusters from
    pairing BEFORE the join fan-out (observable via
    :func:`semantic_oversized_clusters`, never silent). The assignment
    frame is localCheckpoint-ed once so the self-join does not re-execute
    the k-means per side.
    """
    from pyspark.sql import Window

    from .similarity import ivf_assignments

    assign, _ = ivf_assignments(
        df, n_lists=n_lists, iters=iters, vec_col=vec_col, id_col=id_col
    )
    pts = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .join(assign.withColumnRenamed(id_col, "_id"), on="_id")
    )
    if max_cluster_size is not None:
        sizes = pts.groupBy("list_id").agg(F.count(F.lit(1)).alias("_n"))
        big = sizes.filter(F.col("_n") > max_cluster_size).select("list_id")
        pts = pts.join(F.broadcast(big), on="list_id", how="left_anti")
    pts = pts.localCheckpoint(eager=True)
    a = pts.select(
        F.col("_id").alias("kept_id"), F.col("_v").alias("_va"), "list_id"
    )
    b = pts.select(F.col("_id").alias("vec_id"), F.col("_v").alias("_vb"), "list_id")
    pairs = (
        a.join(b, on="list_id")
        .filter(F.col("kept_id") < F.col("vec_id"))
        .select(
            "vec_id",
            "kept_id",
            "list_id",
            cosine(F.col("_va"), F.col("_vb")).alias("score"),
        )
        .filter(F.col("score") >= F.lit(float(threshold)))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("kept_id").asc())
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "kept_id", "list_id", F.round("score", 6).alias("score"))
    )


def corpus_group_jaccard(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    *,
    shingle_k: int = 3,
) -> DataFrame:
    """Pairwise exact Jaccard similarity between the word-``shingle_k``-gram
    SETS of corpus groups (languages, sources, dump snapshots) — the
    corpus-level overlap matrix a mixing/decontamination pipeline reads
    before deciding which sources to blend (a high source-pair Jaccard
    means one of them is mostly redundant; a nonzero cross-language
    overlap flags mislabeled or code-switched shards). Corpus-level — no
    per-document counterpart in the reference (/root/reference/src/okay/
    validator.py validates one document at a time).

    Output, one row per unordered group pair with a nonempty
    intersection: ``(ga, gb, n_inter, n_a, n_b, jaccard)`` with
    ``ga < gb``; disjoint pairs are absent (their Jaccard is exactly 0).
    Counts are exact distinct-shingle cardinalities; ``jaccard`` is ONE
    int/int IEEE division ``n_inter / (n_a + n_b - n_inter)`` (integer
    adds first), so the DuckDB twin is bit-identical.

    Scale shape: the (group, shingle) frame is a map-side-combinable
    DISTINCT bounded by groups x shingle-vocabulary, lazily
    localCheckpoint-ed once — it feeds the size aggregate and BOTH sides
    of the intersection join, and without pinning the tokenize/shingle
    pipeline would evaluate three times. The intersection is an equi-join
    on the shingle whose per-key fan-out is bounded by the number of
    groups (each group contributes at most one row per shingle — the
    posting list here can never flood the way a per-document one can);
    group sizes broadcast back (rows = groups). No collect, no global
    sort, no per-document state: safe at any corpus size with a bounded
    group count."""
    e = (
        _spread(df)
        .select(
            F.col(group_col).alias("grp"),
            F.explode(word_shingles(F.col(text_col), shingle_k)).alias("_sh"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = e.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    a = e.select(F.col("grp").alias("ga"), F.col("_sh").alias("_ka"))
    b = e.select(F.col("grp").alias("gb"), F.col("_sh").alias("_kb"))
    inter = (
        a.join(b, F.col("_ka") == F.col("_kb"))
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("grp").alias("_sga"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("_sgb"), F.col("n_sh").alias("n_b"))
    un = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.join(F.broadcast(sa), F.col("ga") == F.col("_sga"))
        .join(F.broadcast(sb), F.col("gb") == F.col("_sgb"))
        .select(
            "ga",
            "gb",
            "n_inter",
            "n_a",
            "n_b",
            F.round(
                F.col("n_inter").cast("double") / un.cast("double"), 6
            ).alias("jaccard"),
        )
    )


def duplicated_ngram_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document duplicated-n-gram ratio — the CCNet/Dolma
    ``dup_ngram`` quality signal: the fraction of a document's DISTINCT
    word ``shingle_k``-grams that occur in at least one OTHER document.
    High ratios mark boilerplate/template documents that survive exact
    dedup because of small edits; pipelines threshold on it before
    training. Per-corpus signal — the reference
    (/root/reference/src/okay/validator.py) sees one document at a time.

    Output, one row per input document: ``(doc_id, n_grams, n_dup,
    dup_ratio)``; documents shorter than ``shingle_k`` tokens have no
    grams and keep their row with ``n_grams 0`` and a NULL ratio (the
    unigram_logprob discipline — never silently drop rows). Counts are
    exact bigints; ``dup_ratio`` is ONE int/int IEEE division, so the
    DuckDB twin is bit-identical.

    Scale shape: ``word_shingles`` is per-document distinct, so the
    exploded (doc, gram) frame has one row per (doc, gram) and its
    per-gram ``count`` IS the document frequency — a scalar
    map-side-combinable aggregate, never a posting list. The frame is
    lazily localCheckpoint-ed (it feeds the frequency build AND the
    probe side — the corpus shingles once); the frequency joins back by
    gram with 1:1 fan-out (each (doc, gram) row picks up one df value;
    AQE skew-split handles a boilerplate gram's probe side). No collect,
    no window, bounded state everywhere."""
    rows = (
        _shingled(df, text_col, id_col, shingle_k)
        .select(F.col(id_col), F.explode("_sh").alias("gram"))
        .localCheckpoint(eager=False)
    )
    dfreq = rows.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    per = (
        rows.join(dfreq, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
    )
    ids = df.select(id_col).distinct()
    return ids.join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint").alias("n_dup"),
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.col("n_dup").cast("double") / F.col("n_grams").cast("double"), 6
            ),
        ).alias("dup_ratio"),
    )


def dedup_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 32,
) -> DataFrame:
    """Exact-duplicate rate as a function of corpus size — the "dedup
    curve" a pipeline reads to decide whether collecting more of a
    source is worth it (duplicate rate rising along the curve means the
    source is exhausting its novelty). The corpus is swept in
    ``buckets`` checkpoints along the ``id_col`` range (the
    :func:`okay_spark.textops.heaps_fit` discipline); checkpoint j
    reports cumulative documents, cumulative distinct texts, and the
    exact duplicate rate over the first j buckets.

    Output, one row per non-empty checkpoint: ``(bucket, n_docs,
    n_distinct, dup_rate)`` with ``dup_rate = (n_docs - n_distinct) /
    n_docs`` — integer subtract first, ONE int/int IEEE division, so
    the DuckDB twin is bit-identical. Grouping is on the raw text
    (exact — no hash seam); NULL texts form their own group in both
    engines.

    Scale shape: bucket assignment is integer arithmetic off one
    bounded min/max collect (2 values); per-bucket doc counts and
    first-occurrence text counts are map-side-combinable aggregates
    (``min(bucket)`` per text — bucket is monotonic in id, never a
    posting list); the cumulative window runs over <= ``buckets``
    rows. The text groupBy shuffles document texts once — the same
    width as exact dedup itself."""
    b = int(buckets)
    mn, mx = df.agg(
        F.min(F.col(id_col).cast("bigint")), F.max(F.col(id_col).cast("bigint"))
    ).first()
    if mn is None:
        return df.sparkSession.createDataFrame(
            [], "bucket bigint, n_docs bigint, n_distinct bigint, dup_rate double"
        )
    span = mx - mn
    if span == 0:
        bucket = F.lit(1).cast("bigint")
    else:
        bucket = F.greatest(
            F.expr(
                f"((CAST({id_col} AS BIGINT) - {mn}L) * {b}L + {span - 1}L)"
                f" div {span}L"
            ),
            F.lit(1).cast("bigint"),
        )
    base = df.select(F.col(text_col).alias("_t"), bucket.alias("_b"))
    docs_per = base.groupBy("_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_docs")
    )
    new_per = (
        base.groupBy("_t")
        .agg(F.min("_b").alias("_fb"))
        .groupBy(F.col("_fb").alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_new"))
    )
    merged = docs_per.join(new_per, "_b", "full_outer").select(
        "_b",
        F.coalesce(F.col("_docs"), F.lit(0)).cast("bigint").alias("_docs"),
        F.coalesce(F.col("_new"), F.lit(0)).cast("bigint").alias("_new"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        merged.select(
            F.col("_b").alias("bucket"),
            F.sum("_docs").over(w).cast("bigint").alias("n_docs"),
            F.sum("_new").over(w).cast("bigint").alias("n_distinct"),
        )
        .filter(F.col("n_docs") > 0)
        .select(
            "bucket",
            "n_docs",
            "n_distinct",
            F.round(
                (F.col("n_docs") - F.col("n_distinct")).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )
