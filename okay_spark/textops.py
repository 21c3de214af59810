"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen): language-ID
(stopword-hit heuristic), quality scoring (length/punct/stopword ratios),
token counting, and document fingerprinting. Functions are deliberately
expressible in ANSI SQL too, so every one has a DuckDB oracle in
``__spark_entry__.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# Tiny deterministic stopword lists (heuristic language ID, not a model).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "que", "pour"],
    "de": ["der", "die", "und", "das", "ein", "eine", "zu", "mit", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "por"],
}

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column | str, *, sep: str = " ") -> Column:
    """Whitespace tokens, empties dropped (single-space separator keeps the
    expression portable to the DuckDB oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, sep), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(text_col)).cast("bigint"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish count: splits on whitespace AND between letter/digit
    boundaries — a cheap BPE proxy (regex split, still JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(F.regexp_replace(c, r"(\d+)", r" $1 "), r"\s+")
    return F.size(F.filter(pieces, lambda t: t != ""))


def _stop_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS[lang])))


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Pick the language whose stopword list hits most (ties -> priority
    order en, fr, de, es; zero hits -> 'und')."""
    toks = tokens(text_col)
    hits = {lang: _stop_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return df.withColumn(out, expr)


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Deterministic [0,1] quality heuristic:

    0.4 * min(1, tokens/64)            (enough content)
    + 0.3 * (1 - punct_ratio * 10 clamped)  (not punctuation soup)
    + 0.3 * stop_ratio * 3 clamped     (natural-language-ness)

    Emits the components too, so thresholds can be re-derived downstream.
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    punct = (n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("double")
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_all = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*[w for ws in STOPWORDS.values() for w in ws]))
    ).cast("double")
    stop_ratio = F.when(n_tok > 0, stop_all / n_tok).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(64.0))
        + F.lit(0.3) * F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 10)
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 3)
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn(out, score)
    )


def normalize_text(text: Column | str) -> Column:
    """Lowercase + collapse whitespace — the canonical form for hashing."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of normalized text (md5 so the DuckDB oracle
    computes the identical value)."""
    return df.withColumn(out, F.md5(normalize_text(text_col)))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array<string> (space-joined)."""
    toks = tokens(text)
    n = F.size(toks)
    # Built with arrays_zip over k shifted slices rather than a
    # transform-over-index lambda: HOF *arguments* are evaluated once per row,
    # while expressions inside lambda *bodies* re-evaluate per element — an
    # index lambda would re-tokenize the text once per shingle.
    width = F.greatest(n - F.lit(k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, width) for j in range(k)])
    shingled = F.array_distinct(
        F.transform(zipped, lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(k)]))
    )
    return F.when(n >= k, shingled).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 2,
) -> DataFrame:
    """Gopher-style in-document repetition metric: the fraction of word
    k-grams that are duplicates of an earlier k-gram in the same document
    (``1 - distinct/total``). High values flag boilerplate / machine-looped
    text that length and stopword filters miss.

    Row-local Column expressions only — embarrassingly parallel, no shuffle;
    the same shifted-slice ``arrays_zip`` construction as
    :func:`word_shingles` (HOF arguments evaluate once per row, index
    lambdas re-evaluate per element)."""
    toks = tokens(text_col)
    n = F.size(toks)
    width = F.greatest(n - F.lit(k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, width) for j in range(k)])
    grams = F.transform(zipped, lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(k)]))
    total = F.when(n >= k, n - F.lit(k - 1)).otherwise(F.lit(0))
    distinct = F.when(n >= k, F.size(F.array_distinct(grams))).otherwise(F.lit(0))
    ratio = F.when(
        total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        total.alias("n_grams"),
        distinct.alias("n_distinct_grams"),
        F.round(ratio, 6).alias("dup_gram_ratio"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Benchmark-decontamination check: for each corpus document, how many
    of its distinct word k-gram shingles also occur anywhere in the
    benchmark set (the standard train/test n-gram-overlap scan).

    Plan: explode distinct shingles on both sides, inner-join on the
    shingle (the benchmark side is deduplicated to distinct shingles first,
    so its size is bounded by its vocabulary, not its row count), then
    re-aggregate per corpus document. At cluster scale the join key is the
    shingle hash — uniformly distributed, no skew beyond natural stopword
    shingles, which the benchmark-side dedup caps at one row each."""
    c_sh = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("_shingle")
    )
    b_sh = (
        benchmark.select(F.explode(word_shingles(text_col, k)).alias("_shingle"))
        .distinct()
    )
    hits = c_sh.join(b_sh, on="_shingle")
    n_sh = corpus.select(
        F.col(id_col), F.size(word_shingles(text_col, k)).alias("n_shingles")
    )
    overlap = hits.groupBy(id_col).agg(F.count("*").alias("n_overlap"))
    return (
        n_sh.join(overlap, on=id_col, how="left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.coalesce("n_overlap", F.lit(0)).cast("double") / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``), ties broken by term — fully
    deterministic, so the DuckDB oracle reproduces it bit-for-bit.

    Plan: one term-frequency aggregate keyed on (doc, term), one
    document-frequency aggregate keyed on term (both partial/map-side
    combined), the corpus size N broadcast as a literal one-row frame, a
    term-keyed join, then a per-document window for the top-k. Every
    shuffle key is either (doc, term) or term — high-cardinality and
    uniform; no driver collection."""
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = df.agg(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1)).alias("_tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", F.round("_tfidf", 6).alias("tfidf"), "rk")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard training-data chunking step before tokenization/packing.

    Output: ``(doc_id, chunk_id, start_token, n_tokens, chunk_text)``, one
    row per window; windows start every ``chunk_tokens - overlap`` tokens
    and a trailing window fully contained in the previous one is dropped
    (``start < n - overlap`` unless it is the only window). Row-local
    Column expressions only (sequence/transform/slice + one posexplode) —
    no shuffle, embarrassingly parallel at any scale."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)),
        lambda s: (s == 0) | (s < n - overlap),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_token"),
            F.least(F.lit(chunk_tokens), n - s).alias("n_tokens"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk_text"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_c"))
        .select(
            id_col,
            "chunk_id",
            F.col("_c.start_token").alias("start_token"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def pack_chunks(
    chunks: DataFrame,
    *,
    budget_tokens: int = 256,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    text_col: str = "chunk_text",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Greedy sequence packing: concatenate chunks into training sequences
    of at most ``budget_tokens`` tokens (first-fit in deterministic
    (doc_id, chunk_id) order), the step between chunking and tokenization
    that lifts padding efficiency.

    Packing is inherently sequential, so it runs per BUCKET
    (``pmod(xxhash64(doc_id), n_buckets)`` — id-type-agnostic, so string doc
    ids like the flagship ``doc-%012d`` shape bucket fine) as an
    Arrow-batched ``applyInPandas`` group: each bucket packs its own chunks
    independently — embarrassingly parallel across buckets, deterministic
    within (sorted input, stable ids). A chunk never crosses buckets, so
    packing quality degrades only marginally versus a global greedy pass
    while the plan stays one shuffle on the bucket key. Chunks longer than
    the budget become singleton sequences. ``doc_ids`` keeps the input id
    type (``array<input id type>``).

    ``bucket_expr`` overrides the default ``xxhash64`` bucketing with any
    deterministic Column (cast to int) — e.g. ``pmod(doc_id, n)`` when an
    external oracle must reproduce the bucket assignment (xxhash64 is
    Spark-specific)."""
    from pyspark.sql import functions as F

    id_type = chunks.schema[id_col].dataType.simpleString()
    out_ddl = (
        "bucket int, seq_id bigint, n_chunks int, total_tokens int, "
        f"doc_ids array<{id_type}>, packed_text string"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values([id_col, chunk_col]).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        # plain-list iteration, not iterrows(): the greedy reset is an
        # irreducible sequential loop, but per-step cost drops ~10x when it
        # walks python scalars instead of materializing a Series per row
        doc_ids = pdf[id_col].tolist()
        toks = pdf[tokens_col].astype("int64").tolist()
        texts = pdf[text_col].tolist()
        rows, cur_docs, cur_texts, cur_tok, seq = [], [], [], 0, 0

        def flush():
            nonlocal cur_docs, cur_texts, cur_tok, seq
            if cur_docs:
                rows.append(
                    (bucket, seq, len(cur_docs), cur_tok, cur_docs, " ".join(cur_texts))
                )
                seq += 1
                cur_docs, cur_texts, cur_tok = [], [], 0

        for d, t, x in zip(doc_ids, toks, texts):
            if cur_tok and cur_tok + t > budget_tokens:
                flush()
            cur_docs.append(d)
            cur_texts.append(x)
            cur_tok += t
            if cur_tok >= budget_tokens:
                flush()
        flush()
        return pd.DataFrame(
            rows,
            columns=["bucket", "seq_id", "n_chunks", "total_tokens", "doc_ids", "packed_text"],
        )

    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    with_bucket = chunks.withColumn("bucket", bucket_expr.cast("int"))
    return with_bucket.groupBy("bucket").applyInPandas(pack, out_ddl)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    classic low-information-content filter: machine-generated or boilerplate
    text compresses far below prose.

    zlib is not expressible in Column expressions, so this is a declared
    Arrow seam: one vectorized ``pandas_udf`` batch per ~10k docs, no
    shuffle, embarrassingly parallel. Alongside the ratio it emits the exact
    integer byte counts (``raw_bytes`` utf-8 length, ``comp_bytes``
    compressed length) so an external oracle can verify the distributed
    execution cell-for-cell: integers hash exactly across engines, and
    ``raw_bytes`` is independently recomputable as ``octet_length`` in any
    SQL dialect. Empty text: ratio 0.0 by definition (comp_bytes still
    reports zlib's 8-byte empty frame); NULL text: all three NULL."""

    @F.pandas_udf("struct<raw_bytes:bigint,comp_bytes:bigint,compression_ratio:double>")
    def ratio(s: pd.Series) -> pd.DataFrame:
        import zlib

        def one(t):
            if t is None:
                return (None, None, None)
            raw = t.encode("utf-8")
            comp = len(zlib.compress(raw, level))
            if not raw:
                return (0, comp, 0.0)
            return (len(raw), comp, round(comp / len(raw), 6))

        out = pd.DataFrame(
            [one(t) for t in s],
            columns=["raw_bytes", "comp_bytes", "compression_ratio"],
        )
        out["raw_bytes"] = out["raw_bytes"].astype("Int64")
        out["comp_bytes"] = out["comp_bytes"].astype("Int64")
        return out

    return df.select(F.col(id_col), ratio(F.col(text_col)).alias("_c")).select(
        id_col, "_c.raw_bytes", "_c.comp_bytes", "_c.compression_ratio"
    )


# PII patterns kept to the regex subset with identical semantics in Java
# regex (Spark's regexp_count/regexp_replace) and RE2 (the DuckDB oracle):
# character classes, bounded repetition, \b, non-capturing groups. No
# lookaround, no backreferences, no Python-only constructs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII exposure counts (emails, IPv4 addresses, phone-shaped
    numbers) — the standard pre-training privacy scan that decides whether a
    document is dropped, redacted, or kept.

    Counts are non-overlapping leftmost matches via ``regexp_count`` — pure
    JVM Column expressions, row-local, no shuffle, embarrassingly parallel;
    the pattern set is dialect-portable so the DuckDB oracle reproduces the
    counts exactly. NULL text coalesces to zero counts / has_pii=false so
    every input row gets a definite keep/redact/drop decision — a NULL
    has_pii would silently vanish from BOTH branches of a
    ``filter(has_pii)`` / ``filter(~has_pii)`` split."""
    c = F.col(text_col)
    counts = {
        kind: F.coalesce(F.regexp_count(c, F.lit(pat)), F.lit(0))
        .cast("bigint")
        .alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }
    total = sum(
        (F.coalesce(F.regexp_count(c, F.lit(p)), F.lit(0)) for p in PII_PATTERNS.values()),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        *counts.values(),
        total.cast("bigint").alias("pii_total"),
        (total > 0).alias("has_pii"),
    )


def pii_redact(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with a ``[KIND]`` placeholder (e.g.
    ``[EMAIL]``) — the keep-but-redact path of the privacy scan. Chained
    ``regexp_replace`` calls, one per kind, all JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds or list(PII_PATTERNS):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (bits) of the character distribution — another
    low-information filter (repeated char runs, binary junk score near 0).

    Pure Column expressions: split to chars, count each distinct char via
    HOF filter, fold -p*log2(p). Distinct chars are SORTED before the fold
    so the floating sum has one canonical order (bit-identical on any
    partitioning and in the SQL oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    n = F.size(chars)
    uniq = F.array_sort(F.array_distinct(chars))
    probs = F.transform(
        uniq, lambda u: F.size(F.filter(chars, lambda x: x == u)).cast("double") / n
    )
    ent = F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc - p * F.log2(p)
    )
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def rare_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_df: int = 2,
) -> DataFrame:
    """Per-document rare-token (OOV-ish) quality signal: how much of each
    document is made of tokens that are rare across the whole corpus. Rare
    tokens correlate with typos, codes, and boilerplate IDs — pretraining
    pipelines (e.g. Gopher's quality rules, CCNet's LM filtering) threshold
    on exactly this family of signals. The reference validator has no
    corpus-level statistics at all (per-document validation only,
    /root/reference/src/okay/validator.py).

    A token is *rare* when its corpus document frequency (number of distinct
    documents containing it) is strictly below ``min_df``. Output, one row
    per document: ``(doc_id, n_tokens, n_rare, min_token_df, rare_ratio)``
    where ``rare_ratio = n_rare / n_tokens`` as an IEEE double (a single
    correctly-rounded division of two integers — bit-identical on any
    engine, unlike a float sum). Documents with zero tokens keep a row with
    ``n_tokens = 0`` and null ``min_token_df`` / ``rare_ratio``.

    Scale shape (all Column expressions — zero Python eval):

    - per-(doc, token) occurrence counts first (one hash aggregate with
      map-side combine) — this is also what bounds the vocabulary pass:
      corpus df per token is ``count(*)`` over the already-unique
      (doc, token) pairs, never a posting list.
    - the df join back is an equi-join on token. The build side has ONE row
      per token, so AQE's skew-join split handles a stopword present in 10M
      docs by splitting the probe partition and replicating the single
      build row — no salting needed (salting exists for skewed *build*
      sides; see BENCH/SKEW.md for where that discipline applies).
    - the final per-document rollup is one hash aggregate keyed by doc_id
      with constant per-group state.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), F.explode_outer(toks).alias("tok"))
    dt = base.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        dt.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    joined = dt.join(vocab, "tok", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(
            F.when(F.col("df") < min_df, F.col("cnt")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_rare"),
        F.min("df").cast("bigint").alias("min_token_df"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        "n_rare",
        "min_token_df",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_rare").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("rare_ratio"),
    )


# Dialect-portable (Java regex == RE2) URL-domain extractor: scheme then
# capture the host run. Deliberately no lookarounds and no \w (Unicode
# semantics differ across engines).
URL_DOMAIN_REGEX = r"https?://([0-9A-Za-z.-]+)"


def url_domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain URL exposure stats over a text corpus — the first question
    a web-scale ingest asks (domain mix, blocklist screening, single-domain
    flood detection before dedup). Output: one row per lower-cased domain —
    ``(domain, n_urls, n_docs)`` with total URL occurrences and the exact
    count of distinct documents mentioning it.

    Scale shape: extraction is a codegen ``regexp_extract_all`` + explode
    (no Python); the distinct-doc count follows the rare_token_stats
    discipline — pre-aggregate (domain, doc) pairs first so a domain
    mentioned 10^9 times collapses map-side to one row per doc per map
    task, then scalar-only sum/count per domain. Never a collect_list, so
    a flooded domain (cdn.example.com on half the web) costs one reducer
    one scalar row per distinct doc. NULL text extracts nothing.
    """
    doms = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_DOMAIN_REGEX), F.lit(1))
        ).alias("_d"),
    ).select(F.lower(F.col("_d")).alias("domain"), "_id")
    pairs = doms.groupBy("domain", "_id").agg(F.count(F.lit(1)).alias("_n"))
    return pairs.groupBy("domain").agg(
        F.sum("_n").cast("bigint").alias("n_urls"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_n: int = 200,
) -> DataFrame:
    """Least-squares fit of Zipf's law over the corpus token-frequency
    distribution: slope/intercept/R^2 of ``ln(freq) ~ ln(rank)`` on the
    ``top_n`` most frequent tokens. Natural text sits near slope -1;
    machine-generated or template-heavy corpora flatten (slope -> 0) or
    cliff — a whole-corpus health signal no per-document rule can see (the
    reference validates documents one at a time,
    /root/reference/src/okay/validator.py).

    Output, ONE row: ``(n_terms, slope, intercept, r2)`` (natural-log
    space, rounded to 6dp). Fewer than 2 distinct tokens -> NULL fit
    columns (a vertical/degenerate regression); empty corpus -> n_terms 0.

    Scale shape: per-(doc, token) counts first (map-side combinable hash
    aggregate), token totals by a second scalar aggregate — the vocabulary
    pass never builds a posting list. The top-N selection is
    ``orderBy(tf desc, tok asc).limit(n)`` — physical TakeOrderedAndProject,
    each task keeps its own top N and the driver merges (bounded by
    ``top_n``, never a global sort); ties at the cut break on the token
    string so the selected set is a deterministic total order on any
    engine. Ranking and the five regression moments then run over <= top_n
    rows; each moment accumulates in decimal(38,12) (the moment
    discipline) so slope/intercept/r2 are independent of partial-
    aggregation order and bit-identical to the DuckDB twin."""
    from pyspark.sql import Window

    toks = tokens(text_col)
    base = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    dt = base.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = dt.groupBy("tok").agg(F.sum("cnt").cast("bigint").alias("tf"))
    top = vocab.orderBy(F.col("tf").desc(), F.col("tok").asc()).limit(top_n)
    w = Window.orderBy(F.col("tf").desc(), F.col("tok").asc())
    ranked = top.select(
        F.row_number().over(w).cast("double").alias("_x_rank"), F.col("tf")
    ).select(
        F.log(F.col("_x_rank")).alias("_x"), F.log(F.col("tf").cast("double")).alias("_y")
    )

    def dec(c: Column) -> Column:
        return F.sum(c.cast("decimal(38,12)")).cast("double")

    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        dec(F.col("_x")).alias("_sx"),
        dec(F.col("_y")).alias("_sy"),
        dec(F.col("_x") * F.col("_x")).alias("_sxx"),
        dec(F.col("_x") * F.col("_y")).alias("_sxy"),
        dec(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_terms").cast("double")
    # operation order is load-bearing for the oracle: every product/difference
    # below is spelled identically in the DuckDB twin
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = cov / vx
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    r2 = (cov * cov) / (vx * vy)
    fit_ok = (F.col("n_terms") >= 2) & (vx > 0)
    return m.select(
        "n_terms",
        F.when(fit_ok, F.round(slope, 6)).alias("slope"),
        F.when(fit_ok, F.round(intercept, 6)).alias("intercept"),
        F.when(fit_ok & (vy > 0), F.round(r2, 6)).alias("r2"),
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality score, the unigram special case:
    each document's mean token log-probability under the corpus's own
    maximum-likelihood unigram model (``sum(cnt * ln(tf/total)) /
    n_tokens``). Gibberish, codes and boilerplate IDs score far below the
    corpus mode; real pipelines threshold on exactly this signal (CCNet
    buckets by wiki-LM perplexity — the unigram model is the
    dependency-free analog and this operator is its exact distributed
    form). Complements :func:`rare_token_stats` (document-frequency based)
    with an occurrence-frequency measure.

    Output, one row per document: ``(doc_id, n_tokens, avg_logprob)``;
    empty documents keep their row with ``n_tokens = 0`` and NULL score.
    avg_logprob is <= 0 by construction (p <= 1).

    Scale shape (all Column expressions — zero Python eval): per-(doc,
    token) counts first (map-side combine, lazily ``localCheckpoint``-ed —
    the frame feeds both the vocabulary build and the probe side of the
    join, and without the pin the null-filter differentiates the subtrees
    and the corpus tokenizes twice), token occurrence totals as a second
    scalar aggregate (never a posting list), the corpus total re-derived
    from the vocabulary frame itself and broadcast back (one input scan —
    the key_skew_stats discipline, never ``df.count()``).
    The probability is ONE bigint/bigint IEEE division and the per-token
    term ``cnt * ln(p)`` is a deterministic row-local double; the per-doc
    sum runs through decimal(38,12) casts so the score is independent of
    aggregation order and bit-identical on any engine. The vocabulary
    join is an equi-join on token with one build row per token — AQE's
    skew split handles stopword probes, no salting needed."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col), F.explode_outer(toks).alias("tok"))
    # lazy localCheckpoint: dt feeds BOTH the vocabulary build and the probe
    # side of the join — without it the null-filter differentiates the two
    # subtrees and Spark tokenizes + aggregates the whole corpus twice (the
    # drop_duplicate_lines discipline)
    dt = (
        base.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        dt.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("cnt").cast("bigint").alias("tf"))
    )
    tot = vocab.agg(F.sum("tf").cast("bigint").alias("_tot"))
    probed = dt.join(vocab, "tok", "left").crossJoin(F.broadcast(tot))
    term = F.col("cnt").cast("double") * F.log(
        F.col("tf").cast("double") / F.col("_tot").cast("double")
    )
    per_doc = probed.groupBy(id_col).agg(
        F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(
            F.when(F.col("tok").isNotNull(), term).otherwise(F.lit(0.0)).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("_sum_lp"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_sum_lp") / F.col("n_tokens").cast("double"), 6),
        ).alias("avg_logprob"),
    )


def dsir_logratio(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): each document's mean
    per-token log-likelihood RATIO between a target-domain unigram model
    and the raw-corpus unigram model, ``sum(cnt * (ln p_target(tok) -
    ln p_raw(tok))) / n_tokens``. Documents that look like the target
    subset (``target`` = a boolean Column over ``df``'s rows, e.g.
    ``F.col('lang') == 'en'``) score high; sampling by this weight is the
    published recipe for selecting pretraining data that matches a
    high-quality domain. Both models are add-one (Laplace) smoothed over
    the RAW vocabulary — ``p(tok) = (tf + 1) / (total + V)`` — so
    target-absent tokens contribute a finite penalty instead of -inf.

    Output, one row per document: ``(doc_id, n_tokens, dsir_logratio)``;
    empty documents keep their row with ``n_tokens = 0`` and NULL score.

    Exactness: counts/totals/V are exact bigints; each probability is
    one ``(tf+1)/(total+V)`` double division of bigint casts (integer
    adds BEFORE the cast); the per-token term subtracts the two ``ln``
    values in a fixed order and the per-document sum runs through
    decimal(38,12) casts, so the score is independent of aggregation
    order and reproduces bit-for-bit on any engine (the
    unigram_logprob_score precedent).

    Scale shape (all Column expressions — zero Python eval): identical to
    :func:`unigram_logprob_score` — per-(doc, token) counts map-side
    combined and lazily ``localCheckpoint``-ed (the frame feeds both the
    vocabulary build and the probe join), BOTH models' token totals from
    ONE vocabulary aggregate (``tf_raw`` and a conditional ``tf_target``
    sum in the same pass — the target model costs no extra scan), corpus
    totals + vocabulary size re-derived from the vocabulary frame and
    broadcast back. One equi-join on token; AQE's skew split handles
    stopword probes."""
    toks = tokens(text_col)
    tgt = F.coalesce(target.cast("boolean"), F.lit(False))
    base = df.select(
        F.col(id_col), tgt.alias("_tgt"), F.explode_outer(toks).alias("tok")
    )
    dt = (
        base.groupBy(id_col, "_tgt", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        dt.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(
            F.sum("cnt").cast("bigint").alias("tf_raw"),
            F.coalesce(
                F.sum(F.when(F.col("_tgt"), F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("tf_tgt"),
        )
    )
    tot = vocab.agg(
        F.sum("tf_raw").cast("bigint").alias("_tot_raw"),
        F.sum("tf_tgt").cast("bigint").alias("_tot_tgt"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
    )
    probed = dt.join(vocab, "tok", "left").crossJoin(F.broadcast(tot))

    def lp(tf: Column, tot_c: Column) -> Column:
        # integer adds first, then ONE double division — exact operands
        return F.log(
            (tf + F.lit(1)).cast("double") / (tot_c + F.col("_v")).cast("double")
        )

    term = F.col("cnt").cast("double") * (
        lp(F.col("tf_tgt"), F.col("_tot_tgt")) - lp(F.col("tf_raw"), F.col("_tot_raw"))
    )
    per_doc = probed.groupBy(id_col).agg(
        F.sum(F.when(F.col("tok").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(
            F.when(F.col("tok").isNotNull(), term).otherwise(F.lit(0.0)).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("_sum_lr"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_sum_lr") / F.col("n_tokens").cast("double"), 6),
        ).alias("dsir_logratio"),
    )


def quality_buckets(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2019): rank
    every document WITHIN its language by LM quality
    (:func:`unigram_logprob_score` — the dependency-free analog of
    CCNet's wiki-LM perplexity) and split each language into equal
    thirds: the best-scoring third is ``head``, then ``middle``, then
    ``tail``. Real pipelines train on head+middle and drop tail; doing
    it per language is the point (one global threshold would call all
    low-resource-language text "tail").

    Output, one row per document: ``(doc_id, group, n_tokens,
    avg_logprob, bucket)``. Bucket is decided by EXACT integer cumulative
    counts — with ``c`` = docs in the group scoring >= mine (ties
    included) and ``n`` = docs in the group with a score: ``3c <= n`` ->
    head, ``3c <= 2n`` -> middle, else tail — so a tie group that spans a
    boundary falls wholly into the later bucket, deterministically on any
    engine (no float-epsilon thresholds). NULL score (empty doc) -> NULL
    bucket; a NULL group forms its own cohort (null-safe join back).

    Scale shape: the ranking runs over the per-(group, score) COUNTS
    frame (the :func:`okay_spark.relops.grouped_cume_dist` discipline),
    so the ordered window is bounded by distinct score cardinality —
    scores are rounded to 6dp so hot values collapse; worst case it is
    one row per document, at which point derive the two cut scores per
    language with the two-pass bracket
    (:func:`okay_spark.checks.exact_quantiles_twopass`) instead and keep
    only the comparison join. Buckets reach documents via a
    broadcast-able equi-join back on (group, score)."""
    # lazy localCheckpoint: scored feeds BOTH the bucket-threshold build and
    # the probe side of the join-back — without it the whole unigram pipeline
    # (corpus tokenization included) evaluates twice (the
    # unigram_logprob_score discipline)
    scored = (
        unigram_logprob_score(df, text_col, id_col)
        .join(df.select(F.col(id_col), F.col(group_col).alias("_grp")), id_col)
        .localCheckpoint(eager=False)
    )
    # fresh aliases (_bgrp/_score) give the bucket frame its own attribute
    # IDs, so the join below is not an ambiguous self-join
    scr = (
        scored.filter(F.col("avg_logprob").isNotNull())
        .groupBy(
            F.col("_grp").alias("_bgrp"), F.col("avg_logprob").alias("_score")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    )
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy("_bgrp")
        .orderBy(F.col("_score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("_bgrp")
    buckets = scr.select(
        "_bgrp",
        "_score",
        F.when(3 * F.sum("_cnt").over(w_cum) <= F.sum("_cnt").over(w_tot), "head")
        .when(3 * F.sum("_cnt").over(w_cum) <= 2 * F.sum("_cnt").over(w_tot), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    joined = scored.join(
        buckets,
        on=F.col("_grp").eqNullSafe(F.col("_bgrp"))
        & (F.col("avg_logprob") == F.col("_score")),
        how="left",
    )
    return joined.select(
        F.col(id_col),
        F.col("_grp").alias(group_col),
        F.col("n_tokens"),
        F.col("avg_logprob"),
        F.col("bucket"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Top-N bigram collocations by pointwise mutual information —
    ``pmi = ln( p(w1 w2) / (p(w1) p(w2)) )`` over adjacent token pairs.
    High-PMI pairs are multi-word expressions ("new york", "machine
    learning"); a corpus whose top collocations are template fragments
    ("click here", "terms of") is boilerplate-heavy — a corpus-level
    quality signal the per-document reference (/root/reference/src/okay/
    validator.py) cannot see.

    Output, ``top_n`` rows: ``(w1, w2, n_pair, n_w1, n_w2, pmi)`` with
    ``pmi`` rounded to 6dp for display but SELECTED and ORDERED on the raw
    double (ties at the cut break on ``(w1, w2)`` so the chosen set is a
    deterministic total order on any engine — the zipf_fit cut
    discipline). ``min_count`` drops hapax pairs whose PMI is pure noise
    (the standard Church-Hanks practice).

    Exactness: probabilities are spelled as one fixed IEEE expression —
    ``ln((n_pair/nb) / ((n_w1/nu) * (n_w2/nu)))`` with each count cast to
    double individually — so both engines evaluate the identical
    correctly-rounded op sequence; no float accumulation anywhere
    (totals are exact bigint sums).

    Scale shape: bigrams come from ``zip_with(toks, tail-of-toks, ...)``
    row-locally (the adjacent_pair_violations idiom — no window, no
    shuffle to pair up); pair and unigram counts are map-side-combinable
    hash aggregates bounded by vocabulary, and the totals re-derive from
    those aggregated frames broadcast back (the key_skew_stats
    discipline — the corpus is scanned once per frame, never re-counted).
    The unigram joins are equi-joins whose build side has ONE row per
    token (AQE skew-split handles a stopword probe side). The final cut
    is ``orderBy(...).limit(top_n)`` — physical TakeOrderedAndProject,
    per-task top-N, never a global sort."""
    toks = tokens(text_col)
    pair_struct = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = df.select(F.explode(pair_struct).alias("_p")).select("_p.w1", "_p.w2")
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        # feeds the bigram total AND the probe side — one evaluation
        .localCheckpoint(eager=False)
    )
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"))
        .localCheckpoint(eager=False)
    )
    nb = bi.agg(F.sum("n_pair").cast("bigint").alias("_nb"))
    nu = uni.agg(F.sum("n_tok").cast("bigint").alias("_nu"))
    cand = (
        bi.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_w1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    raw = F.log(
        (d("n_pair") / d("_nb")) / ((d("n_w1") / d("_nu")) * (d("n_w2") / d("_nu")))
    )
    return (
        cand.withColumn("_raw", raw)
        .orderBy(F.col("_raw").desc(), "w1", "w2")
        .limit(top_n)
        .select("w1", "w2", "n_pair", "n_w1", "n_w2", F.round("_raw", 6).alias("pmi"))
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    *,
    sep: str = "\n",
    min_docs: int = 2,
    min_frac: float = 0.0,
) -> DataFrame:
    """Boilerplate-line detector (the CCNet/OSCAR pre-dedup profile): lines
    repeated verbatim across many DISTINCT documents — nav bars, cookie
    banners, license footers — optionally profiled within a grouping
    column (URL domain, source) since boilerplate is domain-local. This is
    the *reporting* face of :func:`okay_spark.dedup.drop_duplicate_lines`
    (which strikes such lines): run this first to pick the threshold, then
    strike.

    Output, one row per flagged (group,) line: ``(group?, line, n_docs,
    n_docs_group, doc_frac)`` where ``n_docs`` counts distinct documents
    in the group containing the line, ``n_docs_group`` the group's total
    distinct documents, and ``doc_frac = n_docs / n_docs_group`` — a
    single integer/integer IEEE division (bit-identical on any engine).
    Flagged means ``n_docs >= min_docs`` AND ``doc_frac >= min_frac``.
    Empty lines never flag (dropped at the split).

    Scale shape: two-phase count_distinct throughout (the
    drop_duplicate_lines discipline) — distinct (group, line, doc) tuples
    first (map-side combinable; a line pasted 10^6 times into one doc
    collapses before the shuffle), then scalar counts per (group, line);
    NEVER a posting list. Group doc totals re-derive from the distinct
    (group, doc) pairs and join back on the group key (broadcast-able —
    one row per group). A line shared by 10M docs costs one reducer one
    scalar row per doc, not a collect."""
    grp = [group_col] if group_col else []
    lines = df.select(
        *grp,
        F.col(id_col).alias("_id"),
        F.explode(F.filter(F.split(F.col(text_col), sep), lambda x: x != "")).alias(
            "line"
        ),
    )
    gld = lines.groupBy(*grp, "line", "_id").agg(F.count(F.lit(1)).alias("_n"))
    per_line = gld.groupBy(*grp, "line").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    if group_col:
        totals = (
            df.select(group_col, F.col(id_col).alias("_id"))
            .groupBy(group_col, "_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_group"))
        )
        flagged = per_line.join(F.broadcast(totals), group_col)
    else:
        totals = (
            df.groupBy(F.col(id_col).alias("_id"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_group"))
        )
        flagged = per_line.crossJoin(F.broadcast(totals))
    frac = F.col("n_docs").cast("double") / F.col("n_docs_group").cast("double")
    return (
        flagged.withColumn("doc_frac", frac)
        .filter((F.col("n_docs") >= min_docs) & (F.col("doc_frac") >= min_frac))
        .select(*grp, "line", "n_docs", "n_docs_group", "doc_frac")
    )


def log_odds_tokens(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    *,
    target: str = "en",
    alpha0: float = 100.0,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Token-level log-odds-ratio with an informative Dirichlet prior
    (Monroe/Colaresi/Quinn 2008, "Fightin' Words") comparing the
    ``target`` group against the rest of the corpus — the standard
    which-terms-characterize-this-source diagnostic a mixing pipeline
    reads before reweighting, far more stable than raw frequency ratios
    for rare terms because the corpus-wide prior shrinks them. Corpus
    comparison — no per-document counterpart in the reference
    (/root/reference/src/okay/validator.py).

    Output, ``top_n`` rows by |z| (ties on the token): ``(tok, n_target,
    n_rest, delta, z)`` — ``delta`` the prior-smoothed log-odds
    difference, ``z = delta / sqrt(1/(y1+a) + 1/(y2+a))``. Display values
    are rounded to 6dp but ORDERED on the raw doubles.

    Exactness: counts are exact bigints from one (token, side) hash
    aggregate; the prior and both log terms are spelled as ONE fixed
    IEEE expression (integer adds first, each count cast to double
    individually, left-associative +/-), so the DuckDB twin evaluates
    the identical correctly-rounded op sequence — the PMI discipline.

    Scale shape: one map-side-combinable token aggregate bounded by
    vocabulary, lazily localCheckpoint-ed (it feeds the totals AND the
    candidate frame — the corpus is tokenized once); totals re-aggregate
    the bounded frame and broadcast back (the key_skew_stats
    discipline); the cut is ``orderBy().limit()`` — physical
    TakeOrderedAndProject, per-task top-N, never a global sort."""
    toks = tokens(text_col)
    is_t = F.coalesce(F.col(group_col) == F.lit(target), F.lit(False))
    base = df.select(is_t.alias("_t"), F.explode(toks).alias("tok"))
    cnt = (
        base.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("bigint").alias("n_target"),
            F.sum(F.when(~F.col("_t"), 1).otherwise(0)).cast("bigint").alias("n_rest"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(
        F.sum("n_target").cast("bigint").alias("_n1"),
        F.sum("n_rest").cast("bigint").alias("_n2"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    a0 = F.lit(float(alpha0))
    cand = (
        cnt.filter((F.col("n_target") + F.col("n_rest")) >= min_count)
        .crossJoin(F.broadcast(tot))
    )
    ai = a0 * d(F.col("n_target") + F.col("n_rest")) / d(F.col("_n1") + F.col("_n2"))
    delta = F.log(
        (d(F.col("n_target")) + ai)
        / (d(F.col("_n1")) + a0 - d(F.col("n_target")) - ai)
    ) - F.log(
        (d(F.col("n_rest")) + ai)
        / (d(F.col("_n2")) + a0 - d(F.col("n_rest")) - ai)
    )
    var = F.lit(1.0) / (d(F.col("n_target")) + ai) + F.lit(1.0) / (
        d(F.col("n_rest")) + ai
    )
    z = delta / F.sqrt(var)
    return (
        cand.withColumn("_delta", delta)
        .withColumn("_z", z)
        .orderBy(F.abs(F.col("_z")).desc(), "tok")
        .limit(top_n)
        .select(
            "tok",
            "n_target",
            "n_rest",
            F.round("_delta", 6).alias("delta"),
            F.round("_z", 6).alias("z"),
        )
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 32,
) -> DataFrame:
    """Least-squares fit of Heaps' law ``V(N) = K * N^beta`` — vocabulary
    growth against corpus size, the complement of :func:`zipf_fit`.
    Natural text sits near beta 0.4-0.6; a template/boilerplate corpus
    saturates (beta -> 0) and synthetic noise stays near 1 — a
    whole-corpus health signal for dedup/mixing decisions that no
    per-document rule can see (the reference validates one document at a
    time, /root/reference/src/okay/validator.py).

    The corpus is swept in ``buckets`` checkpoints along the ``id_col``
    range: checkpoint j accumulates total tokens ``N_j`` and distinct
    vocabulary ``V_j`` over all documents whose id falls in the first j
    id-range buckets, and the regression runs on ``(ln N_j, ln V_j)``.
    Output, ONE row: ``(n_points, beta, intercept, r2)`` (natural-log
    space, 6dp; ``K = exp(intercept)``). Fewer than 2 usable checkpoints
    -> NULL fit columns.

    Exactness: bucket assignment is pure INTEGER arithmetic
    ``((id - min) * B + span - 1) div span`` off one bounded min/max
    collect (2 values — the histogram-bins discipline), a token's first
    bucket is ``min(bucket)`` (bucket is monotonic in id), cumulative
    N/V are exact bigint window sums over the B-row bucket frame, and
    the five regression moments accumulate in decimal(38,12) (the
    zipf_fit discipline) — the DuckDB twin is bit-identical.

    Scale shape: one (doc, token) hash aggregate (map-side combinable,
    lazily localCheckpoint-ed — it feeds both the per-bucket token sums
    and the first-occurrence vocabulary pass, so the corpus tokenizes
    once); both per-bucket frames are B rows, the cumulative window and
    the regression run on <= B rows. ``(id-min)*B`` needs ids below
    2^63/B — any practical id space."""
    from pyspark.sql import Window

    b = int(buckets)
    mn, mx = df.agg(
        F.min(F.col(id_col).cast("bigint")), F.max(F.col(id_col).cast("bigint"))
    ).first()
    if mn is None:
        empty = df.sparkSession.createDataFrame(
            [(0,)], "n_points bigint"
        )
        return empty.select(
            "n_points",
            F.lit(None).cast("double").alias("beta"),
            F.lit(None).cast("double").alias("intercept"),
            F.lit(None).cast("double").alias("r2"),
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
    toks = tokens(text_col)
    dt = (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    per_bucket_tokens = (
        dt.withColumn("_b", bucket)
        .groupBy("_b")
        .agg(F.sum("cnt").cast("bigint").alias("_toks"))
    )
    first_bucket = (
        dt.withColumn("_b", bucket)
        .groupBy("tok")
        .agg(F.min("_b").alias("_fb"))
        .groupBy(F.col("_fb").alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_new"))
    )
    merged = per_bucket_tokens.join(
        first_bucket, "_b", "full_outer"
    ).select(
        "_b",
        F.coalesce(F.col("_toks"), F.lit(0)).cast("bigint").alias("_toks"),
        F.coalesce(F.col("_new"), F.lit(0)).cast("bigint").alias("_new"),
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    pts = merged.select(
        F.sum("_toks").over(w).cast("bigint").alias("_n"),
        F.sum("_new").over(w).cast("bigint").alias("_v"),
    ).filter((F.col("_n") > 0) & (F.col("_v") > 0))
    xy = pts.select(
        F.log(F.col("_n").cast("double")).alias("_x"),
        F.log(F.col("_v").cast("double")).alias("_y"),
    )

    def dec(c: Column) -> Column:
        return F.sum(c.cast("decimal(38,12)")).cast("double")

    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        dec(F.col("_x")).alias("_sx"),
        dec(F.col("_y")).alias("_sy"),
        dec(F.col("_x") * F.col("_x")).alias("_sxx"),
        dec(F.col("_x") * F.col("_y")).alias("_sxy"),
        dec(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_points").cast("double")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = cov / vx
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    r2 = (cov * cov) / (vx * vy)
    fit_ok = (F.col("n_points") >= 2) & (vx > 0)
    return m.select(
        "n_points",
        F.when(fit_ok, F.round(slope, 6)).alias("beta"),
        F.when(fit_ok, F.round(intercept, 6)).alias("intercept"),
        F.when(fit_ok & (vy > 0), F.round(r2, 6)).alias("r2"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram language-model quality score — the conditional complement
    of :func:`unigram_logprob_score`: each document's mean bigram
    log-probability under the corpus's own Laplace-smoothed bigram model
    ``P(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V)`` with ``ctx(w1)`` the
    bigram-context total and ``V`` the distinct-successor vocabulary.
    Shuffled/scrambled text keeps its unigram score but collapses here —
    the pair separates fluent text from bag-of-words spam. Corpus-level
    model — no per-document counterpart in the reference
    (/root/reference/src/okay/validator.py).

    Output, one row per document: ``(doc_id, n_bigrams, avg_logprob)``;
    documents with fewer than 2 tokens keep their row with
    ``n_bigrams 0`` and NULL score.

    Exactness: counts are exact bigints; the probability is spelled
    ``ln(CAST(bc+1) / CAST(ctx+V))`` with integer adds first and ONE
    IEEE division; the per-doc sum runs through decimal(38,12) casts
    (the unigram discipline) so the DuckDB twin is bit-identical.

    Scale shape: bigrams pair up row-locally (``zip_with`` over shifted
    slices — no window, no shuffle); the per-(doc, bigram) count frame
    is lazily localCheckpoint-ed (it feeds the model build AND the probe
    side — the corpus pairs once); the model frame is lazily
    localCheckpoint-ed too (it feeds the context totals, the successor
    vocabulary count, and the probe join); context totals and V are
    bounded re-aggregates of the model frame (never a posting list);
    the probe joins are equi-joins with one build row per (bigram) /
    (context) key — AQE skew-split covers stopword contexts."""
    toks = tokens(text_col)
    width = F.greatest(F.size(toks) - 1, F.lit(0))
    pair_struct = F.zip_with(
        F.slice(toks, 1, width),
        F.slice(toks, 2, width),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    base = df.select(F.col(id_col), F.explode_outer(pair_struct).alias("_p")).select(
        F.col(id_col), F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    db = (
        base.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bc = (
        db.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").cast("bigint").alias("bcc"))
        .localCheckpoint(eager=False)
    )
    ctx = bc.groupBy("w1").agg(F.sum("bcc").cast("bigint").alias("ctxc"))
    vs = bc.agg(F.count_distinct(F.col("w2")).cast("bigint").alias("_v"))
    probed = (
        db.join(bc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vs))
    )
    term = F.col("cnt").cast("double") * F.log(
        (F.col("bcc") + 1).cast("double") / (F.col("ctxc") + F.col("_v")).cast("double")
    )
    per_doc = probed.groupBy(id_col).agg(
        F.sum(F.when(F.col("w1").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_bigrams"),
        F.sum(
            F.when(F.col("w1").isNotNull(), term)
            .otherwise(F.lit(0.0))
            .cast("decimal(38,12)")
        )
        .cast("double")
        .alias("_slp"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("_slp") / F.col("n_bigrams").cast("double"), 6),
        ).alias("avg_logprob"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality rule bundle (Rae et al 2021, table A1)
    as one row-local expression set: word-count window, mean word length
    window, symbol-to-word ratio (``#`` / ``...``), fraction of words
    with an alphabetic character, and a minimum stop-word hit count —
    the standard pre-training keep/drop gate. Per-document and
    corpus-free (no aggregate state), so it composes with any upstream
    filter; the reference's per-document rules
    (/root/reference/src/okay/validator.py) have no text-quality
    analogue.

    Output, one row per document: the five measures ``(n_words,
    mean_word_len, symbol_ratio, alpha_ratio, stop_hits)``, their five
    boolean flags, and ``passes_gopher`` (AND of the flags). Empty
    documents report ``n_words 0``, NULL ratios, and fail.

    Exactness: every measure is exact integer counting followed by at
    most ONE int/int IEEE division (mean word length = non-space chars /
    words; ratios likewise), rounded to 6dp for display but FLAGGED on
    the raw values; thresholds compare against double literals the
    caller controls. The DuckDB twin replays the identical op sequence.

    Scale shape: zero shuffles, zero Python, whole-stage codegen over
    one projection — the rule-battery discipline applied to text
    quality."""
    # NULL text behaves like empty text (n_words 0, fails) on both engines
    toks = F.coalesce(tokens(text_col), F.array().cast("array<string>"))
    n_words = F.size(toks).cast("bigint")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    symbol_words = F.size(
        F.filter(toks, lambda w: w.contains("#") | w.contains("..."))
    ).cast("bigint")
    alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("bigint")
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    ).cast("bigint")
    mean_wl = F.when(
        n_words > 0, word_chars.cast("double") / n_words.cast("double")
    )
    sym_ratio = F.when(
        n_words > 0, symbol_words.cast("double") / n_words.cast("double")
    )
    alpha_ratio = F.when(
        n_words > 0, alpha_words.cast("double") / n_words.cast("double")
    )
    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_wl = (
        F.coalesce(mean_wl >= F.lit(float(min_mean_word_len)), F.lit(False))
        & F.coalesce(mean_wl <= F.lit(float(max_mean_word_len)), F.lit(False))
    )
    f_sym = F.coalesce(sym_ratio <= F.lit(float(max_symbol_ratio)), F.lit(False))
    f_alpha = F.coalesce(
        alpha_ratio >= F.lit(float(min_alpha_ratio)), F.lit(False)
    )
    f_stop = stop_hits >= min_stop_hits
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        f_words.alias("words_ok"),
        f_wl.alias("word_len_ok"),
        f_sym.alias("symbol_ok"),
        f_alpha.alias("alpha_ok"),
        f_stop.alias("stopword_ok"),
        (f_words & f_wl & f_sym & f_alpha & f_stop).alias("passes_gopher"),
    )


def benchmark_coverage(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
) -> DataFrame:
    """Domain-coverage score — the complement of
    :func:`ngram_contamination`: what fraction of the BENCHMARK's
    distinct word ``k``-gram shingles occur anywhere in the corpus.
    Contamination asks "did the eval leak into training"; coverage asks
    "does the training corpus speak the eval's language at all" — the
    number a curation pipeline reads when deciding whether a source is
    worth adding for a target domain. Corpus-level — no reference
    counterpart (/root/reference/src/okay/validator.py).

    Output, ONE row: ``(n_bench_grams, n_covered, coverage)`` with
    counts over the benchmark's DISTINCT shingle set and ``coverage``
    ONE int/int IEEE division — the DuckDB twin is bit-identical.
    Empty benchmark -> zero counts, NULL coverage.

    Scale shape: both sides reduce to DISTINCT shingle sets first (hash
    aggregates bounded by each side's shingle vocabulary — the corpus's
    row count never reaches the join); membership is a left-semi join
    on the shingle (uniformly distributed key; each build row is one
    distinct corpus shingle), then two scalar counts. No posting lists,
    no collect."""
    b_sh = (
        benchmark.select(F.explode(word_shingles(text_col, k)).alias("_sh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    c_sh = corpus.select(
        F.explode(word_shingles(text_col, k)).alias("_sh")
    ).distinct()
    covered = b_sh.join(c_sh, "_sh", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_covered")
    )
    total = b_sh.agg(F.count(F.lit(1)).cast("bigint").alias("n_bench_grams"))
    out = total.crossJoin(covered)
    return out.select(
        "n_bench_grams",
        "n_covered",
        F.when(
            F.col("n_bench_grams") > 0,
            F.round(
                F.col("n_covered").cast("double")
                / F.col("n_bench_grams").cast("double"),
                6,
            ),
        ).alias("coverage"),
    )


def ngram_diversity(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Distinct-n lexical diversity per group — the distinct-1/distinct-2
    ratios (unique n-grams over total n-grams) that quantify repetitive
    or template-generated slices of a corpus: a source whose dist-2
    collapses while volume grows is emitting boilerplate (the corpus-
    level complement of the per-document
    :func:`duplicated_ngram_ratio`). NULL text counts as an empty token
    list (the gopher_quality_flags convention); NULL groups are dropped.
    No reference counterpart (/root/reference/src/okay/validator.py).

    Output, one row per group: ``(grp, n_docs, total_1, distinct_1,
    dist_1, total_2, distinct_2, dist_2)`` — counts exact bigints, each
    ratio ONE int/int IEEE division (NULL when the total is zero), so
    the DuckDB twin is bit-identical.

    Scale shape: the (group, tokens) projection localCheckpoints ONCE
    (the corpus tokenizes once and feeds the totals pass plus both
    explodes); totals are row-local sums; the distinct counts are
    count_distinct over exploded grams — Spark's two-phase distinct
    aggregate, never a posting list; the final assembly joins three
    group-cardinality-bounded frames. Bigram fan-out is ~tokens-1 rows
    per doc — the same explode budget as the shingle operators."""
    toks = F.coalesce(tokens(text_col), F.array())
    base = (
        df.filter(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("grp"), toks.alias("_toks"))
        .localCheckpoint(eager=False)
    )
    width = F.greatest(F.size(F.col("_toks")) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, width),
        F.slice(F.col("_toks"), 2, width),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    totals = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum(F.size(F.col("_toks"))), F.lit(0))
        .cast("bigint")
        .alias("total_1"),
        F.coalesce(F.sum(width), F.lit(0)).cast("bigint").alias("total_2"),
    )
    d1 = (
        base.select("grp", F.explode(F.col("_toks")).alias("_g"))
        .groupBy(F.col("grp").alias("_g1"))
        .agg(F.count_distinct(F.col("_g")).cast("bigint").alias("distinct_1"))
    )
    d2 = (
        base.select("grp", F.explode(bigrams).alias("_g"))
        .groupBy(F.col("grp").alias("_g2"))
        .agg(F.count_distinct(F.col("_g")).cast("bigint").alias("distinct_2"))
    )
    out = (
        totals.join(d1, F.col("grp") == F.col("_g1"), "left")
        .join(d2, F.col("grp") == F.col("_g2"), "left")
        .select(
            "grp",
            "n_docs",
            "total_1",
            F.coalesce(F.col("distinct_1"), F.lit(0))
            .cast("bigint")
            .alias("distinct_1"),
            "total_2",
            F.coalesce(F.col("distinct_2"), F.lit(0))
            .cast("bigint")
            .alias("distinct_2"),
        )
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return out.select(
        "grp",
        "n_docs",
        "total_1",
        "distinct_1",
        F.round(
            F.when(F.col("total_1") > 0, d(F.col("distinct_1")) / d(F.col("total_1"))),
            6,
        ).alias("dist_1"),
        "total_2",
        "distinct_2",
        F.round(
            F.when(F.col("total_2") > 0, d(F.col("distinct_2")) / d(F.col("total_2"))),
            6,
        ).alias("dist_2"),
    )


def readability_stats(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Flesch reading-ease profile per group — mean words-per-sentence,
    vowel-group syllables-per-word, the mean Flesch score ``206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words)``, and the share of
    documents scoring below 30 ("very difficult") — the classic C4/
    Gopher-era readability quality signal, computed with a deterministic
    vowel-group syllable heuristic (``[aeiouy]+`` runs) so both engines
    agree exactly. Documents with zero words (NULL/whitespace text) are
    excluded — they have no readability. No reference counterpart
    (/root/reference/src/okay/validator.py).

    Output, one row per group: ``(grp, n_scored, mean_wps, mean_spw,
    mean_flesch, frac_difficult)``.

    Exactness: words/sentences/syllables are exact integer counts
    (sentence count floored at 1; syllables an integer fold over
    per-token regexp counts); each per-doc ratio and the Flesch formula
    are FIXED IEEE expressions; cross-doc means accumulate per-row
    decimal(38,12) casts (the moment discipline) with one double
    division; ``frac_difficult`` compares the RAW score (< 30.0) and is
    one int/int division. The DuckDB twin (regexp_extract_all lengths,
    seeded list_reduce folds) replays every op in order.

    Scale shape: entirely row-local projection + ONE hash aggregate on
    the group key — map-side combined, no window, no join, no Python,
    no collect."""
    toks = F.coalesce(tokens(text_col), F.array())
    w = F.size(toks)
    s = F.greatest(F.regexp_count(F.col(text_col), F.lit(r"[.!?]")), F.lit(1))
    syl = F.aggregate(
        F.transform(
            toks, lambda t: F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    d = lambda c: c.cast("double")  # noqa: E731
    wps = d(w) / d(s)
    spw = d(syl) / d(w)
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    base = df.filter(w > 0).select(
        F.col(group_col).alias("grp"),
        wps.alias("_wps"),
        spw.alias("_spw"),
        flesch.alias("_f"),
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(F.col("_wps").cast("decimal(38,12)")).cast("double").alias("_sw"),
        F.sum(F.col("_spw").cast("decimal(38,12)")).cast("double").alias("_ss"),
        F.sum(F.col("_f").cast("decimal(38,12)")).cast("double").alias("_sf"),
        F.sum(F.when(F.col("_f") < 30.0, 1).otherwise(0))
        .cast("bigint")
        .alias("_nd"),
    )
    n = d(F.col("n_scored"))
    return agg.select(
        "grp",
        "n_scored",
        F.round(F.col("_sw") / n, 6).alias("mean_wps"),
        F.round(F.col("_ss") / n, 6).alias("mean_spw"),
        F.round(F.col("_sf") / n, 6).alias("mean_flesch"),
        F.round(d(F.col("_nd")) / n, 6).alias("frac_difficult"),
    )
