"""Deterministic synthetic fixtures (FIXTURES.md F1-F3). No external data.

Everything derives from ``spark.range(n)`` + ``xxhash64(id, tag)`` — pure
column expressions, so generation itself is distributed, reproducible at any
scale (the same doc gets the same bytes at n=10^4 and n=10^12), and free of
wall-clock or unseeded RNG. Error injection uses fixed per-row hash-derived
probabilities, so expected violation counts are exactly computable.

F1 ``interleaved_documents`` is the north-rule input shape
(BASELINE.json ``input_hint``):

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

plus a ``part`` partition column (``pmod(xxhash64(doc_id), parts)``, with an
optional deliberately-skewed heavy partition for salting tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import optional, required

MAX_SPANS = 8
CATALOG_SIZE = 100_000


def _h(tag: str, *cols: Column) -> Column:
    """Deterministic 64-bit hash stream per (row, tag)."""
    return F.xxhash64(*cols, F.lit(tag))


def _p(tag: str, per_mille: int, *cols: Column) -> Column:
    """True for ~per_mille/1000 of rows, deterministically."""
    return F.pmod(_h(tag, *cols), F.lit(1000)) < per_mille


def interleaved_documents(
    spark: SparkSession,
    n_docs: int,
    *,
    parts: int = 32,
    skew: bool = False,
    catalog_size: int = CATALOG_SIZE,
    inject_errors: bool = True,
) -> DataFrame:
    """F1: the interleaved text+media document table with seeded violations.

    Injected defects (each ~0.5-1%): duplicate doc_id, malformed doc_id,
    empty spans, null kind, invalid kind, empty text on text spans, orphan
    media_ref (outside the catalog), negative offset. With
    ``inject_errors=False`` every row validates clean (used to measure the
    all-valid fast path).
    """
    df = spark.range(n_docs)
    rid = F.col("id")

    dup = _p("dup", 25, rid) & (rid > 0) if inject_errors else F.lit(False)
    bad_id = _p("badid", 5, rid) if inject_errors else F.lit(False)
    base_id = F.when(dup, rid - 1).otherwise(rid)
    doc_id = F.when(bad_id, F.format_string("DOC_%d", base_id)).otherwise(
        F.format_string("doc-%012d", base_id)
    )

    n_spans = F.when(
        _p("empty", 15, rid) & F.lit(inject_errors), F.lit(0)
    ).otherwise(F.lit(1) + F.pmod(_h("nspans", rid), F.lit(MAX_SPANS - 1)))

    def span(j: Column) -> Column:
        hj = _h("span", rid, j)
        is_media = F.pmod(hj, F.lit(3)) == 0  # ~1/3 media, 2/3 text
        kind = F.when(is_media, F.lit("media")).otherwise(F.lit("text"))
        if inject_errors:
            kind = (
                F.when(_p("nullkind", 5, rid, j), F.lit(None).cast("string"))
                .when(_p("badkind", 5, rid, j), F.lit("blob"))
                .otherwise(kind)
            )
        words = F.lit(1) + F.pmod(_h("words", rid, j), F.lit(12))
        text_body = F.concat(
            F.lit("tok"),
            F.repeat(
                F.concat(F.lit(" w"), F.pmod(_h("w", rid, j), F.lit(997)).cast("string")),
                words,
            ),
        )
        if inject_errors:
            text_body = F.when(_p("emptytext", 10, rid, j), F.lit("")).otherwise(text_body)
        text = F.when(is_media, F.lit(None).cast("string")).otherwise(text_body)

        ref_id = F.pmod(_h("ref", rid, j), F.lit(catalog_size))
        if inject_errors:
            ref_id = F.when(
                _p("orphan", 10, rid, j), F.lit(catalog_size) + F.pmod(_h("o", rid, j), F.lit(1000))
            ).otherwise(ref_id)
        media_ref = F.when(is_media, F.format_string("media-%08d", ref_id)).otherwise(
            F.lit(None).cast("string")
        )

        offset = (j * F.lit(16) + F.pmod(hj, F.lit(16))).cast("int")
        if inject_errors:
            offset = F.when(_p("disorder", 10, rid, j), F.lit(-1)).otherwise(offset).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    all_spans = F.transform(F.sequence(F.lit(0), F.lit(MAX_SPANS - 1)), span)
    spans = F.slice(all_spans, 1, n_spans)

    part = F.pmod(F.xxhash64(doc_id), F.lit(parts)).cast("int")
    if skew:
        # ~25% of rows collapse into partition 0: the heavy-hitter partition
        # used to exercise salting (north rule: skewed partitions salted
        # before shuffle-heavy stages).
        part = F.when(_p("skew", 250, rid), F.lit(0)).otherwise(part)

    return df.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        part.alias("part"),
    )


def media_catalog(spark: SparkSession, size: int = CATALOG_SIZE) -> DataFrame:
    """F2: referential-integrity target; unique media_ref per row."""
    rid = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_h("mkind", rid), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(size).select(
        F.format_string("media-%08d", rid).alias("media_ref"),
        kind.alias("media_kind"),
        (F.lit(1) + F.pmod(_h("mbytes", rid), F.lit(10_000_000))).alias("bytes"),
    )


def oracle_interleaved_documents(documents: DataFrame) -> DataFrame:
    """F1's shape derived from the driver's ``documents`` parquet table with
    **md5-only** column expressions, so a SQL engine with ``md5`` (the DuckDB
    oracle) can reconstruct the exact same table bit-for-bit and validate it
    independently — the cross-engine twin of :func:`interleaved_documents`
    (whose ``xxhash64`` streams are Spark-only).

    Output columns match the north-rule ``input_hint``:
    ``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>, part``.
    Injected defects (~2% per site): malformed doc_id, empty spans, null
    kind, invalid kind, empty text on a text span, regex-invalid media_ref,
    negative offset. Span text is a deterministic substring of the source
    document's text, so content (not just structure) round-trips.

    Columns are bound to ``base`` (expression-ID resolution): the output
    aliases ``sid`` AS ``doc_id``, and an unresolved ``F.col("doc_id")``
    inside the spans expression would be captured by that lateral column
    alias — hashing the formatted string instead of the source long."""
    base = documents.filter(F.col("doc_id").isNotNull())
    raw_id = base["doc_id"]
    raw_text = base["text"]
    did = raw_id.cast("string")

    def hd(tag: str) -> Column:
        # per-doc 32-bit hash stream: ('0x'||substr(md5(...),1,8))::BIGINT in DuckDB
        return F.conv(F.substring(F.md5(F.concat(did, F.lit("|" + tag))), 1, 8), 16, 10).cast(
            "bigint"
        )

    def hs(tag: str, j: Column) -> Column:
        return F.conv(
            F.substring(F.md5(F.concat(did, F.lit("|" + tag + "|"), j.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")

    sid = F.when(hd("badid") % 97 == 0, F.format_string("DOC_%d", raw_id)).otherwise(
        F.format_string("doc-%012d", raw_id)
    )
    n_spans = F.when(hd("empty") % 67 == 0, F.lit(0)).otherwise((hd("ns") % 4 + 1).cast("int"))

    def span(j: Column) -> Column:
        is_media = hs("k", j) % 3 == 0
        kind = (
            F.when(hs("nullk", j) % 53 == 0, F.lit(None).cast("string"))
            .when(hs("badk", j) % 53 == 0, F.lit("blob"))
            .when(is_media, F.lit("media"))
            .otherwise(F.lit("text"))
        )
        body = F.when(hs("et", j) % 53 == 0, F.lit("")).otherwise(
            raw_text.substr(F.lit(1), (hs("len", j) % 30 + 1).cast("int"))
        )
        text = F.when(is_media, F.lit(None).cast("string")).otherwise(body)
        media_ref = F.when(~is_media, F.lit(None).cast("string")).otherwise(
            F.when(hs("badm", j) % 53 == 0, F.lit("MEDIA_X")).otherwise(
                F.format_string("media-%08d", hs("m", j) % CATALOG_SIZE)
            )
        )
        offset = (
            F.when(hs("nego", j) % 53 == 0, F.lit(-1)).otherwise(j * 16 + hs("off", j) % 16)
        ).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    all_spans = F.transform(F.sequence(F.lit(0), F.lit(3)), span)
    spans = F.slice(all_spans, 1, n_spans)
    part = (raw_id % 32).cast("int")

    return base.select(sid.alias("doc_id"), spans.alias("spans"), part.alias("part"))


def document_schema() -> None:
    """The F1 okay schema (FIXTURES.md): dotted paths, [] elements, options,
    regex, min, nullability — the full rule battery over the north-rule shape."""
    required("doc_id", type="string", regex=r"doc-\d{12}")
    required("spans", type="list", min=1)
    required("spans[]", type="object")
    required("spans[].kind", type="string", options=["text", "media"])
    optional("spans[].text", type="string?", min=1)
    optional("spans[].media_ref", type="string?", regex=r"media-\d{8}")
    required("spans[].offset", type="int", min=0)
    optional("part", type="int?")


# ---------------------------------------------------------------------------
# F3: the reference's own benchmark corpus, lifted to a table
# (shape + 50/50 valid-invalid mix from
# /root/reference/docs/development-log.md:1032-1081)
# ---------------------------------------------------------------------------


def accommodations(spark: SparkSession, n_docs: int) -> DataFrame:
    """Nested-struct corpus: even ids valid, odd ids invalid (same defects as
    the reference's perf script where expressible over static columns:
    negative accommodation_id, bad checkin regex, bad latitude, bad rating
    aspect, score > out_of, missing out_of)."""
    df = spark.range(n_docs)
    bad = F.pmod(F.col("id"), F.lit(2)) == 1

    def s(value: str, bad_value: str | None = None) -> Column:
        col = F.lit(value)
        return F.when(bad, F.lit(bad_value)).otherwise(col) if bad_value is not None else col

    metadata = F.struct(
        F.when(bad, F.lit(-1)).otherwise(F.lit(1) + F.pmod(F.col("id"), F.lit(1000))).alias(
            "accommodation_id"
        ),
        F.concat(F.lit("id"), F.col("id").cast("string")).alias("external_id"),
        F.lit("getaway").alias("partner"),
        F.when(bad, F.lit(None).cast("string")).otherwise(F.lit("direct")).alias("source_type"),
    )
    checkin = F.struct(
        s("15:00").alias("from"), s("23:00", "midnight").alias("until")
    )
    checkout = F.struct(s("00:00").alias("from"), s("12:00").alias("until"))
    geo = F.struct(
        s("35.14").alias("longitude"), s("-90.038", "-90").alias("latitude")
    )

    def rating(aspect: str, score: float, bad_aspect: str | None, bad_score: float | None, null_out_of: bool) -> Column:
        a = s(aspect, bad_aspect) if bad_aspect else F.lit(aspect)
        sc = F.when(bad, F.lit(bad_score)).otherwise(F.lit(score)) if bad_score else F.lit(score)
        oo = (
            F.when(bad, F.lit(None).cast("double")).otherwise(F.lit(5.0))
            if null_out_of
            else F.lit(5.0)
        )
        return F.struct(a.alias("aspect"), sc.cast("double").alias("score"), oo.alias("out_of"))

    ratings = F.array(
        rating("general", 2.5, None, None, True),
        rating("cleanliness", 1.8, "loneliness", None, False),
        rating("staff", 3.9, None, 6.9, False),
    )

    accommodation = F.struct(
        F.lit("Heartbreak Hotel").alias("name"),
        F.lit("Lonely Street").alias("address"),
        F.lit("Memphis").alias("city"),
        F.lit("United States").alias("country"),
        F.lit("37501").alias("postal_code"),
        F.lit("+1 901-555-7300").alias("phone"),
        checkin.alias("checkin"),
        checkout.alias("checkout"),
        geo.alias("geo"),
        ratings.alias("ratings"),
    )
    return df.select(metadata.alias("metadata"), accommodation.alias("accommodation"))


def accommodation_schema() -> None:
    """The reference's 25-rule benchmark schema
    (/root/reference/docs/development-log.md:1049-1073), custom validator
    included — the second rule-battery benchmark workload."""
    from .messages import Message

    def score(field, value):
        if (
            not isinstance(value, dict)
            or "score" not in value
            or "out_of" not in value
            or not isinstance(value.get("score"), (int, float))
            or not isinstance(value.get("out_of"), (int, float))
        ):
            return None
        if value["score"] > value["out_of"]:
            return Message(type="score_too_high", field=field, expected={"out_of": value["out_of"]})
        return None

    required("metadata", type="object")
    required("metadata.accommodation_id", type="int", min=1)
    required("metadata.external_id", type="string")
    required("metadata.partner", type="string")
    required("metadata.source_type", type="string")
    required("accommodation", type="object")
    required("accommodation.name", type="string")
    required("accommodation.address", type="string")
    required("accommodation.city", type="string")
    required("accommodation.country", type="string")
    optional("accommodation.postal_code", type="string")
    optional("accommodation.phone", type="string", regex=r"[\+\- 0-9]+")
    optional("accommodation.checkin", type="object")
    required("accommodation.checkin.from", type="string", regex=r"[0-2]\d:[0-2]\d")
    required("accommodation.checkin.until", type="string", regex=r"[0-2]\d:[0-2]\d")
    optional("accommodation.checkout", type="object")
    required("accommodation.checkout.from", type="string", regex=r"[0-2]\d:[0-2]\d")
    required("accommodation.checkout.until", type="string", regex=r"[0-2]\d:[0-2]\d")
    optional("accommodation.geo", type="object")
    required("accommodation.geo.longitude", type="string", regex=r"\-?\d+\.\d+")
    required("accommodation.geo.latitude", type="string", regex=r"\-?\d+\.\d+")
    required(
        "accommodation.ratings[].aspect",
        type="string",
        options=["general", "cleanliness", "staff"],
    )
    required("accommodation.ratings[].score", type="number", min=0)
    required("accommodation.ratings[].out_of", type="number", min=0)
    optional("accommodation.ratings[]", type="custom", validator=score)


def accommodation_schema_native() -> None:
    """accommodation_schema without the custom rule — the pure-JVM battery
    (used to benchmark the zero-Python path separately)."""
    required("metadata", type="object")
    required("metadata.accommodation_id", type="int", min=1)
    required("metadata.external_id", type="string")
    required("metadata.partner", type="string")
    required("metadata.source_type", type="string")
    required("accommodation", type="object")
    required("accommodation.name", type="string")
    required("accommodation.address", type="string")
    required("accommodation.city", type="string")
    required("accommodation.country", type="string")
    optional("accommodation.postal_code", type="string")
    optional("accommodation.phone", type="string", regex=r"[\+\- 0-9]+")
    optional("accommodation.checkin", type="object")
    required("accommodation.checkin.from", type="string", regex=r"[0-2]\d:[0-2]\d")
    required("accommodation.checkin.until", type="string", regex=r"[0-2]\d:[0-2]\d")
    optional("accommodation.checkout", type="object")
    required("accommodation.checkout.from", type="string", regex=r"[0-2]\d:[0-2]\d")
    required("accommodation.checkout.until", type="string", regex=r"[0-2]\d:[0-2]\d")
    optional("accommodation.geo", type="object")
    required("accommodation.geo.longitude", type="string", regex=r"\-?\d+\.\d+")
    required("accommodation.geo.latitude", type="string", regex=r"\-?\d+\.\d+")
    required(
        "accommodation.ratings[].aspect",
        type="string",
        options=["general", "cleanliness", "staff"],
    )
    required("accommodation.ratings[].score", type="number", min=0)
    required("accommodation.ratings[].out_of", type="number", min=0)
