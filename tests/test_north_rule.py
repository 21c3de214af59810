"""North-rule invariants on the exact input shape (BASELINE.json input_hint):

    (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)

1. Per-row span-sequence equality — (kind, text, media_ref, order) of every
   document's spans as seen by the engine's explode pipeline equals the
   reference validator's own index walk (``okay.index.create_index``) on the
   same rows.
2. Full-battery message equality — the engine's violation rows over the
   interleaved fixture equal ``okay.validate`` run per-row on
   ``Row.asDict(recursive=True)``, as a multiset of (doc_id, path, rule)
   (the fixture injects duplicate doc_ids; multisets keep them honest).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from okay_spark.engine import validate_dataframe
from okay_spark.fixtures import document_schema, interleaved_documents

N_DOCS = 400


def _ref_document_schema():
    """document_schema declared through the REFERENCE's DSL."""
    from okay.schema import optional, required  # type: ignore

    required("doc_id", type="string", regex=r"doc-\d{12}")
    required("spans", type="list", min=1)
    required("spans[]", type="object")
    required("spans[].kind", type="string", options=["text", "media"])
    optional("spans[].text", type="string?", min=1)
    optional("spans[].media_ref", type="string?", regex=r"media-\d{8}")
    required("spans[].offset", type="int", min=0)
    optional("part", type="int?")


def test_span_sequence_equality_vs_reference_index(spark, okay_reference):
    from okay.index import create_index  # type: ignore

    docs = interleaved_documents(spark, N_DOCS, parts=4)
    rows = docs.collect()

    # engine view of the span sequence: posexplode preserves order and index
    eng = (
        docs.select("doc_id", F.posexplode_outer("spans").alias("i", "s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", "i", "s.kind", "s.text", "s.media_ref", "s.offset")
        .collect()
    )
    eng_seq = Counter(
        (r["doc_id"], r["i"], r["kind"], r["text"], r["media_ref"], r["offset"]) for r in eng
    )

    fields = ["doc_id", "spans", "spans[]", "part"]
    ref_seq: Counter = Counter()
    for row in rows:
        d = row.asDict(recursive=True)
        idx = create_index(d, fields)
        for i, entry in enumerate(idx.fields.get("spans[]", [])):
            s = entry.value
            assert entry.path == f"spans[{i}]"
            ref_seq[
                (d["doc_id"], i, s["kind"], s["text"], s["media_ref"], s["offset"])
            ] += 1

    assert eng_seq, "fixture produced no spans — regression"
    assert eng_seq == ref_seq


def test_full_battery_equals_reference_per_row(spark, okay_reference):
    docs = interleaved_documents(spark, N_DOCS, parts=4)
    rows = docs.collect()

    eng = validate_dataframe(docs, document_schema, id_cols=["doc_id"]).collect()
    eng_c = Counter((r["doc_id"], r["path"], r["rule"]) for r in eng)

    ref_c: Counter = Counter()
    for row in rows:
        d = row.asDict(recursive=True)
        for m in okay_reference.validate(_ref_document_schema, d):
            ref_c[(d["doc_id"], m.field, m.type)] += 1

    assert ref_c, "fixture injected no violations — regression"
    only_eng = eng_c - ref_c
    only_ref = ref_c - eng_c
    assert not only_eng and not only_ref, (
        f"engine-only={dict(list(only_eng.items())[:5])} "
        f"reference-only={dict(list(only_ref.items())[:5])}"
    )
