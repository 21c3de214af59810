"""Property tests: the round-2 distributed operators against tiny pure-Python
reference implementations on randomized inputs (fixed seeds — deterministic).

The DuckDB oracles prove one fixed dataset; these prove the algebra holds
across many shapes: duplicate-heavy samples, disconnected forests, skewed
label distributions.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row


def _py_ks(cur: list[float], ref: list[float]) -> float:
    xs = sorted(set(cur) | set(ref))
    n1, n2 = len(cur), len(ref)
    from bisect import bisect_right

    sc, sr = sorted(cur), sorted(ref)
    best = 0.0
    for x in xs:
        gap = abs(bisect_right(sc, x) / n1 - bisect_right(sr, x) / n2)
        best = max(best, gap)
    return best


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ks_exact_matches_python_reference(spark, seed):
    from okay_spark.checks import ks_exact

    rng = random.Random(seed)
    # duplicate-heavy: values drawn from a small grid so ties are common
    cur = [round(rng.gauss(0, 1), 1) for _ in range(150 + seed * 37)]
    ref = [round(rng.gauss(0.3, 1.2), 1) for _ in range(120 + seed * 11)]
    out = ks_exact(
        spark.createDataFrame([Row(v=x) for x in cur]),
        spark.createDataFrame([Row(v=x) for x in ref]),
        "v",
        partitions=5,
    ).collect()[0]
    assert out["ks_stat"] == pytest.approx(_py_ks(cur, ref), abs=1e-6)
    assert out["n_current"] == len(cur) and out["n_reference"] == len(ref)


def _py_components(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonicalization
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("seed", [11, 12])
def test_connected_components_matches_union_find(spark, seed):
    from okay_spark.dedup import connected_components

    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = set(range(n))
    expected = _py_components(edges, nodes)
    nodes_df = spark.createDataFrame([Row(doc_id=i) for i in sorted(nodes)])
    edges_df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges_df, nodes=nodes_df).collect()
    }
    assert got == expected


def _py_strip_spans(docs: dict[int, str], n: int, min_df: int = 2) -> dict[int, tuple]:
    toks = {d: [t for t in text.split(" ") if t] for d, text in docs.items()}
    gram_docs: dict[tuple, set[int]] = {}
    for d, w in toks.items():
        for i in range(len(w) - n + 1):
            gram_docs.setdefault(tuple(w[i : i + n]), set()).add(d)
    out = {}
    for d, w in toks.items():
        covered = set()
        for i in range(len(w) - n + 1):
            if len(gram_docs[tuple(w[i : i + n])]) >= min_df:
                covered.update(range(i, i + n))
        kept = [t for i, t in enumerate(w) if i not in covered]
        out[d] = (len(w), len(kept), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [5, 11])
def test_strip_duplicate_spans_matches_python_reference(spark, seed):
    """Randomized corpora with planted shared spans, tiny vocab (so chance
    collisions happen too): the distributed plan equals the brute-force
    per-position reference exactly."""
    from okay_spark.dedup import strip_duplicate_spans

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    boiler = [f"b{i}" for i in range(6)]
    docs = {}
    for d in range(40):
        w = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        if rng.random() < 0.5:  # plant the shared span at a random position
            pos = rng.randrange(0, len(w) + 1)
            w = w[:pos] + boiler + w[pos:]
        docs[d] = " ".join(w)
    n = 5
    expected = _py_strip_spans(docs, n)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_dedup"])
        for r in strip_duplicate_spans(
            spark.createDataFrame(list(docs.items()), "doc_id int, text string"),
            n=n,
        ).collect()
    }
    assert got == expected


def _py_span_order(rows, strict=True):
    """Reference: first adjacent non-increasing offset per doc, nulls skipped
    (null comparisons are three-valued in the engine: never a violation)."""
    out = set()
    for doc_id, spans in rows:
        for i in range(1, len(spans)):
            a, b = spans[i - 1], spans[i]
            if a is None or b is None or a.get("offset") is None or b.get("offset") is None:
                continue
            if (b["offset"] <= a["offset"]) if strict else (b["offset"] < a["offset"]):
                out.add((doc_id, f"spans[{i}].offset"))
                break
    return out


@pytest.mark.parametrize("seed,strict", [(1, True), (2, True), (3, False)])
def test_span_order_matches_python_reference(spark, seed, strict):
    from okay_spark.checks import span_order_violations

    rng = random.Random(seed)
    rows = []
    for d in range(120):
        n = rng.randrange(0, 6)
        spans = []
        for _ in range(n):
            off = None if rng.random() < 0.1 else rng.randrange(-2, 8)
            spans.append({"offset": off} if rng.random() > 0.05 else None)
        rows.append((d, spans))
    df = spark.createDataFrame(rows, "doc_id int, spans array<struct<offset:int>>")
    got = {
        (r["doc_id"], r["path"])
        for r in span_order_violations(
            df, "spans", "offset", id_cols=["doc_id"], strict=strict
        ).collect()
    }
    assert got == _py_span_order(rows, strict=strict)


def _py_element_rule(rows):
    out = []
    for doc_id, spans in rows:
        for i, s in enumerate(spans or []):
            if s is None or s.get("kind") != "text":
                continue
            t = s.get("text")
            if t is None or len(t) == 0:
                out.append((doc_id, f"spans[{i}].text"))
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2])
def test_element_rule_matches_python_reference(spark, seed):
    from okay_spark.checks import element_rule
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    rows = []
    for d in range(150):
        spans = []
        for _ in range(rng.randrange(0, 5)):
            kind = rng.choice(["text", "media", None])
            text = rng.choice(["hello", "", None])
            spans.append({"kind": kind, "text": text} if rng.random() > 0.05 else None)
        rows.append((d, spans))
    df = spark.createDataFrame(rows, "doc_id int, spans array<struct<kind:string,text:string>>")
    out = element_rule(
        df,
        "spans",
        when=lambda s: s["kind"] == F.lit("text"),
        expect=lambda s: F.length(s["text"]) > 0,
        field="text",
        id_cols=["doc_id"],
    )
    got = sorted((r["doc_id"], r["path"]) for r in out.collect())
    assert got == _py_element_rule(rows)
