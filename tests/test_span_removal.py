"""dup_span_removal (Lee et al. 2022 duplicate-substring removal):
operator pinned against a pure-Python sequential reference of the same
policy (keep the corpus-min (doc_id, start) occurrence, cut every other
one, merge overlapping/touching cuts), including the string-doc-id case
the r7-era packed numeric keeper key silently broke (ADVICE r7: string
ids made `id * 1e6 + start` null, so nothing was ever removed)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    dup_span_removal,
)


def _ref(docs: dict, n: int) -> dict:
    """Sequential reference: id -> (n_tok, n_spans, n_removed, kept)."""
    toks = {i: t.lower().strip().split() for i, t in docs.items()}
    by_gram = defaultdict(list)
    for i, tk in toks.items():
        for s in range(0, len(tk) - n + 1):
            by_gram[" ".join(tk[s : s + n])].append((i, s))
    flagged = defaultdict(list)
    for occs in by_gram.values():
        if len(occs) >= 2:
            keep = min(occs)
            for o in occs:
                if o != keep:
                    flagged[o[0]].append((o[1], o[1] + n))
    out = {}
    for i, tk in toks.items():
        spans: list[list[int]] = []
        for s, e in sorted(flagged.get(i, [])):
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        removed = {j for s, e in spans for j in range(s, e)}
        kept = [t for j, t in enumerate(tk) if j not in removed]
        out[i] = (len(tk), len(spans), sum(e - s for s, e in spans), kept)
    return out


def _check(spark, docs: dict, n: int, id_type: str = "long") -> dict:
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()],
        f"doc_id {id_type}, text string",
    )
    got = {
        r["id"]: r
        for r in dup_span_removal(df, n=n).collect()
    }
    exp = _ref(docs, n)
    assert set(got) == set(exp)
    for i, (n_tok, n_spans, n_removed, kept) in exp.items():
        r = got[i]
        assert (r["n_tok"], r["n_spans"], r["n_removed"]) == (
            n_tok,
            n_spans,
            n_removed,
        ), f"doc {i}: {dict(r.asDict())} != {(n_tok, n_spans, n_removed)}"
        want_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r["clean_md5"] == want_md5, f"doc {i}: cleaned text differs"
        assert abs(r["removed_frac"] - n_removed / max(n_tok, 1)) < 1e-5
    return exp


def test_keeps_first_occurrence_and_cuts_the_rest(spark):
    docs = {
        1: "a b c d e x y z",  # canonical (min doc_id): untouched
        2: "p q a b c d e r s",  # one flagged 5-gram span
        3: "a b c d e a b c d e",  # two flagged overlapping regions
    }
    exp = _check(spark, docs, n=5)
    assert exp[1][1] == 0  # canonical doc keeps its copy
    assert exp[2][1] == 1 and exp[2][2] == 5
    assert exp[3][2] == 10  # both occurrences cut (doc 1 holds the min)


def test_overlapping_cuts_merge_into_one_maximal_span(spark):
    # a 6-token duplicated run yields two overlapping flagged 5-grams
    # in doc 2 -> must merge into ONE span of length 6, not two of 5
    docs = {
        1: "t u v w x y end",
        2: "m n t u v w x y o",
    }
    exp = _check(spark, docs, n=5)
    assert exp[2][1] == 1 and exp[2][2] == 6


def test_string_doc_ids_still_remove(spark):
    # regression (ADVICE r7): the numeric packed keeper key nulled out
    # on string ids and silently removed NOTHING
    docs = {
        "doc-b": "a b c d e x",
        "doc-a": "y a b c d e",  # "doc-a" < "doc-b": canonical here
    }
    exp = _check(spark, docs, n=5, id_type="string")
    assert exp["doc-a"][1] == 0 and exp["doc-b"][1] == 1
    assert exp["doc-b"][2] == 5  # removal actually happened


def test_docs_shorter_than_n_pass_through_fingerprinted(spark):
    docs = {1: "tiny doc", 2: "tiny doc"}
    exp = _check(spark, docs, n=5)
    assert all(v[1] == 0 for v in exp.values())
