"""Property-based tests: operator semantics pinned against independent
reference implementations (pandas merge_asof, python sets) on randomized
inputs. Complements the fixed-fixture oracle corpus."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from fred_economic_data_pipeline_local_spark.functions.scalars import lenient_key
from fred_economic_data_pipeline_local_spark.operators.serve import (
    dedup_append_delta,
    upsert_merge,
)
from fred_economic_data_pipeline_local_spark.operators.temporal import asof_join

import pyspark.sql.functions as F

_SETTINGS = dict(
    max_examples=12,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_TS0 = dt.datetime(2024, 1, 1)

times = st.integers(min_value=0, max_value=10_000)
keys = st.integers(min_value=0, max_value=3)


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, times, st.floats(0, 100, allow_nan=False)), max_size=25),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        {
            "user_id": [k for k, _ in left],
            "ts": [_TS0 + dt.timedelta(seconds=s) for _, s in left],
        }
    ).sort_values("ts", kind="stable")
    rpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _, _ in right], dtype="int64"),
            "ts": pd.to_datetime([_TS0 + dt.timedelta(seconds=s) for _, s, _ in right]),
            "value": pd.array([v for _, _, v in right], dtype="float64"),
        }
    ).sort_values("ts", kind="stable")
    # pandas merge_asof demands unique (key, ts) on the right for exact
    # equivalence; drop duplicates the same way on both sides
    rpdf = rpdf.drop_duplicates(["user_id", "ts"], keep="last")

    expected = pd.merge_asof(
        lpdf, rpdf, on="ts", by="user_id", direction="backward"
    )

    ldf = spark.createDataFrame(lpdf, "user_id long, ts timestamp")
    rdf = spark.createDataFrame(rpdf, "user_id long, ts timestamp, value double")
    got = asof_join(ldf, rdf, on="ts", by=["user_id"], value_cols=["value"]).toPandas()

    exp = sorted(
        (int(r.user_id), r.ts, None if pd.isna(r.value) else round(float(r.value), 9))
        for r in expected.itertuples()
    )
    act = sorted(
        (int(r.user_id), r.ts, None if pd.isna(r.value_right) else round(float(r.value_right), 9))
        for r in got.itertuples()
    )
    assert act == exp


num_or_str = st.one_of(
    st.integers(min_value=-5, max_value=5).map(str),
    st.integers(min_value=-5, max_value=5),
    st.sampled_from(["1.0", "2.50", " 3 ", "x", "X ", ".", ""]),
)


@given(vals=st.lists(num_or_str, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_lenient_key_canonicalizes_numeric_forms(spark, vals):
    """"2", 2, 2.0, " 2 " all collapse to one canonical key; non-numerics
    collapse case/space-insensitively."""
    df = spark.createDataFrame([(str(v),) for v in vals], "raw string")
    out = df.select(lenient_key(F.col("raw")).alias("k")).collect()

    def expected_key(v):
        s = str(v).strip()
        try:
            f = float(s)
            if f == int(f):
                return str(int(f))
            return str(f)
        except ValueError:
            return s.lower()

    assert [r.k for r in out] == [expected_key(v) for v in vals]


rows = st.lists(
    st.tuples(keys, st.integers(0, 2), st.floats(0, 9, allow_nan=False)),
    min_size=0,
    max_size=12,
)


@given(target=rows, source=rows)
@settings(**_SETTINGS)
def test_upsert_merge_set_semantics(spark, target, source):
    """Result keys = union of key sets; value = source's when present
    (max-struct dedup within source), else target's."""
    schema = "k1 int, k2 int, v double"
    t = spark.createDataFrame(target, schema).dropDuplicates(["k1", "k2"])
    s = spark.createDataFrame(source, schema)
    out = {(r.k1, r.k2): r.v for r in upsert_merge(t, s, keys=["k1", "k2"]).collect()}

    t_map = {(k1, k2): v for k1, k2, v in target}
    # emulate the operator's deterministic source dedup: max non-key struct
    s_map: dict = {}
    for k1, k2, v in source:
        key = (k1, k2)
        s_map[key] = max(v, s_map[key]) if key in s_map else v
    t_dedup = {}
    for r in t.collect():
        t_dedup[(r.k1, r.k2)] = r.v
    expected = {**t_dedup, **s_map}
    assert set(out) == set(expected)
    for k in expected:
        assert out[k] == pytest.approx(expected[k]), k


@given(
    incoming=st.lists(st.tuples(keys, keys), min_size=0, max_size=10),
    existing=st.lists(st.tuples(keys, keys), min_size=0, max_size=10),
)
@settings(**_SETTINGS)
def test_dedup_append_is_set_difference(spark, incoming, existing):
    inc = spark.createDataFrame(incoming + [(99, 99)], "a int, b int")
    ex = spark.createDataFrame(existing + [(98, 98)], "a int, b int")
    out = sorted(
        (r.a, r.b) for r in dedup_append_delta(inc, ex, keys=["a", "b"]).collect()
    )
    expected = sorted(set(incoming + [(99, 99)]) - set(existing + [(98, 98)]))
    # dedup_append keeps incoming duplicates (it's an anti-join, not distinct)
    expected_multi = sorted(
        t for t in incoming + [(99, 99)] if t not in set(existing + [(98, 98)])
    )
    assert out == expected_multi
    assert set(out) == set(expected)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_components_match_union_find(spark, edges):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        neardup_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    # reference: textbook union-find over the same edges
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges or [], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in neardup_components(df).collect()}
    assert got == expected


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),  # tiny vocab -> shingle collisions
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_hashed_shingles_match_string_shingles(spark, texts, k):
    """The codegen'd hashed shingle pipeline must produce per-doc sets of
    the same cardinality as the reference word_shingles transform, and
    equal docs must get equal sets (the properties Jaccard depends on)."""
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        shingle_df,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hashed = {
        r["id"]: frozenset(r["sh"])
        for r in shingle_df(df, shingle_k=k).collect()
    }
    strings = {
        r["doc_id"]: frozenset(r["sh"])
        for r in df.select(
            "doc_id", word_shingles(F.col("text"), k).alias("sh")
        ).collect()
    }
    assert set(hashed) == set(strings)
    for i in hashed:
        assert len(hashed[i]) == len(strings[i]), (i, texts[i])
    # equal string sets <-> equal hash sets
    for i in hashed:
        for j in hashed:
            assert (hashed[i] == hashed[j]) == (strings[i] == strings[j])


texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=0,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=20,
)


@given(docs=texts, budget=st.integers(min_value=1, max_value=16))
@settings(**_SETTINGS)
def test_pack_sequences_matches_sequential_reference(spark, docs, budget):
    """Distributed packing == a sequential cumulative-sum walk per shard."""
    from fred_economic_data_pipeline_local_spark.operators.curation import (
        pack_sequences,
    )

    rows = [(i, t, f"shard{i % 3}") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.n_tokens, r.bin_id)
        for r in pack_sequences(df, budget, "source").collect()
    }

    # sequential reference: walk each shard in id order
    import re as _re

    expected = {}
    by_shard: dict[str, int] = {}
    for i, t, shard in sorted(rows, key=lambda x: x[0]):
        n = len(_re.split(r"\s+", t.strip()))  # split('\s+') semantics
        cum = by_shard.get(shard, 0)
        expected[i] = (n, cum // budget)
        by_shard[shard] = cum + n
    assert got == expected


@given(
    corpus=st.lists(st.sampled_from(
        ["a b c", "c d e", "x y z", "p q", "a b", "m n o p"]
    ), min_size=1, max_size=12),
    bench=st.lists(st.sampled_from(["a b c", "x y z", "k l"]), max_size=3),
)
@settings(**_SETTINGS)
def test_decontam_matches_python_set_overlap(spark, corpus, bench):
    """contamination_hits == python 2-gram set intersection counts."""
    from fred_economic_data_pipeline_local_spark.operators.decontam import (
        contamination_hits,
    )

    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )

    def grams(t):
        toks = t.strip().lower().split()
        if len(toks) < 2:
            return {t.strip().lower()}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    bench_set = set().union(*(grams(t) for t in bench)) if bench else set()
    expected = {}
    for i, t in enumerate(corpus):
        hits = len(grams(t) & bench_set)
        if hits:
            expected[i] = hits
    got = {
        r.id: r.n_hits for r in contamination_hits(cdf, bdf).collect()
    }
    assert got == expected


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    ids=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31), min_size=1, max_size=40, unique=True
    )
)
def test_assign_split_matches_pure_python_md5(spark, ids):
    """The split assignment is documented as a pure function of the key
    that ANY engine reproduces — prove it against hashlib directly, not
    just against DuckDB (which shares no code with either)."""
    import hashlib

    from fred_economic_data_pipeline_local_spark.operators.curation import (
        assign_split,
    )

    def expected(doc_id: int) -> str:
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return "train" if bucket < 90 else ("val" if bucket < 95 else "test")

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.split for r in assign_split(df).collect()}
    assert got == {i: expected(i) for i in ids}


_pf_val = st.one_of(st.none(), st.integers(-1_000_000, 1_000_000))
_pf_str = st.one_of(st.none(), st.text(alphabet="abcXYZ 0-9", max_size=6))


@given(
    nums=st.lists(_pf_val, min_size=1, max_size=30),
    strs=st.lists(_pf_str, min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_profile_columns_matches_python_reference(spark, nums, strs):
    from fred_economic_data_pipeline_local_spark.operators.profile import (
        profile_columns,
    )

    n = max(len(nums), len(strs))
    nums = nums + [None] * (n - len(nums))
    strs = strs + [None] * (n - len(strs))
    df = spark.createDataFrame(
        list(zip(nums, strs)), "k long, s string"
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df).collect()}
    for name, vals in (("k", nums), ("s", strs)):
        present = [v for v in vals if v is not None]
        assert got[name]["n_rows"] == n
        assert got[name]["n_nulls"] == n - len(present)
        assert got[name]["n_distinct"] == len(set(present))
        if present:
            assert got[name]["min_value"] == str(min(present))
            assert got[name]["max_value"] == str(max(present))
        else:
            assert got[name]["min_value"] is None
            assert got[name]["max_value"] is None


# --- int8 quantizer vs pure-Python reference ---------------------------------

_vec = st.lists(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
    min_size=1,
    max_size=16,
)


@given(vecs=st.lists(_vec, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_quantize_int8_matches_pure_python(spark, vecs):
    """quantize_int8_stats == the same arithmetic in plain Python on
    arbitrary float32 vectors (zero vectors, negatives, tiny scales):
    same scale, same code mass, same worst error — Catalyst's fold order
    and floor(x/scale + 0.5) must be bit-identical to the scalar loop."""
    import math

    from fred_economic_data_pipeline_local_spark.operators.similarity import (
        quantize_int8_stats,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r for r in quantize_int8_stats(df).collect()}

    for i, v in rows:
        # mirror the operator's cast: float32 storage -> double math
        dv = [float(pd.Series([x], dtype="float32").iloc[0]) for x in v]
        maxabs = max(abs(x) for x in dv)
        scale = maxabs / 127.0
        codes = [
            0 if scale == 0 else int(math.floor(x / scale + 0.5)) for x in dv
        ]
        err = max(abs(x - c * scale) for x, c in zip(dv, codes))
        assert got[i]["n_dims"] == len(v)
        assert got[i]["scale"] == round(scale, 6)
        assert got[i]["sum_codes"] == sum(codes)
        assert got[i]["max_abs_err"] == round(err, 6)



# --- corpus statistics vs pure-Python references -----------------------------

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_topk_ngrams_matches_counter(spark, texts):
    """Bigram counts == collections.Counter over the same tokenization,
    including the (freq desc, ngram asc) cut order."""
    from collections import Counter

    from fred_economic_data_pipeline_local_spark.operators.text import (
        topk_ngrams,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = Counter()
    for t in texts:
        toks = t.lower().strip().split()
        for i in range(len(toks) - 1):
            want[toks[i] + " " + toks[i + 1]] += 1
    got = [(r["ngram"], r["freq"]) for r in topk_ngrams(df, n=2, k=1000).collect()]
    assert got == sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))


@given(texts=st.lists(_doc, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_tfidf_matches_pure_python(spark, texts):
    """Per-doc tf-idf scores == the same arithmetic in plain Python
    (raw tf, unsmoothed ln(N/df), 6 dp rounding, term-asc tiebreak)."""
    import math
    from collections import Counter

    from fred_economic_data_pipeline_local_spark.operators.text import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n_docs = len(texts)
    tfs = {
        i: Counter(w for w in t.lower().strip().split() if w)
        for i, t in enumerate(texts)
    }
    dfreq = Counter()
    for tf in tfs.values():
        dfreq.update(tf.keys())
    want = {}
    for i, tf in tfs.items():
        scored = [
            (term, n, round(n * math.log(n_docs / dfreq[term]), 6))
            for term, n in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        want[i] = scored[:5]
    got = {}
    for r in tfidf_top_terms(df, k=5).collect():
        got.setdefault(r["id"], []).append((r["term"], r["tf"], r["tfidf"]))
    for i in want:
        got_sorted = sorted(got.get(i, []), key=lambda x: (-x[2], x[0]))
        assert got_sorted == want[i], (i, got_sorted, want[i])


# --- round-7 sketch/filter operators ------------------------------------


@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30),
    extra=st.lists(st.integers(-1000, 1000), max_size=30),
)
@settings(**_SETTINGS)
def test_bloom_never_false_negative(spark, keys, extra):
    """Any key inserted into the mask must survive the prune, whatever
    the key distribution — the property the join-equality oracle rests
    on."""
    from fred_economic_data_pipeline_local_spark.operators.bloom import (
        bloom_build,
        bloom_prune,
    )

    dim = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    fact = spark.createDataFrame(
        [(k,) for k in keys + extra], "k long"
    )
    mask = bloom_build(dim, "k", m_bits=1 << 10)
    kept = {
        r["k"] for r in bloom_prune(fact, "k", mask).collect()
    }
    assert set(keys) <= kept


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    ),
    cut=st.integers(0, 40),
)
@settings(**_SETTINGS)
def test_dd_sketch_merge_equals_direct(spark, vals, cut):
    """Snapshot split point never changes the merged sketch: bucket
    counts are a function of the multiset, not the partitioning."""
    from fred_economic_data_pipeline_local_spark.operators.profile import (
        dd_merge,
        dd_sketch,
    )

    a = spark.createDataFrame([(v,) for v in vals[:cut]] or [(None,)], "v double")
    b = spark.createDataFrame([(v,) for v in vals[cut:]] or [(None,)], "v double")
    direct = dd_sketch(
        spark.createDataFrame([(v,) for v in vals], "v double"), "v"
    )
    merged = dd_merge(dd_sketch(a, "v"), dd_sketch(b, "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


@given(
    items=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "f g", ""]),
        min_size=1,
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_cms_estimates_dominate_exact_counts(spark, items):
    """est >= exact for every item, on any multiset — the deterministic
    half of the CMS guarantee (the 2N/w half is distribution-dependent
    and pinned separately at a fixed w)."""
    import collections

    from fred_economic_data_pipeline_local_spark.operators.profile import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(x,) for x in items], "tok string")
    sk = cms_sketch(df, "tok", w=16, d=3)  # tiny w forces collisions
    exact = collections.Counter(items)
    probe = spark.createDataFrame([(t,) for t in exact], "tok string")
    ests = {
        r["tok"]: r["est"]
        for r in cms_estimate(sk, probe, "tok", w=16, d=3).collect()
    }
    for t, n in exact.items():
        assert ests[t] >= n, (t, n, ests[t])


# --- mixture allocation (Hamilton apportionment) invariants -----------------

_mix_counts = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.integers(min_value=1, max_value=200),
    min_size=1,
    max_size=5,
)


@given(counts=_mix_counts, budget=st.integers(min_value=0, max_value=400))
@settings(**_SETTINGS)
def test_mixture_allocation_conserves_and_stays_within_one_seat(
    spark, counts, budget
):
    """Hamilton invariants: allocations are integers summing EXACTLY to
    the budget, and each group's allocation is floor(quota) or
    floor(quota)+1 (the no-seat-jumping property that makes largest
    remainder the fair apportionment)."""
    from fred_economic_data_pipeline_local_spark.operators.curation import (
        mixture_allocation,
    )

    rows = [(g, i) for g, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "source string, i long")
    out = mixture_allocation(df, "source", budget).collect()
    assert sum(r["n_alloc"] for r in out) == budget
    for r in out:
        lo = int(r["quota"])  # floor of the (rounded-6dp) quota
        assert r["n_alloc"] in (lo, lo + 1), (r, budget)


snm_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # id (dedup'd below)
        st.integers(min_value=0, max_value=2),  # block
        st.floats(0, 500, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=snm_rows, tol=st.floats(1, 120, allow_nan=False))
@settings(**_SETTINGS)
def test_snm_islands_match_union_find_of_window_graph(spark, rows, tol):
    """snm_tolerance_components == union-find over the DEFINITIONAL
    window graph (edge iff rank distance <= w and |gap| <= tol) on
    randomized inputs — the independent-reference proof of the
    interval-structure argument, for any window >= 1 (w=3 here)."""
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        snm_tolerance_components,
    )

    uniq = {}
    for i, b, v in rows:
        uniq[i] = (b, v)
    data = [(i, b, v) for i, (b, v) in sorted(uniq.items())]

    parent = {i: i for i, _, _ in data}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    w = 3
    by_block: dict = {}
    for i, b, v in data:
        by_block.setdefault(b, []).append((v, i))
    for members in by_block.values():
        members.sort()
        for r in range(len(members)):
            for s in range(r + 1, min(r + w + 1, len(members))):
                if abs(members[s][0] - members[r][0]) <= tol:
                    union(members[r][1], members[s][1])
    expect = {i: find(i) for i, _, _ in data}

    df = spark.createDataFrame(data, "id long, blk int, bal double")
    got = {
        r["id"]: r["component"]
        for r in snm_tolerance_components(
            df, id_col="id", block_col="blk", order_col="bal", tol=tol
        ).collect()
    }
    assert got == expect
