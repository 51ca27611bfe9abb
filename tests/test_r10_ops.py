"""Unit pins for the round-10 operators (Kruskal-Wallis, Cramér's V,
two-proportion z-test, conformal intervals, assortativity, clustering
coefficients) against pure-Python references and closed-form cases.
The parity tests cover the DuckDB mirrors; these pin the MATH."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- kruskal_wallis ----------------------------------------------------------


def _py_kruskal(samples: dict[str, list[int]]):
    """Tie-corrected Kruskal-Wallis H over {group: values} (textbook)."""
    allv = sorted(v for vs in samples.values() for v in vs)
    n = len(allv)
    # midrank per distinct value
    mid, i = {}, 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        mid[allv[i]] = (i + 1 + j) / 2.0
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        sum(mid[v] for v in vs) ** 2 / len(vs) for vs in samples.values()
    ) - 3 * (n + 1)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    c = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    return h, h / c


def test_kruskal_wallis_matches_pure_python(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        kruskal_wallis,
    )

    rng = random.Random(11)
    samples = {
        g: [rng.randint(0, 9) + shift for _ in range(60)]
        for g, shift in (("a", 0), ("b", 2), ("c", 0))
    }
    df = spark.createDataFrame(
        [(g, v) for g, vs in samples.items() for v in vs],
        "g string, v int",
    )
    out = {r[0]: r for r in _rows(kruskal_wallis(df, "g", "v"))}
    h, h_adj = _py_kruskal(samples)
    for g, vs in samples.items():
        grow = out[g]
        assert grow[1] == len(vs)
        assert grow[3] == pytest.approx(h, abs=1e-5)
        assert grow[4] == pytest.approx(h_adj, abs=1e-5)
        assert grow[5] == 2  # dof = k - 1


def test_kruskal_wallis_identical_groups_near_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        kruskal_wallis,
    )

    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(1, 11)],
        "g string, v int",
    )
    rows = _rows(kruskal_wallis(df, "g", "v"))
    # identical distributions -> H exactly 0, mean ranks equal
    assert all(r[3] == pytest.approx(0.0, abs=1e-9) for r in rows)
    assert rows[0][2] == rows[1][2]


# --- cramers_v ---------------------------------------------------------------


def test_cramers_v_perfect_association_is_one(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        cramers_v,
    )

    df = spark.createDataFrame(
        [(x, x.upper()) for x in "abcab" * 20], "a string, b string"
    )
    [(pair, n, ka, kb, chi2, v)] = _rows(cramers_v(df, "a", "b", "t"))
    assert (pair, n, ka, kb) == ("t", 100, 3, 3)
    assert v == pytest.approx(1.0, abs=1e-9)


def test_cramers_v_independent_is_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        cramers_v,
    )

    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    [(_, n, _, _, chi2, v)] = _rows(cramers_v(df, "a", "b", "t"))
    assert n == 100
    assert chi2 == pytest.approx(0.0, abs=1e-9)
    assert v == pytest.approx(0.0, abs=1e-9)


# --- two_proportion_ztest ------------------------------------------------------


def test_ztest_matches_closed_form(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        two_proportion_ztest,
    )

    # cohort 0 = even ids (40 users, 10 convert); cohort 1 = odd ids
    # (60 users, 30 convert); duplicate view rows exercise the
    # per-entity dedup
    rows = []
    for i in range(40):
        uid = 2 * i
        rows += [(uid, "purchase" if i < 10 else "view"), (uid, "view")]
    for i in range(60):
        uid = 2 * i + 1
        rows += [(uid, "purchase" if i < 30 else "view"), (uid, "view")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    [(n0, n1, c0, c1, p0, p1, z)] = _rows(
        two_proportion_ztest(
            df,
            "user_id",
            F.col("user_id") % 2,
            F.col("event_type") == "purchase",
        )
    )
    assert (n0, n1, c0, c1) == (40, 60, 10, 30)
    pool = 40 / 100
    se = math.sqrt(pool * (1 - pool) * (1 / 40 + 1 / 60))
    assert z == pytest.approx((0.5 - 0.25) / se, abs=1e-6)


# --- conformal_backtest --------------------------------------------------------


def test_conformal_qhat_is_order_statistic_and_coverage_exact(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import (
        conformal_backtest,
    )

    # 40 steps; seasonal-naive with period 1 == lag-1; values chosen so
    # residuals are the step index (1, 2, ..., 39)
    vals, cur = [], 0.0
    for i in range(40):
        vals.append(("k", i, cur))
        cur += i + 1.0
    df = spark.createDataFrame(vals, "k string, t long, v double")
    [(k, n_cal, n_test, qhat, cov, tgt)] = _rows(
        conformal_backtest(df, "k", "t", "v", period=1, alpha=0.1)
    )
    # residual steps: t = 1..39 (lag defined from t=1); cut at
    # 1 + (39 - 1) * 2 / 3 = 26.33 -> cal = t in 1..26 (residuals 1..26)
    assert (n_cal, n_test) == (26, 13)
    # qhat = ceil(0.9 * 27) = 25th smallest of 1..26 -> 25
    assert qhat == 25.0
    # test residuals 27..39, none <= 25 -> coverage 0
    assert cov == 0.0
    assert tgt == 0.9


def test_conformal_full_coverage_when_residuals_stationary(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import (
        conformal_backtest,
    )

    # alternating series: lag-1 residuals all equal -> qhat == residual,
    # coverage exactly 1.0 on the test slice
    df = spark.createDataFrame(
        [("k", i, float(i % 2)) for i in range(30)],
        "k string, t long, v double",
    )
    [(_, n_cal, n_test, qhat, cov, _)] = _rows(
        conformal_backtest(df, "k", "t", "v", period=1, alpha=0.1)
    )
    assert qhat == 1.0 and cov == 1.0
    assert n_cal + n_test == 29


# --- degree_assortativity ------------------------------------------------------


def _py_pearson(pairs):
    n = len(pairs)
    mx = sum(x for x, _ in pairs) / n
    my = sum(y for _, y in pairs) / n
    cov = sum((x - mx) * (y - my) for x, y in pairs) / (n - 1)
    sx = math.sqrt(sum((x - mx) ** 2 for x, _ in pairs) / (n - 1))
    sy = math.sqrt(sum((y - my) ** 2 for _, y in pairs) / (n - 1))
    return cov / (sx * sy)


def test_assortativity_triangle_with_pendant(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "src long, dst long"
    )
    [(n_nodes, n_edges, r)] = _rows(degree_assortativity(edges))
    assert (n_nodes, n_edges) == (4, 4)
    deg = {1: 3, 2: 2, 3: 2, 4: 1}
    pairs = []
    for a, b in ((1, 2), (1, 3), (2, 3), (1, 4)):
        pairs += [(deg[a], deg[b]), (deg[b], deg[a])]
    assert r == pytest.approx(_py_pearson(pairs), abs=1e-6)


def test_assortativity_star_is_minus_one(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    [(n_nodes, n_edges, r)] = _rows(degree_assortativity(edges))
    assert (n_nodes, n_edges) == (5, 4)
    assert r == pytest.approx(-1.0, abs=1e-9)


# --- clustering_coefficients ---------------------------------------------------


def test_clustering_coefficients_triangle_with_pendant(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "src long, dst long"
    )
    out = {r[0]: r for r in _rows(clustering_coefficients(edges))}
    # node 4 (degree 1) excluded; node 1: 1 triangle / C(3,2)=3 pairs
    assert set(out) == {1, 2, 3}
    assert out[1][1:] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[2][1:] == (2, 1, 1.0)
    assert out[3][1:] == (2, 1, 1.0)


def test_clustering_coefficients_square_is_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    rows = _rows(clustering_coefficients(edges))
    assert len(rows) == 4
    assert all(r[2] == 0 and r[3] == 0.0 for r in rows)


# --- js_divergence_by_group ----------------------------------------------------


def _py_jsd(p_counts: dict[str, int], q_counts: dict[str, int]) -> float:
    """Definitional JSD(p || q) in nats over the FULL union vocabulary."""
    np_, nq = sum(p_counts.values()), sum(q_counts.values())
    out = 0.0
    for tok in set(p_counts) | set(q_counts):
        p = p_counts.get(tok, 0) / np_
        q = q_counts.get(tok, 0) / nq
        m = (p + q) / 2
        if p:
            out += 0.5 * p * math.log(p / m)
        if q:
            out += 0.5 * q * math.log(q / m)
    return out


def test_jsd_matches_definitional_full_vocabulary(spark):
    from fred_economic_data_pipeline_local_spark.operators.text import (
        js_divergence_by_group,
    )

    docs = [
        ("a", "x x x y z"),
        ("a", "x y y w"),
        ("b", "p p q x"),
        ("b", "q q z z z"),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    corpus: dict[str, int] = {}
    groups: dict[str, dict[str, int]] = {}
    for g, text in docs:
        gd = groups.setdefault(g, {})
        for tok in text.split():
            corpus[tok] = corpus.get(tok, 0) + 1
            gd[tok] = gd.get(tok, 0) + 1
    out = {r[0]: r for r in js_divergence_by_group(df, "g").collect()}
    for g, cnts in groups.items():
        assert out[g]["n_tokens"] == sum(cnts.values())
        assert out[g]["vocab"] == len(cnts)
        assert out[g]["jsd_nats"] == pytest.approx(
            _py_jsd(cnts, corpus), abs=1e-6
        )


def test_jsd_identical_distribution_is_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.text import (
        js_divergence_by_group,
    )

    df = spark.createDataFrame(
        [("g", "a b c")], "g string, text string"
    )
    [row] = js_divergence_by_group(df, "g").collect()
    # single group == corpus -> p = q everywhere -> JSD exactly 0
    assert row["jsd_nats"] == pytest.approx(0.0, abs=1e-9)
    assert row["coverage"] == pytest.approx(1.0, abs=1e-9)


# --- readability_scores --------------------------------------------------------


def test_readability_known_document(spark):
    from fred_economic_data_pipeline_local_spark.operators.text import (
        readability_scores,
    )

    # 8 whitespace tokens, 2 sentences; long (>= 7 chars) tokens are
    # brownish, creature, "jumped." (punct attaches under whitespace
    # tokenization), "lazybones!" -> 4 of 8
    text = "the quick brownish creature jumped. over the lazybones!"
    df = spark.createDataFrame([("g", text)], "g string, text string")
    [row] = readability_scores(df, "g").collect()
    assert row["n_docs"] == 1
    assert row["avg_words_per_sentence"] == pytest.approx(4.0)
    assert row["long_word_share"] == pytest.approx(0.5)
    # LIX = 8/2 + 100 * 4/8 = 54
    assert row["avg_lix"] == pytest.approx(54.0)


def test_readability_no_terminator_counts_one_sentence(spark):
    from fred_economic_data_pipeline_local_spark.operators.text import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [("g", "just four small words")], "g string, text string"
    )
    [row] = readability_scores(df, "g").collect()
    assert row["avg_words_per_sentence"] == pytest.approx(4.0)
    assert row["avg_lix"] == pytest.approx(4.0)


# --- phash63 / phash_neardup_pairs ----------------------------------------------


def test_phash_banding_is_lossless_to_hamming_7(spark):
    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    import random

    rng = random.Random(5)
    base = rng.getrandbits(63)
    rows = [(0, base)]
    # ids 1..7: flip exactly id bits at random positions (hamming == id)
    for d in range(1, 8):
        flipped = base
        for pos in rng.sample(range(63), d):
            flipped ^= 1 << pos
        rows.append((d, flipped))
    # id 8: flip 8 bits spread one per band -> outside the guarantee
    flipped = base
    for band in range(8):
        flipped ^= 1 << (8 * band if band < 7 else 57)
    rows.append((8, flipped))
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_hamming=7).collect()
    }
    # every hamming <= 7 pair with the base is found, with exact distance
    for d in range(1, 8):
        assert pairs[(0, d)] == d
    assert (0, 8) not in pairs  # hamming 8: correctly outside the bound


def test_phash_resize_robust_and_distinct(spark):
    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        attach_pattern_media,
        phash63,
    )

    ids = spark.createDataFrame(
        [(i,) for i in range(0, 50, 5)], "doc_id long"
    )
    hashes = {
        r["doc_id"]: r["phash"]
        for r in phash63(attach_pattern_media(ids, variant_every=5))
        .collect()
    }
    originals = [h for i, h in hashes.items() if i < 1_000_000]
    # every id renders a distinct field -> distinct hashes
    assert len(set(originals)) == len(originals)
    # half-resolution re-renders stay within the Hamming-7 dedup bound
    # for (nearly) all planted pairs on this slice
    close = sum(
        1
        for i, h in hashes.items()
        if i >= 1_000_000
        and bin(h ^ hashes[i - 1_000_000]).count("1") <= 7
    )
    n_variants = sum(1 for i in hashes if i >= 1_000_000)
    assert n_variants == 10
    assert close >= 9


# --- apply_topk_delta ------------------------------------------------------------


def _topk_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topk_ivm_insert_folds_without_touching_base(spark):
    from fred_economic_data_pipeline_local_spark.operators.ivm import (
        apply_topk_delta,
        materialize_topk,
    )

    base0 = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    state = materialize_topk(base0, ["k"], "v", 3)
    assert _topk_rows(state) == [(7, 7.0), (8, 8.0), (9, 9.0)]
    # insert one row above the cut, one below; base deliberately WRONG
    # (empty) to prove the fold path never reads it
    feed = spark.createDataFrame(
        [(100, 8.5, "insert"), (200, 0.5, "insert")],
        "k long, v double, _change_type string",
    )
    empty_base = base0.limit(0)
    out = apply_topk_delta(state, feed, empty_base, ["k"], "v", 3)
    assert _topk_rows(out) == [(8, 8.0), (9, 9.0), (100, 8.5)]


def test_topk_ivm_delete_inside_topk_recomputes_from_base(spark):
    from fred_economic_data_pipeline_local_spark.operators.ivm import (
        apply_topk_delta,
        materialize_topk,
    )

    base0 = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    state = materialize_topk(base0, ["k"], "v", 3)
    feed = spark.createDataFrame(
        [(9, 9.0, "delete")], "k long, v double, _change_type string"
    )
    base1 = base0.where("k <> 9")
    out = apply_topk_delta(state, feed, base1, ["k"], "v", 3)
    # 6 re-enters from below the old cut — only the base knows that
    assert _topk_rows(out) == [(6, 6.0), (7, 7.0), (8, 8.0)]


def test_topk_ivm_delete_below_cut_is_noop(spark):
    from fred_economic_data_pipeline_local_spark.operators.ivm import (
        apply_topk_delta,
        materialize_topk,
    )

    base0 = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    state = materialize_topk(base0, ["k"], "v", 3)
    feed = spark.createDataFrame(
        [(0, 0.0, "delete")], "k long, v double, _change_type string"
    )
    # base deliberately WRONG (empty): a below-cut delete must not
    # trigger the recompute path at all
    out = apply_topk_delta(state, feed, base0.limit(0), ["k"], "v", 3)
    assert _topk_rows(out) == [(7, 7.0), (8, 8.0), (9, 9.0)]


# --- ADVICE r10 regression pins --------------------------------------------------


def test_conformal_short_series_reports_inf_not_dropped(spark):
    """A calibration slice too small for the order statistic
    (ceil((1-alpha)(n_cal+1)) > n_cal) must report qhat = +inf with
    full coverage — the split-conformal convention — never silently
    drop the key from the output (ADVICE r10, operators/series.py)."""
    from fred_economic_data_pipeline_local_spark.operators.series import (
        conformal_backtest,
    )

    # 6 steps -> 5 residuals, cut keeps 4 in calibration;
    # ceil(0.9 * 5) = 5 > 4 -> no order statistic exists
    df = spark.createDataFrame(
        [("short", i, float(i * i)) for i in range(6)]
        # a healthy sibling key proves the join change is surgical
        + [("long", i, float(i % 2)) for i in range(30)],
        "k string, t long, v double",
    )
    got = {
        r["k"]: r
        for r in conformal_backtest(
            df, "k", "t", "v", period=1, alpha=0.1
        ).collect()
    }
    assert "short" in got  # the old inner join dropped this key
    assert math.isinf(got["short"]["qhat"])
    assert got["short"]["coverage"] == 1.0
    assert got["long"]["qhat"] == 1.0 and got["long"]["coverage"] == 1.0


def test_chi2_and_cramers_exclude_null_categories(spark):
    """NULL in either categorical is excluded up front: mixing
    groupBy's NULL cell with count_distinct's NULL exclusion understates
    dof and can push V past 1 (ADVICE r10, operators/stats.py)."""
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        chi2_independence,
        cramers_v,
    )

    rows = [("x", "p")] * 10 + [("y", "q")] * 10
    nulls = [(None, "p")] * 5 + [("x", None)] * 5
    with_nulls = spark.createDataFrame(rows + nulls, "a string, b string")
    clean = spark.createDataFrame(rows, "a string, b string")

    [(pair, n, ka, kb, chi2, v)] = _rows(cramers_v(with_nulls, "a", "b", "t"))
    [(_, n2, ka2, kb2, chi22, v2)] = _rows(cramers_v(clean, "a", "b", "t"))
    assert (n, ka, kb, chi2, v) == (n2, ka2, kb2, chi22, v2)
    assert v <= 1.0

    got = _rows(chi2_independence(with_nulls, "a", "b"))
    want = _rows(chi2_independence(clean, "a", "b"))
    assert sorted(got) == sorted(want)


def test_phash_null_for_undecodable_and_never_paired(spark):
    """Undecodable/short media buffers hash to NULL (not sentinel 0,
    which made every malformed image a mutual Hamming-0 duplicate) and
    NULL hashes never enter banding (ADVICE r10, multimodal.py)."""
    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        phash63,
        phash_neardup_pairs,
    )

    good = bytes(range(256)) * 4  # 32x32 decodable buffer
    rows = [
        (1, good, 32, 32),
        (2, b"\x01\x02", 32, 32),  # short buffer
        (3, None, 32, 32),  # missing media
        (4, b"", 0, 0),  # degenerate dims
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media binary, width int, height int"
    )
    hashes = {r["doc_id"]: r["phash"] for r in phash63(df).collect()}
    assert hashes[1] is not None
    assert hashes[2] is None and hashes[3] is None and hashes[4] is None
    # the two malformed rows must NOT pair as Hamming-0 duplicates
    hdf = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()],
        "doc_id long, phash long",
    )
    assert phash_neardup_pairs(hdf, max_hamming=7).count() == 0


def test_attach_pattern_media_rejects_variant_offset_collision(spark):
    """doc_id at or past the 1M variant offset would collide with a
    variant id and corrupt the planted ground truth — loud error, not
    silent corruption (ADVICE r10, multimodal.py)."""
    import pytest as _pytest

    from fred_economic_data_pipeline_local_spark.operators.multimodal import (
        attach_pattern_media,
    )

    df = spark.createDataFrame([(999_999,), (1_000_000,)], "doc_id long")
    with _pytest.raises(Exception, match="1_000_000"):
        attach_pattern_media(df).collect()
