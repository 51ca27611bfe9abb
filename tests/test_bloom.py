"""Bloom-join pruning (operators/bloom.py): the no-false-negative
superset property, end-to-end join equality, the map-side plan shape,
and the degenerate edges (empty dim, bad sizing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.bloom import (
    BloomMask,
    bloom_build,
    bloom_prune,
    bloom_pruned_join,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def tables(spark):
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_extendedprice"
    )
    dim = (
        load_table(spark, "orders", SF_DIR)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return li, dim


def test_no_false_negatives(spark, tables):
    """Every fact row whose key IS in the dim survives the prune."""
    li, dim = tables
    mask = bloom_build(dim, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", mask)
    matching = li.join(dim, li.l_orderkey == dim.o_orderkey, "left_semi")
    lost = matching.exceptAll(
        pruned.join(dim, pruned.l_orderkey == dim.o_orderkey, "left_semi")
    )
    assert lost.count() == 0


def test_prune_is_superset_not_exact(spark, tables):
    """The mask admits false positives (superset), never invents rows."""
    li, dim = tables
    mask = bloom_build(dim, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", mask)
    n_match = li.join(dim, li.l_orderkey == dim.o_orderkey, "left_semi").count()
    assert n_match <= pruned.count() <= li.count()
    # pruned rows all came from the fact side verbatim
    assert pruned.exceptAll(li).count() == 0


def test_join_equals_plain_join(spark, tables):
    li, dim = tables
    j = bloom_pruned_join(li, dim, "l_orderkey", "o_orderkey")
    plain = li.join(dim, li.l_orderkey == dim.o_orderkey, "inner")
    assert j.exceptAll(plain).count() == 0
    assert plain.exceptAll(j).count() == 0


def test_prune_plan_is_map_side(spark, tables):
    """No exchange and no join node: the mask is a codegen'd literal
    filter over the scan (the shape that holds at 100 TB)."""
    li, dim = tables
    mask = bloom_build(dim, "o_orderkey")
    plan = (
        bloom_prune(li, "l_orderkey", mask)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.lstrip().startswith("*")  # whole-stage codegen


def test_build_is_bounded_by_mask_size(spark, tables):
    """The driver-side materialization is O(m/64) words, never O(keys)."""
    _, dim = tables
    m_bits = 1 << 10
    mask = bloom_build(dim, "o_orderkey", m_bits=m_bits)
    assert len(mask.words) == m_bits // 64
    assert 0 < mask.set_bits <= m_bits


def test_empty_dim_prunes_everything(spark, tables):
    li, dim = tables
    mask = bloom_build(dim.where(F.lit(False)), "o_orderkey")
    assert mask.set_bits == 0
    assert bloom_prune(li, "l_orderkey", mask).count() == 0


def test_mask_is_deterministic(spark, tables):
    _, dim = tables
    assert bloom_build(dim, "o_orderkey") == bloom_build(dim, "o_orderkey")


def test_sizing_validation(spark, tables):
    _, dim = tables
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(dim, "o_orderkey", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(dim, "o_orderkey", k=0)


def test_null_keys_never_survive_the_join(spark, tables):
    """Null fact keys may pass the mask but die in the join — identical
    to the unpruned plan's treatment of nulls."""
    li, dim = tables
    li_nulls = li.unionByName(
        li.limit(3).select(
            F.lit(None).cast("long").alias("l_orderkey"), "l_extendedprice"
        )
    )
    j = bloom_pruned_join(li_nulls, dim, "l_orderkey", "o_orderkey")
    plain = li.join(dim, li.l_orderkey == dim.o_orderkey, "inner")
    assert j.count() == plain.count()


def test_mask_dataclass_roundtrip():
    m = BloomMask(words=(0, 5, -1), m_bits=192, k=2)
    assert m.set_bits == 2 + 64


def test_bloom_params_classic_sizing():
    from fred_economic_data_pipeline_local_spark.operators.bloom import (
        bloom_params,
    )
    import pytest as _pytest

    m, k = bloom_params(100_000, fpp=0.01)
    assert m % 64 == 0
    assert 9 * 100_000 < m < 10 * 100_000  # ~9.59 bits/key at 1%
    assert k == 7  # ~0.69 * m/n
    m2, k2 = bloom_params(10, fpp=0.5)
    assert m2 >= 64 and 1 <= k2 <= 8
    with _pytest.raises(ValueError, match="n_keys"):
        bloom_params(0)
    with _pytest.raises(ValueError, match="fpp"):
        bloom_params(10, fpp=1.0)


def test_bloom_params_drive_build(spark, tables):
    """The sizing helper's output plugs straight into build/prune."""
    from fred_economic_data_pipeline_local_spark.operators.bloom import (
        bloom_build,
        bloom_params,
        bloom_prune,
    )

    li, dim = tables
    n = dim.count()
    m, k = bloom_params(n, fpp=0.05)
    mask = bloom_build(dim, "o_orderkey", m_bits=m, k=k)
    pruned = bloom_prune(li, "l_orderkey", mask)
    n_match = li.join(dim, li.l_orderkey == dim.o_orderkey, "left_semi").count()
    # prune keeps all matches and, at 5% fpp, a bounded overshoot
    assert n_match <= pruned.count() <= n_match + int(0.15 * li.count()) + 10
