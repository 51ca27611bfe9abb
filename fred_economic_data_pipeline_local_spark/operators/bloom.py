"""Bloom-filter join pruning: map-side semi-join reduction.

The dominant cost of a big fact ⋈ selective-dim join at 100 TB is the
shuffle of fact rows that will never match: a predicate that keeps 1%
of ``orders`` still forces every ``lineitem`` row through the exchange
before the join can discard 99% of them. The classic fix (Bloom-join /
semi-join reduction; Spark's own runtime row-level filtering applies it
when statistics permit) is to summarize the dim side's join keys into a
Bloom filter — a fixed-size bitmask with no false negatives — broadcast
it, and drop non-matching fact rows *before* the shuffle.

This module implements the recipe explicitly so the plan shape is
guaranteed rather than statistics-dependent:

- ``bloom_build`` folds the dim keys into an ``m_bits`` Bloom bitmask
  **distributedly**: each key contributes ``k`` bit positions
  (``pmod(xxhash64(key, i), m)``), positions fold into 64-bit words via
  a partial+final ``bit_or`` aggregate, and only the ≤ ``m/64`` word
  rows ever reach the driver — O(filter size), independent of key count,
  the same driver materialization any broadcast filter pays.
- ``bloom_prune`` inlines the mask as an array literal and keeps a
  fact row iff all ``k`` of its key's bits are set — pure codegen'd
  bit arithmetic (``element_at`` + ``&``), map-side, no shuffle, no UDF.

Pruning is a SUPERSET filter: false positives pass (rate ≈
``(1 - exp(-k*n/m))^k``; size ``m ≈ k*n/ln 2`` for the classic optimum),
false negatives cannot, so ``bloom_prune(fact) ⋈ dim`` is row-identical
to ``fact ⋈ dim`` — which is exactly what the catalog oracle checks.
Null keys hash like any value and are eliminated by the inner join
itself, as in the unpruned plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _shl1(bit: Column) -> Column:
    """``1L << bit`` with a column shift count (the PySpark ``shiftleft``
    wrapper only takes a literal count; the SQL function takes a column)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit)


@dataclass(frozen=True)
class BloomMask:
    """An immutable Bloom bitmask: ``m_bits`` bits as ``m_bits/64``
    signed 64-bit words, probed with ``k`` xxhash64-derived positions.

    ``key_type`` records the build side's key type (Spark DDL string):
    ``bloom_prune`` casts the probe key to it before hashing, because
    xxhash64 is TYPE-sensitive — an int-vs-bigint mismatch the join
    would happily match via implicit cast would otherwise hash to
    different positions and produce a FALSE NEGATIVE (dropped matching
    rows — the one thing a Bloom filter must never do)."""

    words: tuple[int, ...]
    m_bits: int
    k: int
    key_type: str = "string"

    @property
    def set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions for a key: pmod(xxhash64(key, i), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic Bloom sizing for an expected key count and target false-
    positive rate: ``m = -n ln(p) / (ln 2)^2`` rounded up to a word
    multiple, ``k = (m/n) ln 2`` clamped to [1, 8]. Use at plan time
    when the dim's cardinality estimate is known (e.g. from the
    manifest zone maps or table statistics)."""
    import math

    if n_keys < 1:
        raise ValueError(f"n_keys must be >= 1; got {n_keys}")
    if not (0 < fpp < 1):
        raise ValueError(f"fpp must be in (0, 1); got {fpp}")
    m = int(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = max(_WORD, ((m + _WORD - 1) // _WORD) * _WORD)
    k = max(1, min(8, round(m / n_keys * math.log(2))))
    return m, k


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = 3
) -> BloomMask:
    """Fold ``keys[key_col]`` into a BloomMask, distributedly.

    The shuffle carries at most ``m_bits/64`` (word, partial-or) rows per
    map partition — for the 1 << 17 default, 2,048 rows of 16 bytes —
    and the driver collects the ≤ 2,048 final words. Key volume never
    reaches the driver; at 100 TB you size ``m_bits ≈ k * n / ln 2`` for
    the expected distinct-key count n and the build stays O(m).
    """
    if m_bits % _WORD != 0:
        raise ValueError(f"m_bits must be a multiple of {_WORD}; got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    key_type = keys.schema[key_col].dataType.simpleString()
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
        "__pos"
    )
    words_df = (
        keys.select(pos)
        .select(
            (F.col("__pos") / _WORD).cast("int").alias("__word"),
            _shl1((F.col("__pos") % _WORD).cast("int")).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__or"))
    )
    words = [0] * (m_bits // _WORD)
    for row in words_df.collect():
        words[row["__word"]] = row["__or"]
    return BloomMask(
        words=tuple(words), m_bits=m_bits, k=k, key_type=key_type
    )


def bloom_prune(
    fact: DataFrame, key_col: str, mask: BloomMask
) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the mask (superset filter).

    The mask rides in as a single array<long> LITERAL (one Catalyst
    ``Literal`` node regardless of word count — 16 KB of task-binary
    payload at the default size, the same bytes any broadcast filter
    ships), so the filter is a plain codegen'd ``Filter`` over the scan:
    every probe is ``element_at`` + ``&`` on the constant array — no
    join, no exchange, no interpreted-eval BNLJ condition (this repo's
    pair-join profiling showed interpreted conditions inside
    BroadcastNestedLoopJoin lose badly; a Literal keeps the probes in
    whole-stage codegen). Rows whose key was never inserted are dropped
    here instead of surviving to the join exchange; false positives are
    eliminated by the downstream join, never by the mask.
    """
    mask_lit = F.lit(list(mask.words))
    probes = []
    # cast the probe key to the BUILD side's recorded type: xxhash64 is
    # type-sensitive, and a width mismatch (int fact vs bigint dim) the
    # downstream join matches via implicit cast must not become a false
    # negative here. Values the cast cannot represent could not match
    # any build-side key anyway (the dim's type cannot hold them).
    probe_key = F.col(key_col).cast(mask.key_type)
    for p in _positions(probe_key, mask.m_bits, mask.k):
        word = F.element_at(mask_lit, (p / _WORD).cast("int") + F.lit(1))
        bit = _shl1((p % _WORD).cast("int"))
        probes.append(word.bitwiseAND(bit) != F.lit(0).cast("long"))
    keep = probes[0]
    for extra in probes[1:]:
        keep = keep & extra
    return fact.where(keep)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 17,
    k: int = 3,
    expected_keys: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Inner equi-join with the fact side Bloom-pruned before the
    exchange: row-identical to ``fact.join(dim, fact[fk] == dim[dk])``
    because pruning admits no false negatives and the join removes the
    false positives. Only surviving fact rows shuffle.

    When the dim side's distinct-key cardinality is known (manifest
    zone maps, table statistics, a prior count), pass
    ``expected_keys`` (+ target ``fpp``) and the mask is sized by the
    classic ``bloom_params`` math instead of the fixed 1 << 17 default
    — at 100 TB an under-sized mask saturates (every probe passes, the
    prune does nothing) and an over-sized one wastes task-binary bytes
    on every executor."""
    if expected_keys is not None:
        m_bits, k = bloom_params(expected_keys, fpp=fpp)
    mask = bloom_build(dim, dim_key, m_bits=m_bits, k=k)
    pruned = bloom_prune(fact, fact_key, mask)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
