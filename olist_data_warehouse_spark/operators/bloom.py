"""Bloom-filter semi-join reduction.

The big-big join killer at 100 TB is shuffling a fact table to probe a
keyset. When the keyset fits a *sketch*, the probe becomes a map-side
filter: build an m-bit Bloom filter over the build side's keys
(k portable hashes), ship the bit array to every task as an 8 KB
literal, and drop non-matching fact rows inside the scan stage —
before any exchange. False positives (tunable via m, k) are then
eliminated by the real join over the surviving ~x% of rows; false
negatives are impossible, so the reduction is semantically free.

Spark's own runtime Bloom pushdown (spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled) does this opportunistically and
engine-internally; this operator is the *portable* form — the same
md5-based hash family as the rest of the engine, so a DuckDB oracle
reproduces membership bit-for-bit, false positives included.

The collect() here is legal driver traffic: the bit array is a fixed
m/8-byte sketch (default 8 KB) regardless of input size — the whole
point of sketching the keyset instead of broadcasting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators.textops import portable_hash32

M_BITS_DEFAULT = 65536   # 8 KB bitset
K_HASHES_DEFAULT = 3


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """The k salted bit positions for a key (hash family shared with
    the DuckDB oracle: md5 of 'i|key')."""
    return [
        portable_hash32(F.concat_ws("|", F.lit(str(i)), key.cast("string")))
        % m_bits
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key: Column,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> list[int]:
    """Build the bit array: distinct bit positions over all keys,
    collected into m_bits/64 longs. The aggregation is a distinct on
    at most m_bits integers — bounded shuffle, bounded collect."""
    pos = (
        df.select(F.explode(F.array(*_positions(key, k, m_bits))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into signed 64-bit so the values are valid
    # Spark LongType literals
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column,
    words: list[int],
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> Column:
    """Membership predicate: all k bits set. Pure codegen'd column
    expression over an array<long> literal — evaluated inside the scan
    stage, so Catalyst applies it before any shuffle."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for p in _positions(key, k, m_bits):
        word = F.get(arr, F.floor(p / 64).cast("int"))  # 0-based index
        # SQL shiftleft via call_function: the F.shiftleft wrapper only
        # accepts a Python-int bit count, not a per-row column
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond
