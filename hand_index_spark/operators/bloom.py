"""Runtime Bloom-filter join pruning, from scratch.

Spark 3.3's runtime row-group filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) rebuilt as an
explicit operator: the small (build) side's join keys are folded into
an m-bit Bloom filter AT THE DRIVER (one collect of <= min(k*n, m)
distinct bit positions — the same driver-sized step Spark's own
InjectRuntimeFilter performs), and the membership test is compiled
into the probe side's plan as a pure JVM expression
(xxhash64 -> pmod -> element_at on a constant word array -> getbit; no
Python anywhere), so it sits UNDER the join and ABOVE the scan where
Catalyst can evaluate it before the shuffle.

Why this matters at 100 TB: a semi-join against a 0.1%-selective dim
shuffles the full probe table without a runtime filter; with one, the
probe rows that cannot match die in the scan stage, and the shuffle
carries ~(selectivity + fp_rate) of the table. The final exact
left-semi join makes the OUTPUT independent of the filter's false
positives — the Bloom is pure IO/shuffle savings, never a correctness
surface (tests/test_bloom.py pins both).

Sizing: default k=4 hashes; pick m_bits >= ~10 bits/key for ~1% fp.
All hashing is xxhash64(key, seed_j) identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(df: DataFrame, col: str, m_bits: int, k: int = 4) -> list[int]:
    """Collect the Bloom word array (int64 list, len m_bits/64) for
    df[col]. One distributed job: k positions per key, distinct, then
    a driver collect bounded by min(k * n_keys, m_bits) longs."""
    assert m_bits % 64 == 0
    pos = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(m_bits))
                        for j in range(k)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # int64 two's complement for F.lit
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(col: Column, words: list[int], m_bits: int, k: int = 4) -> Column:
    """JVM-side membership test against a constant word array. False
    positives possible, false negatives impossible (same hash family
    as build_bloom)."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for j in range(k):
        pos = F.pmod(F.xxhash64(col, F.lit(j)), F.lit(m_bits))
        word = F.element_at(arr, F.floor(pos / F.lit(64)).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(pos, F.lit(64)).cast("int")) == F.lit(1))
    return cond


def bloom_semi_join(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
) -> DataFrame:
    """probe LEFT SEMI JOIN build, with a runtime Bloom prefilter on
    the probe scan. Output == the plain semi-join exactly; the Bloom
    only reduces the rows entering the shuffle/join."""
    words = build_bloom(build, build_col, m_bits, k)
    pref = probe.filter(might_contain(F.col(probe_col), words, m_bits, k))
    keys = build.select(F.col(build_col).alias(probe_col)).distinct()
    return pref.join(keys, probe_col, "left_semi")
