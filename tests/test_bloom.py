"""Runtime Bloom-filter join pruning (operators/bloom.py): the
prefilter must never drop a true match (no false negatives), must
actually prune (measured reduction at design fp rate), and the final
semi-join output must be byte-identical to the unfiltered semi-join."""

from pyspark.sql import functions as F

from hand_index_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
)


def _probe(spark, n=200_000):
    return spark.range(n).select((F.col("id") * 37 % 1_000_003).alias("key"))


def _build(spark, n_keys=500):
    # keys drawn from the same space, deterministic
    return spark.range(n_keys).select((F.col("id") * 37 % 1_000_003).alias("bkey"))


def test_no_false_negatives(spark):
    build = _build(spark)
    words = build_bloom(build, "bkey", m_bits=1 << 13, k=4)
    missed = build.filter(
        ~might_contain(F.col("bkey"), words, 1 << 13, 4)
    ).count()
    assert missed == 0


def test_prefilter_prunes_at_design_rate(spark):
    probe, build = _probe(spark), _build(spark)
    words = build_bloom(build, "bkey", m_bits=1 << 14, k=4)  # ~32 bits/key
    kept = probe.filter(might_contain(F.col("key"), words, 1 << 14, 4)).count()
    matches = probe.join(
        build.select(F.col("bkey").alias("key")).distinct(), "key", "left_semi"
    ).count()
    assert kept >= matches
    # at 32 bits/key + k=4 the fp rate is well under 2%; the probe is
    # ~0.05%-selective, so the prefilter must kill the vast majority
    assert kept <= matches + 0.02 * probe.count()


def test_semi_join_output_exact(spark):
    probe, build = _probe(spark), _build(spark)
    got = sorted(
        r["key"]
        for r in bloom_semi_join(
            probe, "key", build, "bkey", m_bits=1 << 12, k=2  # lots of fps
        ).collect()
    )
    want = sorted(
        r["key"]
        for r in probe.join(
            build.select(F.col("bkey").alias("key")).distinct(),
            "key",
            "left_semi",
        ).collect()
    )
    assert got == want


def test_handles_strings_and_empty_build(spark):
    probe = spark.range(1000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("u")
    )
    build = probe.filter(F.col("u").rlike("9[0-9]$"))
    got = bloom_semi_join(probe, "u", build, "u", m_bits=1 << 10).count()
    assert got == build.count()
    empty = build.filter(F.lit(False))
    assert bloom_semi_join(probe, "u", empty, "u", m_bits=1 << 10).count() == 0


# ------------------------------------------------------- per-file index


def _indexed_table(spark, tmp_path, n=50_000, files=8):
    from hand_index_spark.tables.icelite import IceliteTable

    t = IceliteTable(str(tmp_path), "pt")
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("k"), F.col("id")), 256).alias("key"),
    )
    # ~10 bits/key: 4096-bit default would saturate at 6250 keys/file
    t.write(
        df.repartition(files, "doc_id"),
        bloom_cols=["key"],
        bloom_bits=1 << 16,
    )
    return t, df


def test_point_lookup_prunes_and_matches_full_scan(spark, tmp_path):
    t, df = _indexed_table(spark, tmp_path)
    target = df.filter(F.col("doc_id") == 777).collect()[0]["key"]
    files, total = t.lookup_files(spark, "key", target)
    assert total == 8
    assert 1 <= len(files) <= 2  # ~1e-2 fp/file at 10 bits/key
    # no false negatives: the row is found through the pruned path
    rows = t.read_point(spark, "key", target).collect()
    assert [r["doc_id"] for r in rows] == [777]


def test_point_lookup_absent_key(spark, tmp_path):
    t, _ = _indexed_table(spark, tmp_path, n=5000, files=4)
    files, total = t.lookup_files(spark, "key", "no-such-sha")
    assert total == 4 and len(files) <= 1
    assert t.read_point(spark, "key", "no-such-sha").count() == 0


def test_point_lookup_across_appends(spark, tmp_path):
    from hand_index_spark.tables.icelite import IceliteTable

    t = IceliteTable(str(tmp_path), "pt")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("k"), F.col("id")), 256).alias("key"),
    )
    t.write(mk(0, 1000).repartition(2), bloom_cols=["key"])
    t.write(mk(1000, 2000).repartition(2), bloom_cols=["key"], mode="append")
    for probe in (5, 1500):
        target = mk(0, 2000).filter(F.col("doc_id") == probe).collect()[0]["key"]
        rows = t.read_point(spark, "key", target).collect()
        assert [r["doc_id"] for r in rows] == [probe]
        files, total = t.lookup_files(spark, "key", target)
        assert total == 4 and len(files) < total


def test_missing_bloom_col_raises(spark, tmp_path):
    t, _ = _indexed_table(spark, tmp_path, n=100, files=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no bloom index"):
        t.lookup_files(spark, "doc_id", 1)
