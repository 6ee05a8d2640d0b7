"""Round-2 verdict warts: no DataFrame->RDD conversions in entry-query
plan construction, and ngram_jaccard_pairs stays lazy by default."""

import pytest
from pyspark.sql import DataFrame


@pytest.fixture()
def forbid_rdd(monkeypatch):
    """Make any .rdd access explode — planning must not convert to RDD."""

    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("DataFrame.rdd accessed during plan construction")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))


def test_recognize_tokenize_no_rdd(spark, forbid_rdd, tmp_path):
    from nametag_spark.ner.pipeline import tokenize_df

    df = spark.createDataFrame(
        [("c1", 0, "u", "Alice met Bob in Prague.", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = tokenize_df(df)
    out.explain()  # plan construction + explain must not touch .rdd
    assert out.columns


def test_simhash_minhash_no_rdd(spark, forbid_rdd):
    from nametag_spark.kg.resolution import minhash_signatures
    from nametag_spark.ops.dedup import ngram_jaccard_pairs, with_simhash

    df = spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "alpha beta delta")], "doc_id string, text string"
    )
    with_simhash(df).explain()
    minhash_signatures(df, "text", "doc_id").explain()
    # default path must be lazy: no count() job during construction either
    ngram_jaccard_pairs(df).explain()


def test_spread_small_input_behaviour(spark, tmp_path):
    from nametag_spark.ops.text import spread_small_input

    # single parquet file -> repartitioned to default parallelism
    p = str(tmp_path / "one.parquet")
    spark.createDataFrame([(i, "x") for i in range(100)], "id long, text string").coalesce(
        1
    ).write.parquet(p)
    one = spark.read.parquet(p)
    spread = spread_small_input(one)
    par = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == par  # test-side probe is fine

    # in-memory input passes through untouched (identical plan object)
    mem = spark.createDataFrame([(1, "x")], "id long, text string")
    assert spread_small_input(mem) is mem


def test_ngram_jaccard_default_matches_explicit_cap(spark):
    from nametag_spark.ops.dedup import ngram_jaccard_pairs

    rows = [(f"d{i}", "the quick brown fox jumps over the lazy dog " + ("x" if i % 2 else "y"))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    lazy_default = {tuple(r) for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    explicit = {tuple(r) for r in ngram_jaccard_pairs(df, threshold=0.5, max_df_count=100).collect()}
    assert lazy_default == explicit
    assert lazy_default  # near-dup halves must pair up


def test_spread_skips_repartitioned_and_cached(spark, tmp_path):
    """inputFiles() sees through transformations — already-repartitioned or
    cached inputs must NOT pay a second shuffle."""
    from nametag_spark.ops.text import spread_small_input

    p = str(tmp_path / "one2.parquet")
    spark.createDataFrame([(i, "x") for i in range(50)], "id long, text string").coalesce(
        1
    ).write.parquet(p)
    par = spark.sparkContext.defaultParallelism

    pre = spark.read.parquet(p).repartition(3)
    assert spread_small_input(pre) is pre  # repartitioned upstream -> untouched

    cached = spark.read.parquet(p).persist()
    try:
        assert spread_small_input(cached) is cached
    finally:
        cached.unpersist()

    bare = spark.read.parquet(p)
    assert spread_small_input(bare) is not bare  # bare 1-file scan -> spread
    assert spread_small_input(bare).rdd.getNumPartitions() == par
