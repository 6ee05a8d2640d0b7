"""Bucketed co-located joins + per-turn text equality under stable ordering."""

import pandas as pd
from pyspark.sql import Window, functions as F


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Both sides bucketed+sorted on the key -> sort-merge join without any
    Exchange (the write-once-join-many pattern for entity-id joins)."""
    from nametag_spark.kg.bucketing import bucketed_join_is_shuffle_free, write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    left = spark.range(0, 10000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 7).alias("x")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 3).alias("y")
    )
    write_bucketed(left, "b_left", "entity_id", n_buckets=8)
    write_bucketed(right, "b_right", "entity_id", n_buckets=8)

    # disable auto-broadcast so the join strategy is SMJ, then check no shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucketed_join_is_shuffle_free(spark, "b_left", "b_right", "entity_id")
        n = spark.table("b_left").join(spark.table("b_right"), "entity_id").count()
        assert n == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_per_turn_text_equality_under_stable_ordering(spark):
    """North-rule invariant: reconstructing each turn from its token table
    (ordered by the stable (conv_id, turn_idx) window) reproduces the text
    whitespace-insensitively, and token char spans slice exactly."""
    from nametag_spark.data.synth import synth_transcripts
    from nametag_spark.ner.pipeline import tokenize_df

    tdf, _ = synth_transcripts(n_conversations=10, seed=23)
    sdf = spark.createDataFrame(tdf)

    # stable turn ordering (Window over conv_id, turn_idx)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ordered = sdf.withColumn("turn_rank", F.row_number().over(w))
    ranks = ordered.select("conv_id", "turn_idx", "turn_rank").toPandas()
    assert (ranks["turn_rank"] == ranks["turn_idx"] + 1).all()

    tokens = tokenize_df(sdf)
    joined = (
        tokens.join(sdf.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
        .withColumn("sliced", F.expr("substring(text, start + 1, length)"))
    )
    mismatch = joined.where(F.col("sliced") != F.col("form")).count()
    assert mismatch == 0

    recon = (
        tokens.orderBy("conv_id", "turn_idx", "sent_idx", "tok_idx")
        .groupBy("conv_id", "turn_idx")
        .agg(F.concat_ws(" ", F.collect_list("form")).alias("recon"))
        .toPandas()
    )
    orig = {(r.conv_id, r.turn_idx): r.text for r in tdf.itertuples(index=False)}
    for r in recon.itertuples(index=False):
        assert r.recon == orig[(r.conv_id, r.turn_idx)]


def test_pii_flags_unit(spark):
    from nametag_spark.ops.text import with_pii_flags

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["mail a@b.co now", "all clean here"]})
    )
    out = {r["doc_id"]: (r["n_email"], r["has_pii"]) for r in with_pii_flags(df).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
