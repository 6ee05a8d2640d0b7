"""Per-stage timing of resolve_entities' internals at smoke scale.

The smoke's `resolve` segment is one number; this splits it at every
materialization boundary so the superlinear component (if any) is
attributable: bucket build, verify join, CC contraction, driver
union-find, assignment join-back.

Usage: python scripts/resolve_breakdown.py [n_conversations] [cores] [vocab_scale]
Reuses the smoke's cached corpus parquet. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    vocab_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from nametag_spark.kg import resolution as R
    from nametag_spark.ner.pipeline import recognize_df
    from nametag_spark.session import get_spark

    corpus_path = f"/tmp/nametag_spark_bench/kg_full_smoke_{n_conv}_v{vocab_scale}.parquet"
    if not os.path.exists(corpus_path):
        from nametag_spark.data.synth import synth_transcripts_dist

        spark = get_spark(app_name="resolve_breakdown_gen")
        synth_transcripts_dist(spark, n_conv, seed=42, vocab_scale=vocab_scale).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        spark.stop()

    spark = get_spark(
        app_name=f"resolve_breakdown_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SMOKE_SHUFFLE", cores * 2)),
    )
    model_dir = entry._model_dir()
    df = spark.read.parquet(corpus_path).repartition(cores * 4).persist()
    df.count()
    out = {"n_conversations": n_conv, "cores": cores, "vocab_scale": vocab_scale}
    t = {}

    t0 = time.time()
    mentions = recognize_df(df, model_dir).persist()
    out["n_mentions"] = mentions.count()
    t["ner"] = round(time.time() - t0, 1)

    # ---- resolve internals, mirroring resolve_entities step by step ----
    t0 = time.time()
    m = R.canonicalize_mentions(mentions).where(F.length("norm") > 0).persist()
    surfaces = m.groupBy("type", "norm").agg(F.count(F.lit(1)).alias("n_mentions")).persist()
    out["n_surfaces"] = surfaces.count()
    t["surface_agg"] = round(time.time() - t0, 1)
    surfaces = surfaces.withColumn("sid", R._hash64(F.concat_ws("\t", "type", "norm"), 0))

    t0 = time.time()
    edges = R.lsh_similarity_edges(
        surfaces.select("sid", "type", "norm"), "norm", "sid",
        n_hashes=12, bands=4, k=3, threshold=0.6, max_bucket=200, block_col="type",
    )
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).where(
        F.col("src") != F.col("dst")
    )
    e = e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")).distinct()
    e = e.persist()
    out["n_edges"] = e.count()
    t["lsh_verify_edges"] = round(time.time() - t0, 1)

    # mirror connected_components' driver finish: Arrow-collect the raw
    # pairs (<= contracted_driver_threshold) + vectorized min-label UF
    t0 = time.time()
    pdf = e.toPandas()
    t["cc_topandas"] = round(time.time() - t0, 1)
    t0 = time.time()
    nodes, labels = R._numpy_components(pdf["src"].to_numpy(), pdf["dst"].to_numpy())
    comp_rows = list(zip(nodes.tolist(), labels.tolist()))
    t["cc_numpy_unionfind"] = round(time.time() - t0, 1)
    import pandas as pd

    comp = spark.createDataFrame(
        pd.DataFrame(comp_rows, columns=["node", "component"]).astype("int64")
    )

    t0 = time.time()
    assign = surfaces.join(comp, surfaces["sid"] == comp["node"], "left").select(
        surfaces["type"], surfaces["norm"], surfaces["n_mentions"], surfaces["sid"],
        F.coalesce(comp["component"], surfaces["sid"]).alias("entity_id"),
    )
    me = m.join(assign.select("type", "norm", "entity_id"), ["type", "norm"], "left").persist()
    out["n_me"] = me.count()
    t["assign_joinback"] = round(time.time() - t0, 1)

    t["resolve_total"] = round(sum(v for k, v in t.items() if k != "ner"), 1)
    out["seconds"] = t
    out["resolve_core_ms_per_surface"] = round(
        t["resolve_total"] * cores * 1000.0 / max(out["n_surfaces"], 1), 2
    )
    R.release_persisted()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
