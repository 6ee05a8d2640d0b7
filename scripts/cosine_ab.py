"""Interleaved A/B of cosine_topk formulations (bench shape: .count()).

A = current (Arrow mapInPandas numpy kernel + tiny final window),
B = pre-r8 plan: broadcast cross join, JVM higher-order-function dot/norm,
full window rank. Checks result identity (rank, vec_id per query) first.

Usage: python scripts/cosine_ab.py [emb_parquet] [cores] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/embeddings.parquet"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import Window, functions as F

    from nametag_spark.ops.similarity import _as_double, _dot, _norm, cosine_topk
    from nametag_spark.session import get_spark

    spark = get_spark(app_name="cosine_ab", master=f"local[{cores}]", shuffle_partitions=cores)
    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def old_cosine_topk(corpus, qs, k=10):
        q = qs.select(F.col("query_id"), _as_double(F.col("embedding")).alias("qv"))
        c = corpus.select(F.col("vec_id"), _as_double(F.col("embedding")).alias("cv"))
        scored = c.crossJoin(F.broadcast(q)).withColumn(
            "cosine", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
        )

    def key(df):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cosine"]) for r in df.collect()
        )

    a_rows = key(cosine_topk(emb, queries, k=10))
    b_rows = key(old_cosine_topk(emb, queries, k=10))
    assert a_rows == b_rows, "parity mismatch"

    def run_a():
        return cosine_topk(emb, queries, k=10).count()

    def run_b():
        return old_cosine_topk(emb, queries, k=10).count()

    ta, tb = [], []
    for _ in range(reps):
        spark.sparkContext.setJobDescription("cosine:A-arrow")
        t0 = time.time(); run_a(); ta.append(time.time() - t0)
        spark.sparkContext.setJobDescription("cosine:B-jvm-cross")
        t0 = time.time(); run_b(); tb.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "path": path, "cores": cores,
        "a_arrow": [round(t, 3) for t in sorted(ta)],
        "b_jvm": [round(t, 3) for t in sorted(tb)],
        "a_med": round(sorted(ta)[len(ta) // 2], 3),
        "b_med": round(sorted(tb)[len(tb) // 2], 3),
        "rows": len(a_rows),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
