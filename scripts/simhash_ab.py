"""Interleaved A/B of with_simhash formulations (bench query shape:
agg(sum(simhash)).collect()).

A = current (per-row aggregate fold), B = explode -> groupBy -> join-back
(the pre-r8 plan, reproduced verbatim). Run ABAB... so window drift hits
both arms equally. Prints one JSON line.

Usage: python scripts/simhash_ab.py [docs_parquet] [cores] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/documents.parquet"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from nametag_spark.ops.dedup import with_simhash
    from nametag_spark.ops.text import hash64, spread_small_input, tokens_col
    from nametag_spark.session import get_spark

    spark = get_spark(app_name="simhash_ab", master=f"local[{cores}]", shuffle_partitions=cores)
    docs = spark.read.parquet(path)

    def old_simhash(df, bits=32):
        df = spread_small_input(df)
        toks = df.select(
            F.col("doc_id"), F.explode(tokens_col(F.lower(F.col("text")))).alias("_t")
        ).withColumn("_h", hash64(F.col("_t"), 1))
        aggs = [
            F.sum(F.shiftright("_h", i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1).alias(f"_b{i}")
            for i in range(bits)
        ]
        bal = toks.groupBy("doc_id").agg(*aggs)
        sig = None
        for i in range(bits):
            term = F.when(F.col(f"_b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sig = term if sig is None else sig + term
        packed = bal.select(F.col("doc_id").alias("_sid"), sig.alias("simhash"))
        return (
            df.join(packed, df["doc_id"] == packed["_sid"], "left")
            .drop("_sid")
            .fillna({"simhash": 0})
        )

    def run_a():
        return with_simhash(docs, bits=32).agg(F.sum("simhash")).collect()[0][0]

    def run_b():
        return old_simhash(docs, bits=32).agg(F.sum("simhash")).collect()[0][0]

    # warm both plans (codegen compile) before timing
    va, vb = run_a(), run_b()
    assert va == vb, f"parity: {va} != {vb}"

    ta, tb = [], []
    for _ in range(reps):
        spark.sparkContext.setJobDescription("simhash:A-fold")
        t0 = time.time(); run_a(); ta.append(time.time() - t0)
        spark.sparkContext.setJobDescription("simhash:B-explode")
        t0 = time.time(); run_b(); tb.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    out = {
        "path": path,
        "cores": cores,
        "a_fold": [round(t, 3) for t in sorted(ta)],
        "b_explode": [round(t, 3) for t in sorted(tb)],
        "a_med": round(sorted(ta)[len(ta) // 2], 3),
        "b_med": round(sorted(tb)[len(tb) // 2], 3),
        "checksum": va,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
