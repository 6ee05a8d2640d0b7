"""Large-scale smoke: distributed corpus generation + engine ops at N turns.

Proves the 100-TB-shaped path: the corpus is generated ON THE EXECUTORS
(`synth_transcripts_dist`, spark.range -> mapInPandas), so driver RSS stays
flat no matter the scale — the round-2 driver-side generator peaked >3 GB
at 1M turns.

Usage: python scripts/big_smoke.py [n_conversations]   (default 1_700_000
~= 10M turns). Prints one JSON line; driver peak RSS is from getrusage.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # kB -> GB


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 1_700_000
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from nametag_spark.data.synth import synth_transcripts_dist
    from nametag_spark.ner.pipeline import recognize_df
    from nametag_spark.ops.text import tokens_col
    from nametag_spark.session import get_spark

    model_dir = entry._model_dir()
    spark = get_spark(app_name="nametag_spark_big_smoke")

    t0 = time.time()
    df = synth_transcripts_dist(spark, n_conv, seed=42)
    n_turns = df.count()
    gen_s = time.time() - t0

    # JVM-side aggregate over the full corpus (no Python workers)
    t0 = time.time()
    agg = df.agg(
        F.sum(F.size(tokens_col(F.col("text")))).alias("tokens"),
        F.countDistinct("conv_id").alias("convs"),
    ).collect()[0]
    agg_s = time.time() - t0

    # full NER over a deterministic ~2% conversation sample
    t0 = time.time()
    sample = df.where(F.crc32(F.col("conv_id")) % 50 == 0)
    n_mentions = recognize_df(sample, model_dir).count()
    n_sample = sample.count()
    ner_s = time.time() - t0

    spark.stop()
    print(
        json.dumps(
            {
                "n_conversations": n_conv,
                "n_turns": n_turns,
                "gen_seconds": round(gen_s, 1),
                "gen_turns_per_sec": round(n_turns / gen_s, 1),
                "total_tokens": int(agg["tokens"]),
                "agg_seconds": round(agg_s, 1),
                "ner_sample_turns": n_sample,
                "ner_sample_mentions": n_mentions,
                "ner_seconds": round(ner_s, 1),
                "driver_peak_rss_gb": round(rss_gb(), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
