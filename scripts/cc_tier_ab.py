"""Interleaved A/B of the connected-components driver tiers at real scale:
collect (driver-numpy) vs streaming, inside ONE process and window, ABBA
order — the repo's standard for any perf claim (the host's available
throughput swings ~1.9x across hours, so cross-window comparisons with
stage controls are weaker evidence).

The NER stage runs ONCE: mentions materialize to parquet and every rep
re-reads them, so each timed region is exactly resolve_entities (LSH +
verify + CC + joins) with the cache cleared between reps. Output equality
(entity/assignment counts + canonical checksum) is asserted across tiers.

Usage: python scripts/cc_tier_ab.py [n_conversations] [vocab_scale] [reps]
       (defaults 400000 30 2; requires the kg_full_smoke corpus parquet,
        generated on first use)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    vocab_scale = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from nametag_spark.data.synth import synth_transcripts_dist
    from nametag_spark.kg.resolution import (
        LAST_CC_INFO,
        release_persisted,
        resolve_entities,
    )
    from nametag_spark.ner.pipeline import recognize_df
    from nametag_spark.session import get_spark

    model_dir = entry._model_dir()
    corpus_path = f"/tmp/nametag_spark_bench/kg_full_smoke_{n_conv}_v{vocab_scale}.parquet"
    mentions_path = f"/tmp/nametag_spark_bench/cc_ab_mentions_{n_conv}_v{vocab_scale}.parquet"

    spark = get_spark(
        app_name="cc_tier_ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SMOKE_SHUFFLE", "256")),
    )
    if not os.path.exists(corpus_path):
        synth_transcripts_dist(spark, n_conv, seed=42, vocab_scale=vocab_scale).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    if not os.path.exists(mentions_path):
        df = spark.read.parquet(corpus_path)
        recognize_df(df, model_dir).write.mode("overwrite").parquet(mentions_path)

    tiers = {
        # 12.3M edges at the default scale: comfortably under the collect
        # cap for one arm, forced past it (but node-cap eligible) for the
        # other
        "collect": {"spark.nametag.cc.driverEdgeCap": "64000000"},
        "streaming": {"spark.nametag.cc.driverEdgeCap": "1"},
    }
    results: dict = {t: [] for t in tiers}
    checks: dict = {}
    # ABBA: collect, streaming, streaming, collect, ... balances a
    # monotonically drifting window across the two arms
    order = []
    for r in range(reps):
        order += ["collect", "streaming"] if r % 2 == 0 else ["streaming", "collect"]
    for tier in order:
        spark.catalog.clearCache()
        for k, v in tiers[tier].items():
            spark.conf.set(k, v)
        try:
            m = spark.read.parquet(mentions_path)
            t0 = time.time()
            me, ents = resolve_entities(m)
            agg = me.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("norm", "entity_id").cast("long")).alias("chk"),
            ).collect()[0]
            n_entities = ents.count()
            dt = time.time() - t0
        finally:
            for k in tiers[tier]:
                spark.conf.unset(k)
        release_persisted()
        info = dict(LAST_CC_INFO)
        # each arm must actually exercise its intended tier — if the corpus
        # outgrows the 64M-edge collect cap both arms would silently run
        # streaming and the comparison would be meaningless (r7 advisor)
        expected = {"collect": "driver-numpy", "streaming": "driver-streaming"}[tier]
        assert info.get("tier") == expected, (
            f"{tier} arm took CC tier {info.get('tier')!r}, expected {expected!r} "
            f"({info.get('n_edges')} edges vs cap {info.get('edge_cap')})"
        )
        results[tier].append(round(dt, 1))
        key = (int(agg["n"]), int(agg["chk"]), int(n_entities))
        checks.setdefault(tier, key)
        assert checks[tier] == key, f"{tier} output changed between reps"
        print(
            f"{tier}: resolve {dt:.1f}s (cc {info.get('tier')}, "
            f"{info.get('n_edges')} edges) entities {n_entities}",
            file=sys.stderr,
            flush=True,
        )
    assert len(set(checks.values())) == 1, f"tier outputs differ: {checks}"
    out = {
        "n_conversations": n_conv,
        "vocab_scale": vocab_scale,
        "order": order,
        "resolve_seconds": results,
        "best": {t: min(v) for t, v in results.items()},
        "outputs_identical": True,
        "n_entities": checks["collect"][2],
        "cc_edges": LAST_CC_INFO.get("n_edges"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
