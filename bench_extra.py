"""Extra measurement harness for the optimization rounds (bench.py is FROZEN
for the driver's measurement, so all ad-hoc instrumentation lives here).

Subcommands:
  plans <suffix>    dump .explain("formatted") for every headline query to
                    plans/r08/<query>_<suffix>.txt
  isolate           per-query noop-sink timing (guide §1.4) with job labels
  kgphases          per-phase wall times of the kg pipeline (ner / lsh /
                    cc / assign+triples) with job descriptions

Shares bench.py's corpus/model/conventions exactly (same sf dir, same query
parameters) so numbers are comparable with the frozen harness.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness, imported for shared helpers)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _setup():
    from nametag_spark.data.synth import synth_transcripts

    import __spark_entry__ as entry

    sf = bench.sf_of(SF_DIR)
    model_dir = entry._model_dir()
    n_conv = max(100, int(8000 * sf))
    transcripts_pdf, _ = synth_transcripts(n_conversations=n_conv, seed=42)
    corpus_path = bench.corpus_parquet(transcripts_pdf, sf, 42)
    spark = bench.make_spark(CPUS)
    transcripts = spark.read.parquet(corpus_path).repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    transcripts.count()
    return spark, transcripts, model_dir, sf


def _headline_queries(spark, transcripts, model_dir):
    """name -> lazily-built DataFrame, mirroring bench.bench_queries."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from nametag_spark.kg.resolution import resolve_entities
    from nametag_spark.kg.triples import extract_triples
    from nametag_spark.ner.pipeline import recognize_df, tokenize_df
    from nametag_spark.ops.dedup import minhash_dup_pairs, with_simhash
    from nametag_spark.ops.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def kg():
        mentions = recognize_df(transcripts, model_dir)
        me, _ = resolve_entities(mentions)
        return extract_triples(me, transcripts)

    return {
        "ner_tokenize": lambda: tokenize_df(transcripts),
        "ner_recognize": lambda: recognize_df(transcripts, model_dir),
        "kg_triples_e2e": kg,
        "minhash_lsh_dedup": lambda: minhash_dup_pairs(
            docs, n_hashes=12, bands=4, shingle_k=5, threshold=0.7
        ),
        "simhash": lambda: with_simhash(docs, bits=32),
        "exact_dedup": lambda: entry.q_exact_dedup(spark, SF_DIR),
        "quality_score": lambda: entry.q_quality_score(spark, SF_DIR),
        "cosine_topk": lambda: cosine_topk(emb, queries, k=10),
        "pricing_summary": lambda: entry.q_pricing_summary(spark, SF_DIR),
        "top_orders_per_customer": lambda: entry.q_top_orders_per_customer(spark, SF_DIR),
        "events_turn_order": lambda: entry.q_events_turn_order(spark, SF_DIR),
    }


def cmd_plans(suffix: str) -> None:
    spark, transcripts, model_dir, _sf = _setup()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    os.makedirs(outdir, exist_ok=True)
    from nametag_spark.kg.resolution import release_persisted

    for name, build in _headline_queries(spark, transcripts, model_dir).items():
        df = build()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        log(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        release_persisted()
        spark.catalog.clearCache()
        transcripts.persist()
    spark.stop()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_isolate(reps: int = 3) -> None:
    spark, transcripts, model_dir, _sf = _setup()
    from nametag_spark.kg.resolution import release_persisted
    from nametag_spark.ner.pipeline import tokenize_df

    tokenize_df(transcripts.limit(256)).count()  # worker warm-up
    qs = _headline_queries(spark, transcripts, model_dir)
    results = {}
    for name, build in qs.items():
        ts = []
        for i in range(reps):
            release_persisted()
            spark.catalog.clearCache()
            transcripts.persist()
            transcripts.count()
            spark.sparkContext.setJobDescription(f"isolate:{name}#{i}")
            t0 = time.time()
            _noop(build())
            ts.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        ts.sort()
        results[name] = ts
        log(f"  {name}: noop median {ts[len(ts)//2]:.2f}s  all={['%.2f' % t for t in ts]}")
    print({k: round(v[len(v) // 2], 3) for k, v in results.items()})
    spark.stop()


def cmd_kgphases(reps: int = 2) -> None:
    spark, transcripts, model_dir, _sf = _setup()
    from pyspark.sql import functions as F

    from nametag_spark.kg.resolution import (
        LAST_CC_INFO,
        canonicalize_mentions,
        connected_components,
        lsh_similarity_edges,
        release_persisted,
        resolve_entities,
    )
    from nametag_spark.kg.triples import extract_triples
    from nametag_spark.ner.pipeline import recognize_df, tokenize_df

    tokenize_df(transcripts.limit(256)).count()  # worker warm-up
    for rep in range(reps):
        release_persisted()
        spark.catalog.clearCache()
        transcripts.persist()
        transcripts.count()

        t0 = time.time()
        spark.sparkContext.setJobDescription("kg:ner+canonicalize")
        m = canonicalize_mentions(recognize_df(transcripts, model_dir)).where(
            F.length("norm") > 0
        ).persist()
        m.count()
        t1 = time.time()

        spark.sparkContext.setJobDescription("kg:surfaces+lsh-edges")
        surfaces = m.groupBy("type", "norm").agg(F.count(F.lit(1)).alias("n_mentions")).persist()
        from nametag_spark.kg.resolution import _hash64

        surfaces = surfaces.withColumn("sid", _hash64(F.concat_ws("\t", "type", "norm"), 0))
        edges = lsh_similarity_edges(
            surfaces.select("sid", "type", "norm"), "norm", "sid",
            n_hashes=12, bands=4, k=3, threshold=0.6, max_bucket=200, block_col="type",
        ).persist()
        n_edges = edges.count()
        t2 = time.time()

        spark.sparkContext.setJobDescription("kg:connected-components")
        comp = connected_components(edges)
        t3 = time.time()

        spark.sparkContext.setJobDescription("kg:assign+entities+triples")
        assign = surfaces.join(comp, surfaces["sid"] == comp["node"], "left").select(
            surfaces["type"], surfaces["norm"], surfaces["n_mentions"], surfaces["sid"],
            F.coalesce(comp["component"], surfaces["sid"]).alias("entity_id"),
        )
        me = m.join(assign.select("type", "norm", "entity_id"), ["type", "norm"], "left")
        n_triples = extract_triples(me, transcripts).count()
        t4 = time.time()
        spark.sparkContext.setJobDescription(None)

        log(
            f"rep{rep}: ner {t1-t0:.2f}s  lsh {t2-t1:.2f}s ({n_edges} edges)  "
            f"cc {t3-t2:.2f}s (tier {LAST_CC_INFO.get('tier')})  "
            f"assign+triples {t4-t3:.2f}s ({n_triples} triples)  total {t4-t0:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "isolate"
    if cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "isolate":
        cmd_isolate()
    elif cmd == "kgphases":
        cmd_kgphases()
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
