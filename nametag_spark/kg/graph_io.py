"""Graph materialization with per-stage lineage manifests and exact resume.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Each pipeline stage writes:

  out_dir/<stage>/                      partitioned parquet
  out_dir/<stage>/_lineage.json         stage manifest: config fingerprint,
                                        input fingerprint, row count,
                                        per-partition row counters

A stage re-runs only when its fingerprint (config + upstream fingerprint)
changes; otherwise the parquet is reused as-is (exact resume — contents are
deterministic given the fingerprint).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fingerprint(obj) -> str:
    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def stage_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"{stage}._lineage.json")


def read_manifest(out_dir: str, stage: str):
    p = _manifest_path(out_dir, stage)
    if os.path.exists(p):
        with open(p, encoding="utf-8") as f:
            return json.load(f)
    return None


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    fingerprint: str,
    partition_by: list | None = None,
) -> dict:
    """Write a stage's parquet + lineage manifest; returns the manifest."""
    path = stage_path(out_dir, stage)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    back = df.sparkSession.read.parquet(path)
    per_part = (
        back.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .orderBy("partition")
        .collect()
    )
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": int(sum(r["count"] for r in per_part)),
        "partitions": [{"partition": int(r["partition"]), "rows": int(r["count"])} for r in per_part],
        "written_at": time.time(),
        "schema": back.schema.jsonValue(),
    }
    with open(_manifest_path(out_dir, stage), "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    return manifest


def run_stage(
    spark: SparkSession,
    out_dir: str,
    stage: str,
    fingerprint_inputs: dict,
    build,
    partition_by: list | None = None,
):
    """Run or resume a stage.

    build: () -> DataFrame, invoked only on cache miss.
    Returns (df, manifest, resumed: bool).
    """
    os.makedirs(out_dir, exist_ok=True)
    fp = _fingerprint(fingerprint_inputs)
    manifest = read_manifest(out_dir, stage)
    path = stage_path(out_dir, stage)
    if manifest and manifest.get("fingerprint") == fp and os.path.exists(path):
        return spark.read.parquet(path), manifest, True
    df = build()
    manifest = write_stage(df, out_dir, stage, fp, partition_by)
    return spark.read.parquet(path), manifest, False


def append_mentions(
    spark: SparkSession,
    new_transcripts: DataFrame,
    model_dir: str,
    out_dir: str,
    batch_id: str,
) -> dict:
    """Incremental ingest: NER over ONLY the new turns, appended to the
    mention store partitioned by ingest batch. The expensive stage (NER)
    never recomputes old data; downstream stages (resolution, triples) are
    rebuilt from the full cached mention table by build_knowledge_graph
    (global entity resolution cannot be incrementally patched without
    changing its semantics — rebuilding from cached mentions is the honest
    standard pattern).

    Idempotent per batch_id: re-appending an already-ingested batch is a
    no-op (recorded in the batches manifest).
    """
    import glob

    from ..ner.pipeline import recognize_df

    os.makedirs(out_dir, exist_ok=True)
    path = stage_path(out_dir, "mentions_incremental")
    manifest_path = os.path.join(out_dir, "mentions_incremental._batches.json")
    batches = {}
    if os.path.exists(manifest_path):
        with open(manifest_path, encoding="utf-8") as f:
            batches = json.load(f)
    if batch_id in batches:
        return {"batch_id": batch_id, "rows": batches[batch_id]["rows"], "appended": False}

    mentions = recognize_df(new_transcripts, model_dir).withColumn(
        "ingest_batch", F.lit(batch_id)
    )
    mentions.write.mode("append").partitionBy("ingest_batch").parquet(path)
    rows = spark.read.parquet(path).where(F.col("ingest_batch") == batch_id).count()
    batches[batch_id] = {"rows": int(rows), "written_at": time.time()}
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(batches, f)
    # existence of new mentions invalidates the downstream fingerprint chain
    return {"batch_id": batch_id, "rows": int(rows), "appended": True}


def read_incremental_mentions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(stage_path(out_dir, "mentions_incremental"))


def incremental_batches_fingerprint(out_dir: str) -> str:
    manifest_path = os.path.join(out_dir, "mentions_incremental._batches.json")
    if not os.path.exists(manifest_path):
        return "none"
    with open(manifest_path, encoding="utf-8") as f:
        return _fingerprint(json.load(f))


def build_knowledge_graph(
    spark: SparkSession,
    transcripts: DataFrame | None,
    model_dir: str,
    out_dir: str,
    config: dict | None = None,
    incremental: bool = False,
) -> dict:
    """Full pipeline: transcripts -> mentions -> entities -> triples,
    each stage checkpointed with lineage for exact resume.

    incremental=True reads the append-only mention store maintained by
    append_mentions() instead of recomputing NER; downstream stages rebuild
    whenever the ingested-batch set changed (their fingerprints chain off
    it) and resume otherwise.

    Returns {"mentions": df, "entities": df, "triples": df, "manifests": [...],
    "resumed": [...]}.
    """
    from ..ner.pipeline import recognize_df
    from .resolution import resolve_entities
    from .triples import extract_triples

    config = dict(config or {})
    base_fp = {"model_dir": model_dir, "config": config}

    manifests = []
    resumed = []

    if incremental:
        mentions = read_incremental_mentions(spark, out_dir).drop("ingest_batch")
        m1 = {"stage": "mentions_incremental", "fingerprint": incremental_batches_fingerprint(out_dir)}
        r1 = True
    else:
        mentions, m1, r1 = run_stage(
            spark,
            out_dir,
            "mentions",
            {**base_fp, "stage": "mentions"},
            lambda: recognize_df(transcripts, model_dir),
        )
    manifests.append(m1)
    resumed.append(r1)

    def build_entities():
        me, ents = resolve_entities(mentions, **config.get("resolution", {}))
        ents_path_df = me  # mention->entity assignment is stage output
        return ents_path_df

    mention_entities, m2, r2 = run_stage(
        spark,
        out_dir,
        "mention_entities",
        {**base_fp, "stage": "mention_entities", "upstream": m1["fingerprint"]},
        build_entities,
    )
    manifests.append(m2)
    resumed.append(r2)

    def build_entity_table():
        surf = mention_entities.groupBy("entity_id", "type", "norm").agg(
            F.count(F.lit(1)).alias("n_mentions")
        )
        # single min_by agg (no window): highest n_mentions, ties lexical asc
        return surf.groupBy("entity_id").agg(
            F.min_by(
                F.struct(F.col("norm"), F.col("type")),
                F.struct((-F.col("n_mentions")).alias("_negn"), F.col("norm").alias("_n")),
            ).alias("_c"),
            F.sum("n_mentions").alias("n_mentions"),
            F.count(F.lit(1)).alias("n_surfaces"),
        ).select(
            "entity_id",
            F.col("_c.norm").alias("canonical"),
            F.col("_c.type").alias("type"),
            "n_mentions",
            "n_surfaces",
        )

    entities, m3, r3 = run_stage(
        spark,
        out_dir,
        "entities",
        {**base_fp, "stage": "entities", "upstream": m2["fingerprint"]},
        build_entity_table,
    )
    manifests.append(m3)
    resumed.append(r3)

    triples, m4, r4 = run_stage(
        spark,
        out_dir,
        "triples",
        {**base_fp, "stage": "triples", "upstream": m2["fingerprint"]},
        lambda: extract_triples(mention_entities, transcripts),
        partition_by=["pred"],
    )
    manifests.append(m4)
    resumed.append(r4)

    return {
        "mentions": mentions,
        "mention_entities": mention_entities,
        "entities": entities,
        "triples": triples,
        "manifests": manifests,
        "resumed": resumed,
    }
