"""Triple extraction: (subj, pred, obj) from co-occurring canonical entities.

North-rule component (no reference analogue). Pure DataFrame work:
mentions joined to themselves within a sentence window; predicates derived
from the entity-type pair plus the turn's role/tool context; aggregation
collects provenance (SURVEY.md §2.8 "Triple aggregation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# type-pair -> base predicate (subject type, object type)
PREDICATE_RULES = [
    ("PER", "ORG", "affiliated_with"),
    ("PER", "LOC", "located_in"),
    ("ORG", "LOC", "located_in"),
    ("PER", "PER", "associated_with"),
    ("PER", "EMAIL", "has_email"),
    ("PER", "URL", "has_url"),
    ("ORG", "URL", "has_url"),
    ("ORG", "EMAIL", "has_email"),
    ("PER", "TIME", "active_at"),
    ("ORG", "TIME", "active_at"),
]


def triple_evidence(
    mention_entities: DataFrame,
    transcripts: DataFrame | None = None,
    window: str = "sentence",
    id_cols: tuple = ("entity_id",),
) -> DataFrame:
    """Pre-aggregation triple evidence: one row per co-occurring mention
    pair with its predicate and provenance. The streaming path appends these
    rows per micro-batch (no global state needed) and aggregates at
    compaction; the batch path feeds them straight into aggregate_triples.

    id_cols: columns carried from each mention side as subj/obj identity —
    ('entity_id',) after resolution, or none (surface-only evidence) when
    resolution is deferred to compaction."""
    keys = ["conv_id", "turn_idx"] + (["sent_idx"] if window == "sentence" else [])

    sel = [*keys, "tok_start", "type", "norm", *[c for c in id_cols if c]]
    m = mention_entities.select(*sel)
    # one explicit hash partition on (conv_id, turn_idx) serves BOTH joins:
    # it satisfies the self-join's (conv, turn[, sent]) clustering (subset
    # partitioning co-locates equal keys) AND leaves the pair output
    # partitioned for the transcript-context join below, removing that
    # join's re-exchange of the pair set. Being user-specified it also
    # pins the pair-generation stage at full parallelism — AQE coalesces
    # planner exchanges by byte size, and mention rows are tiny relative
    # to the join's CPU (measured 10 CPU-seconds in this stage at sf0.1).
    spark = mention_entities.sparkSession
    n_part = int(spark.conf.get("spark.nametag.triples.pairPartitions", "0") or 0)
    if n_part <= 0:
        n_part = spark.sparkContext.defaultParallelism
    m = m.repartition(n_part, "conv_id", "turn_idx")

    rules = m.sparkSession.createDataFrame(
        PREDICATE_RULES, ["subj_type", "obj_type", "pred"]
    )

    left = m.alias("l")
    right = m.alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    # subject precedes object in the sentence; self-pairs excluded
    cond.append(F.col("l.tok_start") < F.col("r.tok_start"))
    if "entity_id" in id_cols:
        cond.append(F.col("l.entity_id") != F.col("r.entity_id"))
    else:
        cond.append(
            (F.col("l.type") != F.col("r.type")) | (F.col("l.norm") != F.col("r.norm"))
        )

    cols = [
        F.col("l.conv_id").alias("conv_id"),
        F.col("l.turn_idx").alias("turn_idx"),
        F.col("l.type").alias("subj_type"),
        F.col("r.type").alias("obj_type"),
        F.col("l.norm").alias("subj_norm"),
        F.col("r.norm").alias("obj_norm"),
    ]
    if "entity_id" in id_cols:
        cols += [F.col("l.entity_id").alias("subj"), F.col("r.entity_id").alias("obj")]
    pairs = left.join(right, cond).select(*cols)

    # predicate rules are a tiny dimension -> broadcast hash join
    triples = pairs.join(F.broadcast(rules), ["subj_type", "obj_type"])

    if transcripts is not None:
        ctx = transcripts.select("conv_id", "turn_idx", "role", "tool")
        triples = triples.join(ctx, ["conv_id", "turn_idx"], "left").withColumn(
            "pred",
            F.when(
                (F.col("role") == "tool") & (F.length("tool") > 0),
                F.concat_ws("_", F.col("pred"), F.lit("via"), F.col("tool")),
            ).otherwise(F.col("pred")),
        ).drop("role", "tool")

    return triples.withColumn("evidence", F.concat_ws(":", "conv_id", "turn_idx"))


def extract_triples(
    mention_entities: DataFrame,
    transcripts: DataFrame | None = None,
    window: str = "sentence",
    evidence_cap: int | None = 1000,
) -> DataFrame:
    """mention_entities: output of resolve_entities()[0] — mentions with
    (conv_id, turn_idx, sent_idx, tok_start, type, norm, entity_id).

    window: 'sentence' pairs mentions within the same sentence; 'turn'
    within the same turn.

    Returns (subj, pred, obj, subj_type, obj_type, n_evidence, evidence)
    where subj/obj are canonical entity ids and evidence is a deduplicated
    list of "conv_id:turn_idx" provenance strings.
    """
    triples = triple_evidence(mention_entities, transcripts, window)
    return aggregate_triples(triples, evidence_cap)


def aggregate_triples(triples: DataFrame, evidence_cap: int | None = 1000) -> DataFrame:
    """Evidence rows -> aggregated triple table (used by the batch path and
    by the streaming compaction over accumulated evidence)."""
    # One fused salted two-phase aggregation carries the head attributes,
    # the co-occurrence count, AND the provenance list (previously a head
    # groupBy + a separate salted agg + a join — two full shuffles over the
    # same pair set). Phase 1 pre-aggregates on (key, salt) so a hub triple
    # (a hot (subj, pred, obj) across millions of turns) cannot overload a
    # single reducer partition (north-rule skew handling; AQE can't split a
    # collect_list group). All head attributes use min(): deterministic
    # (unlike first()), so the output is hash-stable run to run. subj/obj
    # types are constant per entity (resolution is typed), and the norm is
    # the lexicographically-smallest mention surface of the entity.
    from .skew import add_salt

    keyed = triples.select(
        "subj", "pred", "obj", "subj_type", "obj_type", "subj_norm", "obj_norm", "evidence"
    )
    salted = add_salt(keyed, n_salts=16)
    phase1 = salted.groupBy("subj", "pred", "obj", "_salt").agg(
        F.min("subj_type").alias("subj_type"),
        F.min("obj_type").alias("obj_type"),
        F.min("subj_norm").alias("subj_norm"),
        F.min("obj_norm").alias("obj_norm"),
        F.count(F.lit(1)).alias("_cnt"),
        F.array_distinct(F.collect_list("evidence")).alias("_vals"),
    )
    merged = phase1.groupBy("subj", "pred", "obj").agg(
        F.min("subj_type").alias("subj_type"),
        F.min("obj_type").alias("obj_type"),
        F.min("subj_norm").alias("subj_norm"),
        F.min("obj_norm").alias("obj_norm"),
        F.sum("_cnt").alias("n_cooccur"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_vals")))).alias("_all"),
    )
    ev = F.col("_all") if evidence_cap is None else F.slice("_all", 1, evidence_cap)
    return merged.select(
        "subj",
        "pred",
        "obj",
        "subj_type",
        "obj_type",
        "subj_norm",
        "obj_norm",
        F.size("_all").alias("n_evidence"),
        ev.alias("evidence"),
        "n_cooccur",
    )
