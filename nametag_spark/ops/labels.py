"""Label-scheme conversion as a windowed DataFrame op.

BIO -> BILOU conversion per the reference trainer
(/root/reference/src/ner/bilou_ner_trainer.cpp:101-111), expressed
relationally with lag/lead over (sentence, token order) — the vectorized
shift/compare form of the same logic used row-wise in train.trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bio_to_bilou_df(
    df: DataFrame,
    sent_col: str = "sent_id",
    order_col: str = "tok_idx",
    label_col: str = "label",
) -> DataFrame:
    """Adds `bilou` (one of B,I,L,O,U) and `entity` (type or NULL).

    has_prev: label starts with I- and the previous label carries the same
    '-TYPE' tail; has_next: next label exists, does not start with B, and
    carries the same tail (exact reference comparison semantics).
    """
    w = Window.partitionBy(sent_col).orderBy(order_col)
    lab = F.col(label_col)
    prev = F.lag(label_col).over(w)
    nxt = F.lead(label_col).over(w)
    tail = F.substring(lab, 2, 1000000)  # label[1:] — '-TYPE'
    is_o = lab.isin("O", "_")
    has_prev = (F.substring(lab, 1, 1) == "I") & prev.isNotNull() & (F.substring(prev, 2, 1000000) == tail)
    has_next = nxt.isNotNull() & (F.substring(nxt, 1, 1) != "B") & (F.substring(nxt, 2, 1000000) == tail)
    bilou = (
        F.when(is_o, F.lit("O"))
        .when(~has_prev & ~has_next, F.lit("U"))
        .when(~has_prev & has_next, F.lit("B"))
        .when(has_prev & has_next, F.lit("I"))
        .otherwise(F.lit("L"))
    )
    entity = F.when(is_o, F.lit(None).cast("string")).otherwise(F.substring(lab, 3, 1000000))
    return df.withColumn("bilou", bilou).withColumn("entity", entity)
