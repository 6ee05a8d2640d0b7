"""Span-level evaluation replicating the reference scoring protocol.

The reference's published F1 numbers use exact span+type matching (CoNLL
eval protocol; MANUAL:321-366,436-437). Implemented relationally: predicted
and gold mention tables are inner-joined on the full span key; P/R/F1 fall
out of three counts. Used by the north-rule gates (span F1 and triple P/R
>= 0.95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPAN_KEY = ["conv_id", "turn_idx", "sent_idx", "tok_start", "tok_len", "type"]


def span_prf(pred: DataFrame, gold: DataFrame, key=None) -> dict:
    """Exact span+type precision/recall/F1 between two mention tables."""
    key = list(key or SPAN_KEY)
    p = pred.select(*key).distinct()
    g = gold.select(*key).distinct()
    tp = p.join(g, key, "inner").count()
    n_pred = p.count()
    n_gold = g.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "n_pred": n_pred,
        "n_gold": n_gold,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def triple_prf(pred: DataFrame, gold: DataFrame, key=("subj_norm", "pred", "obj_norm")) -> dict:
    """Triple-level P/R/F1 on canonical (subj, pred, obj) keys."""
    return span_prf(pred, gold, key=list(key))
