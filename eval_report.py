"""North-rule evaluation report: span-level F1 and triple P/R gates.

Trains the standard entry model, runs the full pipeline on FRESH seeded
transcripts (never seen in training), and scores:
  - mention spans vs planted gold (exact span+type, reference protocol)
  - emitted triples vs triples derived from the gold mentions through the
    same co-occurrence rules (the reference-derived target: if mention
    recognition were perfect, these are exactly the triples the pipeline
    must emit)

Writes EVAL.md and prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as entry
    from nametag_spark.data.synth import synth_transcripts
    from nametag_spark.kg.resolution import resolve_entities
    from nametag_spark.kg.triples import extract_triples
    from nametag_spark.ner.eval import span_prf, triple_prf
    from nametag_spark.ner.pipeline import recognize_df
    from nametag_spark.session import get_spark

    spark = get_spark(app_name="nametag_spark_eval")
    model_dir = entry._model_dir()

    tdf, gdf = synth_transcripts(n_conversations=120, seed=20260816)
    transcripts = spark.createDataFrame(tdf)
    gold_mentions = spark.createDataFrame(gdf)

    mentions = recognize_df(transcripts, model_dir).persist()
    span = span_prf(mentions, gold_mentions)

    # pipeline triples
    me, _ = resolve_entities(mentions)
    pred_triples = extract_triples(me, transcripts)

    # reference-derived target triples: the same KG rules applied to GOLD
    # mentions (tok_start needed by the co-occurrence pairing)
    gold_me, _ = resolve_entities(
        gold_mentions.withColumnRenamed("surface", "surface")
        .selectExpr("conv_id", "turn_idx", "sent_idx", "tok_start", "tok_len", "type", "surface")
    )
    gold_triples = extract_triples(gold_me, transcripts)

    trip = triple_prf(pred_triples, gold_triples)

    # secondary: generalization to UNSEEN entity vocabulary — train on one
    # disjoint vocab half, evaluate on the other (0 surface overlap), so the
    # score reflects feature generalization (capitalization/suffix/context),
    # not memorized forms
    from nametag_spark.data.synth import gold_to_conll
    from nametag_spark.ner.pipeline import recognize_local
    from nametag_spark.train.trainer import train_ner

    g_tdf, g_gdf = synth_transcripts(n_conversations=60, seed=1, vocab_split="train")
    g_model = train_ner(
        "Form/2\nFormCapitalization/2\nFormCaseNormalized/2\nFormSuffix/1 2 4\n"
        "NumericTimeValue/2\nPreviousStage/3\nURLEmailDetector/1 URL EMAIL",
        gold_to_conll(g_tdf, g_gdf),
        stages=2,
        params={"iterations": 8},
    )
    e_tdf, e_gdf = synth_transcripts(n_conversations=25, seed=77, vocab_split="eval")
    g_pred = set()
    for row in e_tdf.itertuples(index=False):
        for m in recognize_local(g_model, [row.text])[0]:
            g_pred.add((row.conv_id, row.turn_idx, m["sent_idx"], m["tok_start"], m["tok_len"], m["type"]))
    g_gold = {
        (r.conv_id, r.turn_idx, r.sent_idx, r.tok_start, r.tok_len, r.type)
        for r in e_gdf.itertuples(index=False)
    }
    g_tp = len(g_pred & g_gold)
    g_p = g_tp / len(g_pred) if g_pred else 0.0
    g_r = g_tp / len(g_gold)
    unseen_f1 = 2 * g_p * g_r / (g_p + g_r) if g_p + g_r else 0.0

    report = {
        "span_precision": round(span["precision"], 4),
        "span_recall": round(span["recall"], 4),
        "span_f1": round(span["f1"], 4),
        "n_pred_mentions": span["n_pred"],
        "n_gold_mentions": span["n_gold"],
        "triple_precision": round(trip["precision"], 4),
        "triple_recall": round(trip["recall"], 4),
        "triple_f1": round(trip["f1"], 4),
        "n_pred_triples": trip["n_pred"],
        "n_gold_triples": trip["n_gold"],
        "unseen_vocab_f1": round(unseen_f1, 4),
        "gates": {
            "span_f1_ge_0.95": span["f1"] >= 0.95,
            "triple_p_ge_0.95": trip["precision"] >= 0.95,
            "triple_r_ge_0.95": trip["recall"] >= 0.95,
        },
    }
    with open("/root/repo/EVAL.md", "w", encoding="utf-8") as f:
        f.write(
            "# EVAL — north-rule gates (span F1, triple P/R)\n\n"
            "Produced by `python eval_report.py`: the standard entry model on\n"
            "120 fresh seeded conversations (seed 20260816, disjoint from the\n"
            "training seeds); exact span+type matching per the reference\n"
            "protocol; triple target = the same KG rules applied to the gold\n"
            "mention table.\n\n"
            "| metric | value | gate | pass |\n|---|---|---|---|\n"
            f"| span precision | {report['span_precision']} | — | |\n"
            f"| span recall | {report['span_recall']} | — | |\n"
            f"| span F1 | {report['span_f1']} | >= 0.95 | {'✅' if report['gates']['span_f1_ge_0.95'] else '❌'} |\n"
            f"| triple precision | {report['triple_precision']} | >= 0.95 | {'✅' if report['gates']['triple_p_ge_0.95'] else '❌'} |\n"
            f"| triple recall | {report['triple_recall']} | >= 0.95 | {'✅' if report['gates']['triple_r_ge_0.95'] else '❌'} |\n"
            f"| mentions (pred/gold) | {report['n_pred_mentions']} / {report['n_gold_mentions']} | — | |\n"
            f"| triples (pred/gold) | {report['n_pred_triples']} / {report['n_gold_triples']} | — | |\n"
            f"| unseen-vocabulary span F1 (secondary) | {report['unseen_vocab_f1']} | — | |\n"
            "\nThe secondary metric trains on one half of the entity vocabulary and\n"
            "evaluates on the disjoint other half (zero surface overlap) — the score\n"
            "reflects generalization of capitalization/suffix/context features, not\n"
            "memorized forms.\n"
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
