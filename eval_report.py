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


def _parse_conll_spans(lines):
    """Inverse of the reference conll renderer (stacked '|' nested labels):
    -> per-sentence list of (start, len, type). Open entities are matched to
    leading I- parts as an order-preserving subsequence (exact for this
    corpus — entities are flat)."""
    sentences = []
    open_ents = []  # [(start, type)]
    spans = []
    i = 0

    def close_all(upto):
        for (s, t) in open_ents:
            spans.append((s, upto - s, t))
        open_ents.clear()

    for line in lines:
        line = line.rstrip("\n")
        if not line:
            close_all(i)
            sentences.append(sorted(spans))
            spans = []
            i = 0
            continue
        label = line.split("\t")[1]
        parts = [] if label == "O" else label.split("|")
        cont = [p[2:] for p in parts if p.startswith("I-")]
        new = [p[2:] for p in parts if p.startswith("B-")]
        # order-preserving subsequence match of continued entities
        survivors = []
        ci = 0
        for (s, t) in open_ents:
            if ci < len(cont) and cont[ci] == t:
                survivors.append((s, t))
                ci += 1
            else:
                spans.append((s, i - s, t))
        open_ents[:] = survivors + [(i, t) for t in new]
        i += 1
    if open_ents or spans:
        close_all(i)
        sentences.append(sorted(spans))
    return sentences


def reference_agreement(spark) -> dict:
    """North-rule 'vs the reference' gates: the committed reference-trained
    model.ner decoded by THIS engine (distributed) over the 2000-conversation
    eval corpus, scored against the committed compiled-run_ner output
    (fixtures/ref_agreement/, regenerable via scripts/gen_ref_agreement.py)."""
    import gzip
    import os

    import pandas as pd

    from nametag_spark.data.synth import synth_transcripts
    from nametag_spark.kg.resolution import release_persisted, resolve_entities
    from nametag_spark.kg.triples import extract_triples
    from nametag_spark.ner.eval import triple_prf
    from nametag_spark.tokenizer.rules import tokenize_forms

    base = os.path.join("/root/repo", "fixtures", "ref_agreement")
    with open(os.path.join(base, "model.ner"), "rb") as f:
        blob = f.read()

    tdf, _ = synth_transcripts(n_conversations=2000, seed=20260816)
    transcripts = spark.createDataFrame(tdf)
    sent_index = []  # sid -> (conv_id, turn_idx, sent_idx, forms)
    for row in tdf.itertuples(index=False):
        for s_idx, forms in enumerate(tokenize_forms(row.text)):
            sent_index.append((row.conv_id, int(row.turn_idx), s_idx, forms))

    # engine decode (distributed) of the SAME model on the SAME sentences
    df = spark.createDataFrame(
        [(sid, forms) for sid, (_c, _t, _s, forms) in enumerate(sent_index)],
        "sid long, forms array<string>",
    )

    def fn(batches):
        import io

        from nametag_spark.model.binary_reader import load_binary_ner

        model = load_binary_ner(io.BytesIO(blob))
        for pdf in batches:
            rows = {"sid": [], "start": [], "length": [], "type": []}
            for sid, forms in zip(pdf["sid"], pdf["forms"]):
                for (start, length, tname) in model.recognize_sentence(list(forms)):
                    rows["sid"].append(sid)
                    rows["start"].append(start)
                    rows["length"].append(length)
                    rows["type"].append(tname)
            yield pd.DataFrame(rows)

    mine_rows = df.mapInPandas(fn, "sid long, start int, length int, type string").collect()
    mine = {(r["sid"], r["start"], r["length"], r["type"]) for r in mine_rows}

    with gzip.open(os.path.join(base, "reference_output.conll.gz"), "rt", encoding="utf-8") as f:
        ref_sents = _parse_conll_spans(f)
    ref = {
        (sid, s, l, t)
        for sid, spans in enumerate(ref_sents)
        for (s, l, t) in spans
    }

    tp = len(mine & ref)
    p = tp / len(mine) if mine else 0.0
    r = tp / len(ref) if ref else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0

    # triple agreement: the same KG rules over each mention set
    def mentions_df(span_set):
        rows = []
        for (sid, s, l, t) in span_set:
            conv_id, turn_idx, sent_idx, forms = sent_index[sid]
            rows.append((conv_id, turn_idx, sent_idx, s, l, t, " ".join(forms[s : s + l])))
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, sent_idx int, tok_start int, tok_len int, type string, surface string",
        )

    me_mine, _ = resolve_entities(mentions_df(mine))
    t_mine = extract_triples(me_mine, transcripts)
    me_ref, _ = resolve_entities(mentions_df(ref))
    t_ref = extract_triples(me_ref, transcripts)
    trip = triple_prf(t_mine, t_ref)
    release_persisted()

    return {
        "ref_span_precision": round(p, 4),
        "ref_span_recall": round(r, 4),
        "ref_span_f1": round(f1, 4),
        "ref_n_mine": len(mine),
        "ref_n_reference": len(ref),
        "ref_triple_precision": round(trip["precision"], 4),
        "ref_triple_recall": round(trip["recall"], 4),
        "ref_n_triples": trip["n_pred"],
    }


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

    tdf, gdf = synth_transcripts(n_conversations=500, seed=20260816)
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

    ref = reference_agreement(spark)

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
        **ref,
        "gates": {
            "span_f1_ge_0.95": span["f1"] >= 0.95,
            "triple_p_ge_0.95": trip["precision"] >= 0.95,
            "triple_r_ge_0.95": trip["recall"] >= 0.95,
            "ref_span_f1_ge_0.95": ref["ref_span_f1"] >= 0.95,
            "ref_triple_p_ge_0.95": ref["ref_triple_precision"] >= 0.95,
            "ref_triple_r_ge_0.95": ref["ref_triple_recall"] >= 0.95,
        },
    }
    with open("/root/repo/EVAL.md", "w", encoding="utf-8") as f:
        f.write(
            "# EVAL — north-rule gates (span F1, triple P/R)\n\n"
            "Produced by `python eval_report.py`: the standard entry model on\n"
            "500 fresh seeded conversations (seed 20260816, disjoint from the\n"
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
            f"| **vs-REFERENCE span F1** | {report['ref_span_f1']} | >= 0.95 | {'✅' if report['gates']['ref_span_f1_ge_0.95'] else '❌'} |\n"
            f"| vs-REFERENCE span P / R | {report['ref_span_precision']} / {report['ref_span_recall']} | — | |\n"
            f"| **vs-REFERENCE triple precision** | {report['ref_triple_precision']} | >= 0.95 | {'✅' if report['gates']['ref_triple_p_ge_0.95'] else '❌'} |\n"
            f"| **vs-REFERENCE triple recall** | {report['ref_triple_recall']} | >= 0.95 | {'✅' if report['gates']['ref_triple_r_ge_0.95'] else '❌'} |\n"
            f"| vs-REFERENCE mentions (mine/ref) | {report['ref_n_mine']} / {report['ref_n_reference']} | — | |\n"
            "\nThe secondary metric trains on one half of the entity vocabulary and\n"
            "evaluates on the disjoint other half (zero surface overlap) — the score\n"
            "reflects generalization of capitalization/suffix/context features, not\n"
            "memorized forms.\n"
            "\nThe vs-REFERENCE rows score THIS ENGINE's distributed decode of the\n"
            "committed reference-trained `fixtures/ref_agreement/model.ner` against\n"
            "the compiled reference run_ner's own output on the same 2000-conversation\n"
            "corpus (~200k tokens; regenerate with scripts/gen_ref_agreement.py), and\n"
            "the triples each mention set yields through the same KG rules — the\n"
            "north rule's 'matches the reference's emitted triples' measured\n"
            "directly against the reference binary.\n"
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
