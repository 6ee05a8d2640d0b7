"""Driver-local trainer (SURVEY.md §2.7, R1-R5).

Training corpora for this model family are small (~10^5 tokens), and the
reference's SGD is order-dependent sequential
(/root/reference/src/classifier/network_classifier.cpp:62-166), so training
runs driver-local in numpy — the distributed engine consumes the resulting
model via broadcast. Determinism: fixed numpy seed (the north rule gates on
output-level F1, not on bit-parity with C++ mt19937).

Data format: CoNLL-style 2-column `form<TAB>label`, blank line = sentence
(/root/reference/src/ner/bilou_ner_trainer.cpp:77-125) with BIO -> BILOU
conversion at load (:101-111).
"""

from __future__ import annotations

import numpy as np

from ..features.templates import EntityMap, FeatureTemplates, Sentence
from ..model.model import NerModel
from ..ner import core


def parse_conll(text: str):
    """-> list of sentences, each a list of (form, label)."""
    sentences = []
    cur = []
    for line in text.splitlines():
        if not line.strip():
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            raise ValueError(f"Bad CoNLL line: {line!r}")
        cur.append((parts[0], parts[1]))
    if cur:
        sentences.append(cur)
    return sentences


def bio_to_outcomes(labels, entities: EntityMap, add_entities: bool):
    """BIO labels -> bilou_entity outcome codes
    (bilou_ner_trainer.cpp:101-111).

    Outcome encoding: I=0, L=1, O=2, B(e)=3+2e, U(e)=4+2e.
    """
    outcomes = []
    n = len(labels)
    for i, lab in enumerate(labels):
        if lab in ("_", "O"):
            outcomes.append(2)
        elif len(lab) >= 3 and lab[:2] in ("I-", "B-"):
            has_prev = i > 0 and lab[0] == "I" and labels[i - 1][1:] == lab[1:]
            has_next = i + 1 < n and labels[i + 1][0] != "B" and labels[i + 1][1:] == lab[1:]
            etype = entities.parse(lab[2:], add_entities)
            if not has_prev and not has_next:
                outcomes.append(4 + 2 * etype)  # U
            elif not has_prev and has_next:
                outcomes.append(3 + 2 * etype)  # B
            elif has_prev and has_next:
                outcomes.append(0)  # I
            else:
                outcomes.append(1)  # L
        else:
            raise ValueError(f"Cannot parse entity label {lab!r}")
    return outcomes


class _LabelledSentence:
    __slots__ = ("sentence", "outcomes")

    def __init__(self, sentence, outcomes):
        self.sentence = sentence
        self.outcomes = outcomes


def _load_data(conll_sentences, entities, add_entities, tagger=None):
    data = []
    for sent in conll_sentences:
        forms = [f for f, _ in sent]
        labels = [l for _, l in sent]
        if tagger is not None and hasattr(tagger, "ner_tag_columns"):
            # MorphoDiTa tagger: train over the SAME per-token morphology
            # inference sees (raw_lemmas_all etc. — bilou_ner_trainer.cpp
            # tags training data with the model tagger)
            fs, comments, raws, lids, tags, _none, keys, _shared = tagger.ner_tag_columns(forms)
            s = Sentence(fs, lemma_comments=comments, raw_lemmas=raws,
                         lemma_ids=lids, tags=tags)
            s._raw_all_src = tagger  # lazy raw_lemmas_all (raw_all_of)
            s._fast_token_keys = keys
        elif tagger is not None:
            lemmas, tags = tagger.tag_sentence(forms)
            s = Sentence.from_pdt(forms, lemmas, tags)
        else:
            s = Sentence(forms)
        s.clear_previous_stage()
        data.append(_LabelledSentence(s, bio_to_outcomes(labels, entities, add_entities)))
    return data


def _generate_instances(data, templates, add_features):
    """-> (features_list, outcomes) over all tokens
    (bilou_ner_trainer.cpp:127-141)."""
    feats = []
    outs = []
    for ls in data:
        ls.sentence.clear_probabilities_local_filled()
        templates.process_sentence(ls.sentence, adding_features=add_features)
        for i in range(ls.sentence.size):
            feats.append(list(ls.sentence.features[i]))
            outs.append(ls.outcomes[i])
    return feats, outs


def _train_network(n_features, n_out, train_feats, train_outs, heldout, params, verbose=False):
    """Sequential softmax SGD (network_classifier.cpp:62-166)."""
    rng = np.random.default_rng(params.get("seed", 42))
    mw = float(params.get("missing_weight", -0.2))
    iterations = int(params.get("iterations", 10))
    lr0 = float(params.get("initial_learning_rate", 0.1))
    lrF = float(params.get("final_learning_rate", 0.01))
    sigma = float(params.get("gaussian_sigma", 0.5))
    n_hidden = int(params.get("hidden_layer", 0) or 0)

    # mask of (feature, outcome) pairs seen in training
    mask = np.zeros((n_features, n_out), dtype=bool)
    for f_list, o in zip(train_feats, train_outs):
        mask[np.asarray(f_list, dtype=np.int64), o] = True
    # W holds adjusted weights (w - mw); untrained pairs contribute 0
    W = np.where(mask, -mw, 0.0)

    # hidden layer init: each weight = sum of three U(-0.1, 0.1) draws
    # (network_classifier.cpp:104-111)
    H0 = H1 = None
    if n_hidden:
        H0 = rng.uniform(-0.1, 0.1, size=(n_features, n_hidden, 3)).sum(axis=2)
        H1 = rng.uniform(-0.1, 0.1, size=(n_hidden, n_out, 3)).sum(axis=2)

    gs = sigma / len(train_feats)
    n = len(train_feats)
    # keep duplicate feature ids: the reference propagate/backpropagate
    # (network_classifier.cpp) and this repo's inference paths
    # (Network.scores_batch, StagePartialScorer) all count every occurrence,
    # so a token carrying the same feature twice (e.g. a gazetteer span hit
    # from both a single- and multi-token match) must contribute twice here
    # too — np.add.at below accumulates duplicate-index updates.
    feats_arr = [np.asarray(f, dtype=np.int64) for f in train_feats]
    nnz = np.array([len(f) for f in train_feats], dtype=np.float64)

    for it in range(iterations):
        if iterations > 1 and lrF:
            lr = np.exp(((iterations - 1 - it) * np.log(lr0) + it * np.log(lrF)) / (iterations - 1))
        else:
            lr = lr0
        perm = rng.permutation(n)
        correct = 0
        for idx in perm:
            F = feats_arr[idx]
            o = train_outs[idx]
            WF = W[F]
            out = WF.sum(axis=0) + nnz[idx] * mw
            if n_hidden:
                hpre = H0[F].sum(axis=0)
                hidden = 1.0 / (1.0 + np.exp(-hpre))
                out = out + hidden @ H1
            out -= out.max()
            np.exp(out, out=out)
            out /= out.sum()
            correct += int(out.argmax() == o)
            err = -out
            err[o] += 1.0
            # w += lr*err - w*gs on present pairs; in adjusted form:
            np.add.at(W, F, (lr * err - (WF + mw) * gs) * mask[F])
            if n_hidden:
                # hidden_error computed against pre-update H1
                herr = (H1 @ err) * hidden * (1.0 - hidden)
                H1 += lr * np.outer(hidden, err) - H1 * gs
                np.add.at(H0, F, lr * herr - H0[F] * gs)
        if verbose:
            acc = correct * 100.0 / n
            msg = f"iter {it + 1}: lr {lr:.4f} train acc {acc:.2f}%"
            if heldout is not None:
                h_feats, h_outs = heldout
                hc = 0
                for F, o in zip(h_feats, h_outs):
                    F = np.asarray(F, dtype=np.int64)
                    Fs = F[F < n_features]
                    out = W[Fs].sum(axis=0) + len(F) * mw
                    if n_hidden:
                        hidden = 1.0 / (1.0 + np.exp(-H0[Fs].sum(axis=0)))
                        out = out + hidden @ H1
                    hc += int(out.argmax() == o)
                msg += f" heldout acc {hc * 100.0 / len(h_outs):.2f}%"
            print(msg)

    return core.Network(W, mask, mw, H0, H1)


def _compute_previous_stage(data, templates, net):
    """bilou_ner_trainer.cpp:143-174"""
    for ls in data:
        s = ls.sentence
        s.clear_probabilities_local_filled()
        templates.process_sentence(s)
        unfilled = [i for i in range(s.size) if not s.local_filled[i]]
        if unfilled:
            flat = []
            ptr = [0]
            for i in unfilled:
                flat.extend(s.features[i])
                ptr.append(len(flat))
            probs = net.scores_batch(np.asarray(flat, dtype=np.int64), np.asarray(ptr, dtype=np.int64))
            local, ent = core.fill_bilou_probabilities(probs)
            for r, i in enumerate(unfilled):
                s.local[i] = local[r]
                s.local_ent[i] = ent[r]
                s.local_filled[i] = True
        best, best_ent = core.viterbi_decode(s.local, s.local_ent)
        s.prev_bilou = [int(b) for b in best]
        s.prev_ent = [int(e) for e in best_ent]


def train_ner(
    templates_text: str,
    train_conll: str,
    heldout_conll: str | None = None,
    stages: int = 1,
    params: dict | None = None,
    base_dir: str = "",
    verbose: bool = False,
    tagger=None,
) -> NerModel:
    """Full training lifecycle (bilou_ner_trainer.cpp:20-75).

    tagger: optional morpho.tagger.MorphoTagger — training sentences then
    carry real (lemma, tag) morphology, matching the external/MorphoDiTa
    tagger path of the reference trainer."""
    params = dict(params or {})
    if not 0 < stages < 256:
        raise ValueError("stages must be in 1..255")

    entities = EntityMap()
    train_data = _load_data(parse_conll(train_conll), entities, add_entities=True, tagger=tagger)
    heldout_data = (
        _load_data(parse_conll(heldout_conll), entities, add_entities=False, tagger=tagger)
        if heldout_conll
        else []
    )

    templates = FeatureTemplates.parse(templates_text, entities, base_dir=base_dir)

    networks = []
    for _stage in range(stages):
        train_feats, train_outs = _generate_instances(train_data, templates, add_features=True)
        heldout = _generate_instances(heldout_data, templates, add_features=False) if heldout_data else None
        net = _train_network(
            templates.total_features,
            core.n_outcomes(len(entities)),
            train_feats,
            train_outs,
            heldout,
            params,
            verbose=verbose,
        )
        networks.append(net)
        _compute_previous_stage(train_data, templates, net)
        if heldout_data:
            _compute_previous_stage(heldout_data, templates, net)

    return NerModel(entities, templates, networks, tagger=tagger)
