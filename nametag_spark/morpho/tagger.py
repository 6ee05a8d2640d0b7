"""Averaged-perceptron Viterbi POS tagger (MorphoDiTa G6 layer).

Re-expression of the reference decoder semantics:

  - viterbi.h:58-122: the lattice column for token i is its list of
    analyses; nodes carry (tag, prev, score); nodes whose last
    (decoding_order-1) tags agree are MERGED keeping the max score
    (viterbi.h:100-105 `same_tags >= decoding_order-1`) — i.e. classic
    Viterbi with the state = the last order-1 tag ids, which is exactly how
    this implementation keys its DP dict. Single-analysis columns with a
    single predecessor skip feature scoring (viterbi.h:96).
  - perceptron_tagger.h:70-92: analyses come from the morpho dictionary
    (+guessers); the decoder picks one analysis index per token.
  - Training is a structured averaged perceptron over the same features
    (the reference trains feature-sequence weights with early stopping
    against heldout; relaxed here per the north rule — behavior is gated by
    pytest goldens, not bit parity).

Features are deliberately the classic Ratnaparkhi/perceptron POS set:
form, lowercase form, prefixes/suffixes, shape, neighboring forms, and the
tag history conjunctions (the dynamic features of viterbi.h:95).
"""

from __future__ import annotations

import numpy as np

BOS = "<s>"


def _static_features(forms, i):
    f = forms[i]
    low = f.lower()
    prev_f = forms[i - 1].lower() if i > 0 else BOS
    next_f = forms[i + 1].lower() if i + 1 < len(forms) else "</s>"
    feats = [
        "w=" + low,
        "p1=" + low[:1],
        "p2=" + low[:2],
        "s1=" + low[-1:],
        "s2=" + low[-2:],
        "s3=" + low[-3:],
        "w-1=" + prev_f,
        "w+1=" + next_f,
    ]
    if f[:1].isupper():
        feats.append("cap" + ("@0" if i == 0 else ""))
    if any(c.isdigit() for c in f):
        feats.append("num")
    return feats


class PerceptronTagger:
    """decoding_order=3 (state = last two tags)."""

    def __init__(self, weights=None, decoding_order: int = 3):
        self.weights = weights or {}  # (feat, tag) -> float
        self.decoding_order = decoding_order

    # ------------------------------------------------------------- scoring
    def _score(self, static_feats, tag, prev_tag, prev2_tag):
        w = self.weights
        s = 0.0
        for f in static_feats:
            s += w.get((f, tag), 0.0)
        s += w.get(("t-1=" + prev_tag, tag), 0.0)
        s += w.get(("t-2,t-1=" + prev2_tag + "," + prev_tag, tag), 0.0)
        return s

    # -------------------------------------------------------------- decode
    def tag(self, forms, analyses) -> list:
        """analyses: per-token list of (lemma, tag). Returns the chosen
        analysis INDEX per token (perceptron_tagger.h:88 contract). Columns
        must be non-empty (Morpho.analyze guarantees that)."""
        n = len(forms)
        if n == 0:
            return []
        # DP over states (prev2_tag, prev_tag) -> (score, backpointer)
        states = {(BOS, BOS): (0.0, None)}
        backs = []
        for i in range(n):
            feats = _static_features(forms, i)
            tags = [t for (_l, t) in analyses[i]]
            new: dict = {}
            back: dict = {}
            trivial = len(tags) == 1 and len(states) == 1
            for (p2, p1), (score, _b) in states.items():
                for idx, t in enumerate(tags):
                    s = score if trivial else score + self._score(feats, t, p1, p2)
                    key = (p1, t)
                    if key not in new or s > new[key][0]:
                        new[key] = (s, (p2, p1))
                        back[key] = ((p2, p1), idx)
            states = new
            backs.append(back)
        best_key = max(states, key=lambda k: states[k][0])
        out = [0] * n
        key = best_key
        for i in range(n - 1, -1, -1):
            prev_key, idx = backs[i][key]
            out[i] = idx
            key = prev_key
        return out

    def tag_with_lemmas(self, forms, analyses):
        idx = self.tag(forms, analyses)
        lemmas = [analyses[i][k][0] for i, k in enumerate(idx)]
        tags = [analyses[i][k][1] for i, k in enumerate(idx)]
        return lemmas, tags

    # --------------------------------------------------------------- train
    @classmethod
    def train(cls, sentences, analyses_fn, iterations: int = 5, seed: int = 42):
        """sentences: [(forms, gold_tags)]; analyses_fn(form) -> candidate
        (lemma, tag) list. Structured averaged perceptron: decode with the
        current weights, add gold features / subtract predicted features on
        mismatches, average over all updates."""
        rng = np.random.default_rng(seed)
        tagger = cls()
        totals: dict = {}
        stamps: dict = {}
        step = 0

        def upd(key, delta):
            totals[key] = totals.get(key, 0.0) + tagger.weights.get(key, 0.0) * (
                step - stamps.get(key, 0)
            )
            stamps[key] = step
            tagger.weights[key] = tagger.weights.get(key, 0.0) + delta

        data = list(sentences)
        cached = [[analyses_fn(f) for f in forms] for forms, _ in data]
        for _ in range(iterations):
            order = rng.permutation(len(data))
            for si in order:
                forms, gold = data[si]
                analyses = cached[si]
                step += 1
                pred_idx = tagger.tag(forms, analyses)
                pred = [analyses[i][k][1] for i, k in enumerate(pred_idx)]
                if pred == list(gold):
                    continue
                # feature delta over the whole sequence (gold +1, pred -1)
                for seq, sign in ((gold, 1.0), (pred, -1.0)):
                    p1 = p2 = BOS
                    for i, t in enumerate(seq):
                        for f in _static_features(forms, i):
                            upd((f, t), sign)
                        upd(("t-1=" + p1, t), sign)
                        upd(("t-2,t-1=" + p2 + "," + p1, t), sign)
                        p2, p1 = p1, t
        # finalize averaging
        for key, w in list(tagger.weights.items()):
            total = totals.get(key, 0.0) + w * (step - stamps.get(key, 0))
            tagger.weights[key] = total / max(1, step)
        return tagger

    # ---------------------------------------------------------------- state
    def state(self) -> dict:
        return {
            "decoding_order": self.decoding_order,
            "weights": [[f, t, w] for (f, t), w in sorted(self.weights.items())],
        }

    @classmethod
    def from_state(cls, st: dict) -> "PerceptronTagger":
        return cls(
            {(f, t): float(w) for (f, t, w) in st["weights"]},
            int(st["decoding_order"]),
        )


class MorphoTagger:
    """The G4 wrapper (morphodita_tagger.cpp analogue): morpho analyses ->
    Viterbi decode -> per-token (lemma, tag), consumed by
    Sentence.from_pdt so the RawLemma*/Lemma/Tag/CzechLemmaTerm feature
    templates (F5-F8) see real morphology.

    Per-form analyses are memoized (forms follow a Zipf law; the dictionary
    lookup dominates the hot path otherwise), and an untrained decoder
    (no weights) short-circuits to the first analysis per token — exactly
    the zero-weight Viterbi result (every path ties; first-insertion order
    wins), without the per-sentence DP."""

    def __init__(self, morpho, tagger: PerceptronTagger):
        self.morpho = morpho
        self.tagger = tagger
        self._cache: dict = {}

    def _analyses(self, form):
        a = self._cache.get(form)
        if a is None:
            a = self._cache[form] = self.morpho.analyze(form)
            if len(self._cache) > 500_000:  # bound worker memory
                self._cache.clear()
        return a

    def tag_sentence(self, forms):
        analyses = [self._analyses(f) for f in forms]
        if not self.tagger.weights:
            firsts = [a[0] for a in analyses]
            return [l for (l, _t) in firsts], [t for (_l, t) in firsts]
        return self.tagger.tag_with_lemmas(forms, analyses)

    def state(self) -> dict:
        return {"morpho": self.morpho.state(), "tagger": self.tagger.state()}

    @classmethod
    def from_state(cls, st: dict) -> "MorphoTagger":
        from .dictionary import Morpho

        return cls(Morpho.from_state(st["morpho"]), PerceptronTagger.from_state(st["tagger"]))
