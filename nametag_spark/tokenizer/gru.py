"""GRU tokenizer (MorphoDiTa T8 layer) — inference + segmentation.

Re-expression of the reference network and decision semantics:

  - network (gru_tokenizer_network.h:28-187): per-char embeddings with
    NFKD + ideographic-punctuation + per-category unknown-char fallbacks,
    a forward and a backward GRU (update/reset gates, tanh candidate,
    state = z*state + (1-z)*candidate), and per-direction 3-way projections
    summed into the outcome scores. Outcomes: NO_SPLIT, END_OF_TOKEN,
    END_OF_SENTENCE; argmax with the reference's exact tie rule
    (outcome = w1 > w0; then 2 if w2 > w[outcome]).
  - segmentation (gru_tokenizer.cpp:20-53): spaces are consumed outside
    tokens (an END_OF_SENTENCE outcome on a space ends the sentence when
    tokens exist); a URL/email match overrides the network for its span
    (any END_OF_SENTENCE outcome inside it ends the sentence after it);
    otherwise a token runs until the first non-NO_SPLIT outcome (that char
    inclusive), END_OF_SENTENCE also ending the sentence. The emergency
    split thresholds match unicode_tokenizer.cpp:60-67.

The TRAINER (gru_tokenizer_network_trainer.h) is deliberately not
re-created: no released NameTag model uses a GRU tokenizer, so there is no
behavior to be parity-tested against — the network here is exercised with
hand-constructed weights whose segmentation behavior is derivable by hand
(tests/test_gru_tokenizer.py).
"""

from __future__ import annotations

import unicodedata

import numpy as np

from .rules import detect_url_email

NO_SPLIT, END_OF_TOKEN, END_OF_SENTENCE = 0, 1, 2


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class Gru:
    """One GRU direction: X/X_r/X_z (input->candidate/reset/update) and
    H/H_r/H_z (state->...), each (D, D) with a (D,) bias."""

    def __init__(self, D: int, rng=None):
        def m():
            return (rng.standard_normal((D, D)) * 0.3 if rng is not None else np.zeros((D, D)))

        def b():
            return np.zeros(D)

        self.X, self.X_r, self.X_z = m(), m(), m()
        self.bX, self.bX_r, self.bX_z = b(), b(), b()
        self.H, self.H_r, self.H_z = m(), m(), m()


class GruTokenizerNetwork:
    def __init__(self, dim: int, embeddings: dict, gru_fwd: Gru, gru_bwd: Gru,
                 projection_fwd, projection_bwd, unknown_chars: dict | None = None):
        self.dim = dim
        self.embeddings = {c: np.asarray(v, dtype=np.float64) for c, v in embeddings.items()}
        self.gru_fwd = gru_fwd
        self.gru_bwd = gru_bwd
        # projections: (w (3, D), b (3,))
        self.projection_fwd = (np.asarray(projection_fwd[0], float), np.asarray(projection_fwd[1], float))
        self.projection_bwd = (np.asarray(projection_bwd[0], float), np.asarray(projection_bwd[1], float))
        # unicode category -> substitute char (gru_tokenizer_network.h:133-136)
        self.unknown_chars = dict(unknown_chars or {})
        self._empty = np.zeros(dim)

    # ------------------------------------------------------------ embedding
    def _embed(self, ch: str) -> np.ndarray:
        e = self.embeddings.get(ch)
        if e is not None:
            return e
        # NFKD first char + ideographic full stop/comma substitutes
        decomp = unicodedata.normalize("NFKD", ch)
        if decomp:
            c0 = decomp[0]
            if c0 == "、":
                c0 = ","
            if c0 == "。":
                c0 = "."
            if c0 != ch:
                e = self.embeddings.get(c0)
                if e is not None:
                    return e
        sub = self.unknown_chars.get(unicodedata.category(ch))
        if sub is not None:
            e = self.embeddings.get(sub)
            if e is not None:
                return e
        return self._empty

    # ------------------------------------------------------------- classify
    def classify(self, chars: str) -> np.ndarray:
        """Per-char outcome ids; scores follow gru_tokenizer_network.h:139-186."""
        n = len(chars)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        E = np.stack([self._embed(c) for c in chars])  # (n, D)
        # scores init with the FWD projection bias only — the reference never
        # reads projection_bwd.b in classify (gru_tokenizer_network.h:141)
        w = np.tile(self.projection_fwd[1], (n, 1))

        for direction in (0, 1):
            gru = self.gru_fwd if direction == 0 else self.gru_bwd
            proj_w, _proj_b = self.projection_fwd if direction == 0 else self.projection_bwd
            state = np.zeros(self.dim)
            order = range(n) if direction == 0 else range(n - 1, -1, -1)
            for i in order:
                e = E[i]
                update = _sigmoid(gru.bX_z + gru.X_z @ e + gru.H_z @ state)
                reset = _sigmoid(gru.bX_r + gru.X_r @ e + gru.H_r @ state) * state
                candidate = np.tanh(gru.bX + gru.X @ e + gru.H @ reset)
                state = update * state + (1.0 - update) * candidate
                w[i] += proj_w @ state
        # reference tie rule (gru_tokenizer_network.h:183-186)
        out = (w[:, 1] > w[:, 0]).astype(np.int64)
        out[w[:, 2] > w[np.arange(n), out]] = END_OF_SENTENCE
        return out


def _is_space(c: str) -> bool:
    return c in "\r\t\n" or unicodedata.category(c) == "Zs"


def gru_tokenize_sentences(text: str, network: GruTokenizerNetwork) -> list:
    """Tokenize + segment with network outcomes (gru_tokenizer.cpp:20-53).

    Returns sentences of (start, length) char spans, same contract as
    rules.tokenize_sentences."""
    n = len(text)
    outcomes = network.classify(text)
    sentences: list = []
    tokens: list = []

    def end_sentence():
        nonlocal tokens
        if tokens:
            sentences.append(tokens)
            tokens = []

    def emergency() -> bool:
        if not tokens:
            return False
        nt = len(tokens)
        if nt >= 500:
            return True
        if nt >= 400:
            k = unicodedata.category(text[tokens[-1][0]])
            if nt >= 450 and k.startswith("P"):
                return True
            if k == "Po":
                return True
        return False

    i = 0
    while i < n:
        if _is_space(text[i]):
            o = outcomes[i]
            i += 1
            if o == END_OF_SENTENCE and tokens:
                end_sentence()
            continue

        d = detect_url_email(text, i)
        if d is not None:
            tokens.append((i, d[1] - i))
            eos = any(outcomes[j] == END_OF_SENTENCE for j in range(i, d[1]))
            i = d[1]
            if (eos and tokens) or emergency():
                end_sentence()
            continue

        start = i
        o = NO_SPLIT
        while i < n:
            o = outcomes[i]
            i += 1
            if o != NO_SPLIT:
                break
        tokens.append((start, i - start))
        if o == END_OF_SENTENCE or emergency():
            end_sentence()

    end_sentence()
    return sentences


def demo_network(dim: int = 3) -> GruTokenizerNetwork:
    """Hand-constructed weights whose behavior is derivable by hand:
    whitespace-delimited tokens, '.' ends the sentence.

    Construction: embeddings put 'is-space' in dim 0 and 'is-period' in
    dim 2. Both GRUs use update==0 (always refresh) with X=BIG*I, so after
    tanh the state is ±1 per dim: the FORWARD state at i encodes char i.
    The BACKWARD direction additionally copies the previous backward
    state's dim 0 into dim 1 through the H matrix, so the backward state
    at i carries 'char i+1 is a space' in dim 1. END_OF_TOKEN then reads
    bwd dim 1, END_OF_SENTENCE reads fwd dim 2 ('.' itself)."""
    BIG = 8.0
    emb = {}

    def evec(space: float, other: float, period: float):
        return np.array([space, other, period])

    # generic fallbacks by category via unknown_chars; explicit common chars
    base = {" ": evec(1, 0, 0), "\t": evec(1, 0, 0), "\n": evec(1, 0, 0),
            ".": evec(-1, 1, 1)}
    for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789,;:!?-'\"@/()":
        base[c] = evec(-1, 1, 0)
    emb.update(base)

    fwd = Gru(dim)
    bwd = Gru(dim)
    for g in (fwd, bwd):
        g.bX_z = np.full(dim, -BIG)  # update ~ 0: always refresh
        g.bX_r = np.full(dim, +BIG)  # reset ~ 1
        g.X = BIG * np.eye(dim)
    # backward dim 1 = previous backward state's dim 0 (the char to the right)
    bwd.X[1, :] = 0.0
    bwd.H[1, 0] = BIG

    # outcome scores: NO_SPLIT baseline 0;
    # END_OF_TOKEN = 2*(bwd dim1 'next is space') - 1 margin
    # END_OF_SENTENCE = 2.5*(fwd dim2 'char is .') + (bwd dim1) - 2 margin
    # (2.5 so '.'+space scores EOS 1.5 > EOT 1; '.' at end-of-text 0.5 > 0)
    proj_fwd = (np.array([[0.0, 0, 0], [0, 0, 0], [0, 0, 2.5]]), np.array([0.0, -1.0, -2.0]))
    proj_bwd = (np.array([[0.0, 0, 0], [0, 2.0, 0], [0, 1.0, 0]]), np.zeros(3))

    unknown = {"Lu": "a", "Ll": "a", "Nd": "0", "Po": ",", "Zs": " "}
    return GruTokenizerNetwork(dim, emb, fwd, bwd, proj_fwd, proj_bwd, unknown)
