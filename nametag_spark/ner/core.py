"""NER classification + decoding kernels (SURVEY.md §2.6).

Batch-vectorized numpy re-implementations of:
  - log-linear classify with missing_weight default
      (/root/reference/src/classifier/network_classifier.cpp:168-218)
  - outcome -> BILOU projection
      (/root/reference/src/ner/bilou_ner.cpp:113-124,
       /root/reference/src/bilou/bilou_entity.h:25-54)
  - sequential global update ("Viterbi" with per-step renormalization by the
      max of the two predecessor groups and B,I,L,O,U tie-break order)
      (/root/reference/src/bilou/bilou_probabilities.cpp:15-81)
  - best-path backtrace (/root/reference/src/bilou/ner_sentence.cpp:42-55)
  - entity extraction from BILOU (/root/reference/src/ner/bilou_ner.cpp:80-87)

Outcome encoding: I=0, L=1, O=2, B(e)=3+2e, U(e)=4+2e
(bilou_entity.h:25-28).  BILOU state order: B=0,I=1,L=2,O=3,U=4.
"""

from __future__ import annotations

import numpy as np

BILOU_B, BILOU_I, BILOU_L, BILOU_O, BILOU_U = 0, 1, 2, 3, 4
ENTITY_UNKNOWN = -1


def n_outcomes(n_entities: int) -> int:
    return 3 + 2 * n_entities


class Network:
    """Sparse log-linear classifier stored as a dense adjusted-weight matrix.

    W_adj[f, o] = weight[f][o] - missing_weight  for (f, o) pairs seen in
    training, 0 otherwise, so scoring a token with feature multiset F is
        out[o] = |F| * missing_weight + sum_{f in F} W_adj[f, o]
    — one gather + segment-sum per Arrow batch instead of the reference's
    per-token loop (physical strategy per SURVEY.md §4 P3).
    """

    def __init__(
        self,
        w_adj: np.ndarray,
        mask: np.ndarray,
        missing_weight: float,
        hidden_w0: np.ndarray | None = None,
        hidden_w1: np.ndarray | None = None,
    ):
        self.w_adj = w_adj  # (n_features, n_out) float64
        self.mask = mask  # (n_features, n_out) bool — training only
        self.missing_weight = float(missing_weight)
        # optional sigmoid hidden layer (network_classifier.cpp:189-209):
        # hidden = sigmoid(sum_f hidden_w0[f]); out += hidden @ hidden_w1
        self.hidden_w0 = hidden_w0  # (n_features, n_hidden) or None
        self.hidden_w1 = hidden_w1  # (n_hidden, n_out) or None

    @property
    def n_out(self) -> int:
        return self.w_adj.shape[1]

    @property
    def n_hidden(self) -> int:
        return 0 if self.hidden_w0 is None else self.hidden_w0.shape[1]

    # cap on the transient (nnz x n_out) gather buffer: ~500k rows x 16
    # outcomes x 8B = 64 MB per chunk regardless of batch size
    _CHUNK_NNZ = 500_000

    def scores_batch(self, feats_flat: np.ndarray, ptr: np.ndarray) -> np.ndarray:
        """Softmax outcome distributions for a batch of tokens.

        feats_flat: concatenated feature ids of all tokens; ptr: (T+1,)
        segment offsets. Feature ids >= n_features contribute missing_weight
        only (reference guards `feature < indices.size()`). Processed in
        bounded-memory chunks aligned to token boundaries.
        """
        if len(ptr) <= 1:
            return np.zeros((0, self.n_out))
        n_tok = len(ptr) - 1
        out = np.empty((n_tok, self.n_out), dtype=np.float64)
        nf = self.w_adj.shape[0]
        t0 = 0
        while t0 < n_tok:
            # advance token window until the nnz budget is reached
            t1 = int(np.searchsorted(ptr, ptr[t0] + self._CHUNK_NNZ, side="right")) - 1
            if t1 <= t0:
                t1 = t0 + 1
            if t1 > n_tok:
                t1 = n_tok
            seg = feats_flat[ptr[t0] : ptr[t1]]
            safe = np.where(seg < nf, seg, 0)
            gathered = self.w_adj[safe]
            if (seg >= nf).any():
                gathered[seg >= nf] = 0.0
            sub_ptr = (ptr[t0 : t1 + 1] - ptr[t0]).astype(np.int64)
            # reduceat repeats the element when a segment is empty; tokens
            # always carry the omnipresent feature so segments are nonempty.
            sums = np.add.reduceat(gathered, sub_ptr[:-1], axis=0)
            counts = np.diff(sub_ptr).astype(np.float64)
            o = sums + counts[:, None] * self.missing_weight
            if self.hidden_w0 is not None:
                nh = self.hidden_w0.shape[0]
                hsafe = np.where(seg < nh, seg, 0)
                hg = self.hidden_w0[hsafe]
                if (seg >= nh).any():
                    hg[seg >= nh] = 0.0
                hpre = np.add.reduceat(hg, sub_ptr[:-1], axis=0)
                hidden = 1.0 / (1.0 + np.exp(-hpre))
                o += hidden @ self.hidden_w1
            # softmax (network_classifier.cpp:211-217; max-shift for stability)
            o -= o.max(axis=1, keepdims=True)
            np.exp(o, out=o)
            o /= o.sum(axis=1, keepdims=True)
            out[t0:t1] = o
            t0 = t1
        return out

    # --- serialization ----------------------------------------------------
    def to_arrays(self):
        f, o = np.nonzero(self.mask)
        out = {
            "feat": f.astype(np.int64),
            "out": o.astype(np.int64),
            "w_adj": self.w_adj[f, o],
            "shape": np.array(self.w_adj.shape, dtype=np.int64),
            "missing_weight": np.array([self.missing_weight]),
        }
        if self.hidden_w0 is not None:
            out["hidden_w0"] = self.hidden_w0
            out["hidden_w1"] = self.hidden_w1
        return out

    @classmethod
    def from_arrays(cls, arrs, prefix=""):
        shape = tuple(arrs[prefix + "shape"])
        w = np.zeros(shape, dtype=np.float64)
        m = np.zeros(shape, dtype=bool)
        f = arrs[prefix + "feat"]
        o = arrs[prefix + "out"]
        w[f, o] = arrs[prefix + "w_adj"]
        m[f, o] = True
        h0 = arrs[prefix + "hidden_w0"] if prefix + "hidden_w0" in arrs else None
        h1 = arrs[prefix + "hidden_w1"] if prefix + "hidden_w1" in arrs else None
        return cls(w, m, float(arrs[prefix + "missing_weight"][0]), h0, h1)


def fill_bilou_probabilities(outcomes: np.ndarray):
    """Project outcome distributions to per-BILOU (prob, entity).

    outcomes: (T, n_out). Returns local (T,5) float64, ent (T,5) int64.
    First-max wins ties (ascending outcome index, bilou_ner.cpp:113-124).
    """
    T, n = outcomes.shape
    local = np.empty((T, 5), dtype=np.float64)
    ent = np.full((T, 5), ENTITY_UNKNOWN, dtype=np.int64)
    local[:, BILOU_I] = outcomes[:, 0]
    local[:, BILOU_L] = outcomes[:, 1]
    local[:, BILOU_O] = outcomes[:, 2]
    b_cols = outcomes[:, 3::2]
    u_cols = outcomes[:, 4::2]
    local[:, BILOU_B] = b_cols.max(axis=1)
    ent[:, BILOU_B] = b_cols.argmax(axis=1)
    local[:, BILOU_U] = u_cols.max(axis=1)
    ent[:, BILOU_U] = u_cols.argmax(axis=1)
    return local, ent


def _arg_first_max(values, order):
    best = order[0]
    for k in order[1:]:
        if values[k] > values[best]:
            best = k
    return best


def viterbi_decode(local: np.ndarray, ent: np.ndarray):
    """Sequential global update + backtrace.

    local: (T,5) local probabilities, ent: (T,5) local entities.
    Returns best (T,) int (bilou per token) and best_ent (T,) int
    (entity of the chosen global state per token).
    """
    T = local.shape[0]
    glob = np.empty((T, 5), dtype=np.float64)
    gent = np.empty((T, 5), dtype=np.int64)
    prev = np.full((T, 5), -1, dtype=np.int64)

    # init (bilou_probabilities.cpp:15-24)
    glob[0] = local[0]
    gent[0] = ent[0]
    glob[0, BILOU_I] = 0.0
    glob[0, BILOU_L] = 0.0

    for t in range(1, T):
        g = glob[t - 1]
        best_LOU = _arg_first_max(g, (BILOU_L, BILOU_O, BILOU_U))
        best_BI = _arg_first_max(g, (BILOU_B, BILOU_I))
        lou_p = g[best_LOU]
        bi_p = g[best_BI]
        # per-step renormalization (bilou_probabilities.cpp:48-54)
        if bi_p > lou_p:
            lou_p = lou_p / bi_p
            bi_p = 1.0
        else:
            bi_p = bi_p / lou_p if lou_p else 0.0
            lou_p = 1.0

        glob[t, BILOU_B] = lou_p * local[t, BILOU_B]
        gent[t, BILOU_B] = ent[t, BILOU_B]
        prev[t, BILOU_B] = best_LOU

        glob[t, BILOU_I] = bi_p * local[t, BILOU_I]
        gent[t, BILOU_I] = gent[t - 1, best_BI]
        prev[t, BILOU_I] = best_BI

        glob[t, BILOU_L] = bi_p * local[t, BILOU_L]
        gent[t, BILOU_L] = gent[t - 1, best_BI]
        prev[t, BILOU_L] = best_BI

        glob[t, BILOU_O] = lou_p * local[t, BILOU_O]
        gent[t, BILOU_O] = ent[t, BILOU_O]
        prev[t, BILOU_O] = best_LOU

        glob[t, BILOU_U] = lou_p * local[t, BILOU_U]
        gent[t, BILOU_U] = ent[t, BILOU_U]
        prev[t, BILOU_U] = best_LOU

    # backtrace (ner_sentence.cpp:42-55): last word best among L,O,U
    best = np.empty(T, dtype=np.int64)
    best[T - 1] = _arg_first_max(glob[T - 1], (BILOU_L, BILOU_O, BILOU_U))
    for t in range(T - 1, 0, -1):
        best[t - 1] = prev[t, best[t]]

    best_ent = gent[np.arange(T), best]
    return best, best_ent


def viterbi_decode_batch(local: np.ndarray, ent: np.ndarray, lengths: np.ndarray):
    """Lockstep-vectorized viterbi_decode over many sentences.

    local/ent: (N_tokens, 5) concatenated per-sentence rows; lengths: tokens
    per sentence. Sentences are processed in descending-length order so the
    active set at each time step is a contiguous prefix. Identical math and
    tie-breaking to viterbi_decode (parity-tested).

    Returns (best, best_ent) as flat (N_tokens,) arrays in the original
    sentence order.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n_sent = len(lengths)
    if n_sent == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    offsets = np.zeros(n_sent + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    order = np.argsort(-lengths, kind="stable")
    sorted_len = lengths[order]
    starts = offsets[:-1][order]
    max_t = int(sorted_len[0]) if n_sent else 0

    glob = np.empty_like(local)
    gent = np.empty_like(ent)
    prev = np.full(local.shape, -1, dtype=np.int64)

    # init at t=0 for every sentence
    s0 = starts
    glob[s0] = local[s0]
    glob[s0, BILOU_I] = 0.0
    glob[s0, BILOU_L] = 0.0
    gent[s0] = ent[s0]

    # first-max helpers (np.argmax picks the first maximum)
    LOU = np.array([BILOU_L, BILOU_O, BILOU_U])
    BI = np.array([BILOU_B, BILOU_I])

    # number of sentences still active at step t (sorted desc -> prefix)
    for t in range(1, max_t):
        a = int(np.searchsorted(-sorted_len, -(t + 1), side="right"))
        idx = starts[:a] + t
        pidx = idx - 1
        g = glob[pidx]  # (a, 5)

        lou_arg = LOU[np.argmax(g[:, LOU], axis=1)]
        bi_arg = BI[np.argmax(g[:, BI], axis=1)]
        ar = np.arange(a)
        lou_p = g[ar, lou_arg]
        bi_p = g[ar, bi_arg]
        gt = bi_p > lou_p
        with np.errstate(divide="ignore", invalid="ignore"):
            lou_n = np.where(gt, np.where(bi_p != 0, lou_p / bi_p, 0.0), 1.0)
            bi_n = np.where(gt, 1.0, np.where(lou_p != 0, bi_p / lou_p, 0.0))

        loc = local[idx]
        le = ent[idx]
        prev_bi_ent = gent[pidx, bi_arg]

        # one fancy scatter per destination array instead of five: build the
        # full (a, 5) rows first (identical values, fewer index passes)
        g_rows = np.empty((a, 5), dtype=glob.dtype)
        g_rows[:, BILOU_B] = lou_n * loc[:, BILOU_B]
        g_rows[:, BILOU_I] = bi_n * loc[:, BILOU_I]
        g_rows[:, BILOU_L] = bi_n * loc[:, BILOU_L]
        g_rows[:, BILOU_O] = lou_n * loc[:, BILOU_O]
        g_rows[:, BILOU_U] = lou_n * loc[:, BILOU_U]
        glob[idx] = g_rows

        e_rows = np.empty((a, 5), dtype=gent.dtype)
        e_rows[:, BILOU_B] = le[:, BILOU_B]
        e_rows[:, BILOU_I] = prev_bi_ent
        e_rows[:, BILOU_L] = prev_bi_ent
        e_rows[:, BILOU_O] = le[:, BILOU_O]
        e_rows[:, BILOU_U] = le[:, BILOU_U]
        gent[idx] = e_rows

        p_rows = np.empty((a, 5), dtype=prev.dtype)
        p_rows[:, BILOU_B] = lou_arg
        p_rows[:, BILOU_I] = bi_arg
        p_rows[:, BILOU_L] = bi_arg
        p_rows[:, BILOU_O] = lou_arg
        p_rows[:, BILOU_U] = lou_arg
        prev[idx] = p_rows

    # backtrace: last-token best among L,O,U, then follow prev[]
    best = np.empty(len(local), dtype=np.int64)
    last = starts + sorted_len - 1
    g_last = glob[last]
    best[last] = LOU[np.argmax(g_last[:, LOU], axis=1)]
    for t in range(max_t - 1, 0, -1):
        a = int(np.searchsorted(-sorted_len, -(t + 1), side="right"))
        idx = starts[:a] + t
        best[idx - 1] = prev[idx, best[idx]]

    best_ent = gent[np.arange(len(local)), best]
    return best, best_ent


def extract_entities(best: np.ndarray, best_ent: np.ndarray):
    """BILOU path -> (start, length, entity_id) spans (bilou_ner.cpp:80-87)."""
    T = len(best)
    out = []
    i = 0
    while i < T:
        if best[i] == BILOU_U:
            out.append((i, 1, int(best_ent[i])))
        elif best[i] == BILOU_B:
            start = i
            i += 1
            while i < T and best[i] != BILOU_L:
                i += 1
            out.append((start, i - start + (1 if i < T else 0), int(best_ent[start])))
        i += 1
    return out


def extract_entities_batch(best: np.ndarray, best_ent: np.ndarray, sent_start: np.ndarray):
    """extract_entities over a flat batch: best/best_ent are concatenated
    per-sentence decode rows, sent_start the (n_sent+1,) segment offsets.
    Returns a list of per-sentence span lists, each identical to
    extract_entities on that sentence's slice (bilou_ner.cpp:80-87) — but
    touching only the B/U candidate positions instead of every token."""
    n_sent = len(sent_start) - 1
    results = [[] for _ in range(n_sent)]
    T = len(best)
    if T == 0:
        return results
    cand = np.flatnonzero((best == BILOU_U) | (best == BILOU_B))
    if len(cand) == 0:
        return results
    # next L at position >= i (global; sentence bound applied per candidate)
    pos = np.arange(T, dtype=np.int64)
    idx = np.where(best == BILOU_L, pos, T)
    next_l = np.minimum.accumulate(idx[::-1])[::-1]
    sent_of = np.searchsorted(sent_start, cand, side="right") - 1
    starts = sent_start[sent_of]
    ends = sent_start[sent_of + 1]
    bvals = best[cand]
    evals = best_ent[cand]
    nl = next_l[cand]
    ptr = -1  # flat position where the previous B..L span ended (exclusive)
    for j in range(len(cand)):
        i = int(cand[j])
        if i < ptr:
            continue
        res = results[sent_of[j]]
        s0 = int(starts[j])
        if bvals[j] == BILOU_U:
            res.append((i - s0, 1, int(evals[j])))
        else:
            e = int(nl[j])
            end = int(ends[j])
            if e >= end:  # no L before sentence end: span runs to the end
                res.append((i - s0, end - i, int(evals[j])))
                ptr = end
            else:
                res.append((i - s0, e - i + 1, int(evals[j])))
                ptr = e + 1
    return results


def sort_entities(entities):
    """Order by (start asc, length desc) — outermost-first for nested output
    (/root/reference/src/run_ner.cpp:174-184)."""
    return sorted(entities, key=lambda e: (e[0], -e[1]))
