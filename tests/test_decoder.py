"""Hand-computed goldens for the classification/decoding core (SURVEY.md §2.6).

These replicate the cited reference math on tiny examples computed by hand:
  - fill_bilou_probabilities (bilou_ner.cpp:113-124)
  - the renormalized sequential DP (bilou_probabilities.cpp:15-81)
  - backtrace (ner_sentence.cpp:42-55) and extraction (bilou_ner.cpp:80-87)
"""

import numpy as np
import pytest

from nametag_spark.ner import core


def test_fill_bilou_probabilities():
    # 2 entity types -> outcomes I,L,O,B0,U0,B1,U1
    out = np.array([[0.05, 0.1, 0.2, 0.3, 0.05, 0.25, 0.05]])
    local, ent = core.fill_bilou_probabilities(out)
    # B = max(B0,B1) = 0.3 at entity 0; U = max(U0,U1) = 0.05 tie -> first (entity 0)
    assert local[0, core.BILOU_B] == pytest.approx(0.3)
    assert ent[0, core.BILOU_B] == 0
    assert local[0, core.BILOU_U] == pytest.approx(0.05)
    assert ent[0, core.BILOU_U] == 0  # strict > keeps the first max
    assert local[0, core.BILOU_I] == pytest.approx(0.05)
    assert ent[0, core.BILOU_I] == core.ENTITY_UNKNOWN


def test_init_zeroes_I_and_L():
    local = np.array([[0.2, 0.9, 0.9, 0.3, 0.4]])
    ent = np.zeros((1, 5), dtype=np.int64)
    best, best_ent = core.viterbi_decode(local, ent)
    # At the single word, best of L,O,U with I,L zeroed: O=0.3 vs U=0.4 -> U
    assert best[0] == core.BILOU_U


def test_dp_hand_example():
    """Two tokens. Hand-computed per bilou_probabilities.cpp:26-81.

    t0 local: B=.6 I=.9 L=.9 O=.3 U=.1 -> glob0 = B=.6 I=0 L=0 O=.3 U=.1
    t1 update:
      best_LOU = max(L=0,O=.3,U=.1) -> O (.3); best_BI = max(B=.6,I=0) -> B (.6)
      BI > LOU: lou_p = .3/.6 = .5, bi_p = 1
      t1 local: B=.1 I=.2 L=.7 O=.3 U=.2
      glob1: B=.5*.1=.05  I=1*.2=.2  L=1*.7=.7  O=.5*.3=.15  U=.5*.2=.1
      last-word best among L,O,U -> L (.7); prev[L]=B -> path B,L
    """
    local = np.array(
        [
            [0.6, 0.9, 0.9, 0.3, 0.1],
            [0.1, 0.2, 0.7, 0.3, 0.2],
        ]
    )
    ent = np.array([[2, -1, -1, -1, 1], [0, -1, -1, -1, 1]])
    best, best_ent = core.viterbi_decode(local, ent)
    assert list(best) == [core.BILOU_B, core.BILOU_L]
    # entity of the B..L span comes from the B position's local entity
    assert best_ent[0] == 2
    # I/L inherit the entity of the best previous BI state (B at t0, entity 2)
    assert best_ent[1] == 2


def test_extract_entities_b_without_l_extends_to_end():
    # B then never L: length = i - start + (i < size) = size - start
    best = np.array([core.BILOU_B, core.BILOU_I, core.BILOU_I])
    ents = np.array([1, 1, 1])
    spans = core.extract_entities(best, ents)
    assert spans == [(0, 3, 1)]


def test_extract_entities_u_and_bl():
    best = np.array([core.BILOU_U, core.BILOU_O, core.BILOU_B, core.BILOU_I, core.BILOU_L])
    ents = np.array([3, -1, 2, 2, 2])
    spans = core.extract_entities(best, ents)
    assert spans == [(0, 1, 3), (2, 3, 2)]


def test_sort_entities_outermost_first():
    assert core.sort_entities([(2, 1, "a"), (0, 3, "b"), (0, 1, "c")]) == [
        (0, 3, "b"),
        (0, 1, "c"),
        (2, 1, "a"),
    ]


def test_classifier_missing_weight_math():
    """network_classifier.cpp:181-187: out[o] = |F|*mw + sum present (w-mw)."""
    mask = np.zeros((4, 3), dtype=bool)
    w_adj = np.zeros((4, 3))
    # feature 1 trained with outcome 0 (w=0.5), feature 2 with outcome 2 (w=-0.3)
    mw = -0.2
    mask[1, 0] = True
    w_adj[1, 0] = 0.5 - mw
    mask[2, 2] = True
    w_adj[2, 2] = -0.3 - mw
    net = core.Network(w_adj, mask, mw)
    feats = np.array([0, 1, 2])  # token with 3 features (0 untrained)
    probs = net.scores_batch(feats, np.array([0, 3]))
    raw = np.array(
        [
            3 * mw + (0.5 - mw),
            3 * mw,
            3 * mw + (-0.3 - mw),
        ]
    )
    expect = np.exp(raw - raw.max())
    expect /= expect.sum()
    assert np.allclose(probs[0], expect)


def test_classifier_out_of_range_feature():
    # stage-2 features unseen by stage-1 network contribute missing_weight only
    mask = np.ones((2, 2), dtype=bool)
    w_adj = np.ones((2, 2))
    net = core.Network(w_adj, mask, -0.5)
    probs = net.scores_batch(np.array([0, 99]), np.array([0, 2]))
    raw = np.array([2 * -0.5 + 1.0, 2 * -0.5 + 1.0])
    assert np.allclose(probs[0], [0.5, 0.5])


def test_extract_entities_batch_matches_per_sentence():
    """Flat-batch extraction is positionally identical to per-sentence
    extract_entities for every BILOU/entity combination (randomized)."""
    import random

    rng = random.Random(7)
    for _trial in range(500):
        n_sent = rng.randint(1, 6)
        lens = [rng.randint(1, 9) for _ in range(n_sent)]
        ss = np.zeros(n_sent + 1, dtype=np.int64)
        np.cumsum(lens, out=ss[1:])
        T = int(ss[-1])
        best = np.array([rng.randint(0, 4) for _ in range(T)], dtype=np.int64)
        ent = np.array([rng.randint(-1, 3) for _ in range(T)], dtype=np.int64)
        got = core.extract_entities_batch(best, ent, ss)
        for k in range(n_sent):
            a, b = ss[k], ss[k + 1]
            assert got[k] == core.extract_entities(best[a:b], ent[a:b])
