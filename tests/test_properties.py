"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nametag_spark.ner import core
from nametag_spark.tokenizer.rules import tokenize_sentences

text_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Ps", "Pe"),
        whitelist_characters="\n\t.'!?-@:/,",
    ),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenizer_spans_are_valid_and_disjoint(text):
    prev_end = -1
    for sent in tokenize_sentences(text):
        assert sent, "empty sentence emitted"
        for (s, l) in sent:
            assert l >= 1
            assert 0 <= s and s + l <= len(text)
            assert s >= prev_end, f"overlap at {s} (prev end {prev_end})"
            prev_end = s + l
            # spans never contain whitespace-only content
            assert text[s : s + l].strip() == text[s : s + l]


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenizer_covers_all_nonspace(text):
    import unicodedata

    covered = set()
    for sent in tokenize_sentences(text):
        for (s, l) in sent:
            covered.update(range(s, s + l))
    for i, c in enumerate(text):
        is_ws = c in "\r\t\n" or unicodedata.category(c) == "Zs"
        if not is_ws:
            assert i in covered, f"char {i} ({c!r}) not covered"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(0.001, 1.0), st.floats(0.001, 1.0), st.floats(0.001, 1.0),
                  st.floats(0.001, 1.0), st.floats(0.001, 1.0)),
        min_size=1,
        max_size=12,
    )
)
def test_batch_viterbi_matches_sequential(rows):
    local = np.array(rows, dtype=np.float64)
    ent = np.arange(local.size, dtype=np.int64).reshape(local.shape) % 3
    b1, e1 = core.viterbi_decode(local, ent)
    b2, e2 = core.viterbi_decode_batch(local, ent, np.array([len(rows)]))
    assert list(b1) == list(b2)
    assert list(e1) == list(e2)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(1, 9), min_size=2, max_size=40
    )
)
def test_batch_viterbi_many_sentences(lengths):
    rng = np.random.RandomState(7)
    locals_ = [rng.rand(n, 5) for n in lengths]
    ents = [rng.randint(0, 4, size=(n, 5)) for n in lengths]
    exp_b, exp_e = [], []
    for lo, en in zip(locals_, ents):
        b, e = core.viterbi_decode(lo, en)
        exp_b.extend(b)
        exp_e.extend(e)
    b2, e2 = core.viterbi_decode_batch(
        np.concatenate(locals_), np.concatenate(ents), np.array(lengths)
    )
    assert list(b2) == exp_b
    assert list(e2) == exp_e


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["O", "_", "B-PER", "I-PER", "B-ORG", "I-ORG"]), min_size=1, max_size=20))
def test_bio_to_bilou_legal_sequences(labels):
    from nametag_spark.features.templates import EntityMap
    from nametag_spark.train.trainer import bio_to_outcomes

    em = EntityMap()
    outcomes = bio_to_outcomes(labels, em, add_entities=True)
    # outcome codes are structurally valid
    n = 3 + 2 * len(em)
    assert all(0 <= o < n for o in outcomes)
    # every B (3+2e) is eventually followed by I* then L before next B/O/U —
    # at minimum: a B is never the last token unless... (B requires has_next)
    for i, o in enumerate(outcomes):
        if o >= 3 and (o - 3) % 2 == 0:  # B code
            assert i + 1 < len(outcomes), "B cannot be sentence-final"


@settings(max_examples=150, deadline=None)
@given(text_strategy, st.sampled_from(["cs", "generic"]))
def test_cs_generic_tokenizer_same_invariants(text, lang):
    """The Czech/generic grammars keep the span invariants: valid ordered
    non-overlapping spans covering every non-space char."""
    import unicodedata

    prev_end = -1
    covered = set()
    for sent in tokenize_sentences(text, lang):
        assert sent
        for (s, l) in sent:
            assert l >= 1 and 0 <= s and s + l <= len(text)
            assert s >= prev_end
            prev_end = s + l
            covered.update(range(s, s + l))
            assert text[s : s + l].strip() == text[s : s + l]
    for i, c in enumerate(text):
        if not (c in "\r\t\n" or unicodedata.category(c) == "Zs"):
            assert i in covered


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_url_detector_invariants(text):
    """detect_url_email: end is in-range and past the start; the matched
    prefix re-detects to the same (kind, end) — the longest-match property
    makes detection stable under truncation to its own match."""
    from nametag_spark.tokenizer.rules import detect_url_email

    for i in range(0, min(len(text), 40)):
        d = detect_url_email(text, i)
        if d is None:
            continue
        kind, end = d
        assert kind in ("URL", "EMAIL")
        assert i < end <= len(text)
        again = detect_url_email(text[:end], i)
        assert again == (kind, end)


_MD_TAGGERS = None


def _md_taggers():
    global _MD_TAGGERS
    if _MD_TAGGERS is None:
        import os

        from nametag_spark.morpho.morphodita import MorphoditaTagger

        fix = os.path.join(os.path.dirname(__file__), "..", "fixtures", "morphodita")
        _MD_TAGGERS = [
            MorphoditaTagger.load(os.path.join(fix, n))
            for n in ("tiny.tagger", "tiny_cs.tagger", "tiny_en.tagger", "tiny_cu.tagger")
        ]
    return _MD_TAGGERS


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm", "Sc"),
                whitelist_characters=".,-'0123456789čďěňřšťžáéíóúýůİß",
            ),
            min_size=1,
            max_size=20,
        ),
        max_size=15,
    )
)
def test_morphodita_tag_total_on_arbitrary_forms(forms):
    """All four tagger families (generic/czech/english/conllu) must tag ANY
    form list totally: one (lemma, tag) per input token, non-empty lemma
    and tag (unknown forms fall through guessers to the unknown tag), and
    ner_tag_sentence fills every field."""
    for t in _md_taggers():
        out = t.tag(forms)
        assert len(out) == len(forms)
        for lemma, tag in out:
            assert isinstance(lemma, str) and isinstance(tag, str) and tag
        info = t.ner_tag_sentence(forms)
        assert len(info) == len(forms)
        for w in info:
            assert set(w) == {"form", "raw_lemma", "lemma_id", "lemma_comments", "tag", "raw_lemmas_all"}
