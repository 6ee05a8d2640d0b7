"""Parity tests for the MorphoDiTa .tagger reader/runtime
(nametag_spark/morpho/morphodita.py) against goldens produced by the
UNMODIFIED compiled reference (scripts/ref_tools/morpho_tools.cpp drives the
reference's own encoder/trainer/runtime; see fixtures/morphodita/)."""

import io
import os
import pickle

import pytest

from nametag_spark.model.binary_reader import load_binary_ner, BinaryFormatError
from nametag_spark.morpho.morphodita import (
    GUESSER,
    NO_GUESSER,
    MorphoditaTagger,
)

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "morphodita")


def _blocks(path, split=True):
    blocks, cur = [], []
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        if not line:
            if cur:
                blocks.append(cur)
            cur = []
        else:
            cur.append(line.split("\t") if split else line)
    if cur:
        blocks.append(cur)
    return blocks


@pytest.fixture(scope="module")
def tagger():
    return MorphoditaTagger.load(os.path.join(FIX, "tiny.tagger"))


def test_load_metadata(tagger):
    assert tagger.tagger_family == "generic"
    assert tagger.decoding_order == 2
    assert tagger.window_size == 2
    assert tagger.use_guesser is True
    assert tagger.morpho.unknown_tag == "UNK"
    assert tagger.morpho.number_tag == "CD"
    assert tagger.morpho.statistical_guesser is not None


@pytest.mark.parametrize("mode,golden", [
    (GUESSER, "analyze_golden_guesser.tsv"),
    (NO_GUESSER, "analyze_golden_noguesser.tsv"),
])
def test_analyze_parity(tagger, mode, golden):
    """morpho::analyze output — values AND order — matches the reference."""
    forms = [l.strip() for l in open(os.path.join(FIX, "analyze_input.txt"), encoding="utf-8")]
    want_blocks = _blocks(os.path.join(FIX, golden))
    assert len(forms) == len(want_blocks)
    for form, block in zip(forms, want_blocks):
        mine = tagger.morpho.analyze(form, mode)
        want = [(r[1], r[2]) for r in block]
        assert mine == want, form


def test_tag_parity(tagger):
    """Full viterbi decode matches the reference tagger on every sentence
    (dictionary disambiguation in context, guesser lemmas, specials)."""
    sents = [[r[0] for r in b] for b in _blocks(os.path.join(FIX, "tag_input.txt"))]
    golden = _blocks(os.path.join(FIX, "tag_golden.tsv"))
    assert len(sents) == len(golden)
    for forms, gold in zip(sents, golden):
        assert tagger.tag(forms) == [(r[1], r[2]) for r in gold]


def test_ner_model_parity():
    """A .ner with an embedded MorphoDiTa tagger loads and decodes exactly
    like the reference run_ner (fixtures/morphodita/ner_golden_vertical.txt,
    reference vertical ids advance by one extra per sentence break)."""
    model = load_binary_ner(os.path.join(FIX, "tiny_md.ner"))
    assert type(model.tagger).__name__ == "MorphoditaTagger"
    sents = [b for b in _blocks(os.path.join(FIX, "ner_input.txt"), split=False)]
    golden = [
        l.rstrip("\n").split("\t")
        for l in open(os.path.join(FIX, "ner_golden_vertical.txt"), encoding="utf-8")
        if l.strip()
    ]
    mine = []
    tok = 1
    for forms in sents:
        for (start, length, typ) in model.recognize_sentence(forms):
            ids = ",".join(str(tok + start + k) for k in range(length))
            mine.append([ids, typ, " ".join(forms[start : start + length])])
        tok += len(forms) + 1
    assert mine == golden


def test_pickle_roundtrip(tagger):
    t2 = pickle.loads(pickle.dumps(tagger))
    forms = ["the", "books", "ran", "quickly"]
    assert t2.tag(forms) == tagger.tag(forms)


def test_state_roundtrip(tagger):
    t2 = MorphoditaTagger.from_state(tagger.state())
    assert t2.tag(["I", "book", "flights"]) == tagger.tag(["I", "book", "flights"])


def test_ner_model_save_load_roundtrip(tmp_path):
    """NerModel.save/load preserves the embedded MorphoDiTa tagger."""
    model = load_binary_ner(os.path.join(FIX, "tiny_md.ner"))
    model.save(str(tmp_path / "m"))
    from nametag_spark.model.model import NerModel

    m2 = NerModel.load(str(tmp_path / "m"))
    forms = ["Alice", "saw", "Prahy", "."]
    assert m2.recognize_sentence(forms) == model.recognize_sentence(forms)
    assert type(m2.tagger).__name__ == "MorphoditaTagger"


def test_trailing_bytes_rejected(tagger):
    with pytest.raises(BinaryFormatError):
        MorphoditaTagger.from_bytes(tagger.raw_bytes + b"\x00")


def test_raw_lemmas_all_sorted_unique(tagger):
    info = tagger.ner_tag_sentence(["books"])
    assert info[0]["raw_lemmas_all"] == ["book"]
    assert info[0]["tag"] in ("NNS", "VBZ")
    assert info[0]["lemma_comments"] == ""


# ---------------------------------------------------------------- czech
@pytest.fixture(scope="module")
def cs_tagger():
    return MorphoditaTagger.load(os.path.join(FIX, "tiny_cs.tagger"))


def test_cs_load_metadata(cs_tagger):
    assert cs_tagger.tagger_family == "czech"
    m = cs_tagger.morpho
    assert type(m).__name__ == "CzechMorpho"
    assert m.unknown_tag == "X@---"  # truncated to max_tag_length=5
    assert m.prefix_guesser is not None and m.statistical_guesser is not None


@pytest.mark.parametrize("mode,golden", [
    (GUESSER, "analyze_golden_cs_guesser.tsv"),
    (NO_GUESSER, "analyze_golden_cs_noguesser.tsv"),
])
def test_cs_analyze_parity(cs_tagger, mode, golden):
    """Czech morpho analyze parity: PDT lemma addinfo formatting (homonym
    numbers, _;X comments), prefix guesser (ne-/nej-), statistical guesser,
    czech punctuation tables, casing variants — values AND order."""
    forms = [l.strip() for l in open(os.path.join(FIX, "analyze_input_cs.txt"), encoding="utf-8")]
    want_blocks = _blocks(os.path.join(FIX, golden))
    for form, block in zip(forms, want_blocks):
        assert cs_tagger.morpho.analyze(form, mode) == [(r[1], r[2]) for r in block], form


def test_cs_tag_parity(cs_tagger):
    sents = [[r[0] for r in b] for b in _blocks(os.path.join(FIX, "tag_input_cs.txt"))]
    golden = _blocks(os.path.join(FIX, "tag_golden_cs.tsv"))
    for forms, gold in zip(sents, golden):
        assert cs_tagger.tag(forms) == [(r[1], r[2]) for r in gold]


def test_cs_lemma_addinfo(cs_tagger):
    """czech_lemma_addinfo raw/id splits on decoded lemmas."""
    info = cs_tagger.ner_tag_sentence(["stát", "je", "Novák"])
    # viterbi picks a reading of stát; raw lemma strips both -N and _;X
    assert info[0]["raw_lemma"] == "stát"
    assert info[2]["raw_lemma"] == "Novák"
    assert info[2]["lemma_comments"] == "_;S"
    assert info[2]["lemma_id"] == "Novák"
    # homonym number belongs to the lemma id but not the raw lemma
    from nametag_spark.morpho.morphodita import _czech_lemma_id_len, _czech_raw_lemma_len

    assert _czech_raw_lemma_len("stát-1_;K") == len("stát")
    assert _czech_lemma_id_len("stát-1_;K") == len("stát-1")


def _decode_all(model, path):
    sents = [b for b in _blocks(path, split=False)]
    out = []
    for sid, forms in enumerate(sents, 1):
        for (start, length, typ) in model.recognize_sentence(forms):
            out.append((sid, start, length, typ))
    return out


def test_cs_ner_parity_hard_gazetteers_and_lemma_term():
    """D2/D3/F8 end-to-end vs the reference: tiny_cs.ner carries hard_pre
    (Novák->PER), hard_post (stát->LOC) and CzechLemmaTerm features; decode
    must match run_ner exactly."""
    model = load_binary_ner(os.path.join(FIX, "tiny_cs.ner"))
    got = _decode_all(model, os.path.join(FIX, "ner_input_cs.txt"))
    assert got == [
        (1, 0, 1, "PER"), (1, 2, 1, "PER"), (1, 4, 1, "LOC"),
        (2, 0, 1, "LOC"),
        (3, 2, 1, "LOC"),
        (4, 0, 1, "PER"),
        (5, 0, 1, "PER"), (5, 2, 1, "PER"), (5, 3, 1, "LOC"),
    ]


def test_cs_hard_lists_change_decoding():
    """Removing the hard_pre/hard_post lists from the loaded model changes
    the decoded entities (proves D2/D3 are live constraints, not inert)."""
    model = load_binary_ner(os.path.join(FIX, "tiny_cs.ner"))
    with_hard = _decode_all(model, os.path.join(FIX, "ner_input_cs.txt"))

    stripped = load_binary_ner(os.path.join(FIX, "tiny_cs.ner"))
    for proc in stripped.templates.processors:
        if type(proc).__name__ == "GazetteersEnhanced":
            kept = [l for l in proc.lists if l["mode"] == proc.SOFT]
            assert len(kept) < len(proc.lists)
            proc.lists = kept
            proc._build_trie()
    without_hard = _decode_all(stripped, os.path.join(FIX, "ner_input_cs.txt"))
    assert with_hard != without_hard
    # specifically: the hard_post "stát" -> LOC override is gone
    assert (2, 0, 1, "LOC") in with_hard
    assert (2, 0, 1, "LOC") not in without_hard


def test_morpho_specials(tagger):
    m = tagger.morpho
    assert m.analyze("3,14", GUESSER) == [("3,14", "CD")]
    assert m.analyze("12.", GUESSER) == [("12.", "CD")]
    assert m.analyze("...", GUESSER) == [("...", "PUNCT")]
    assert m.analyze("+", GUESSER) == [("+", "SYM")]
    # guesser rules
    assert m.analyze("walking", GUESSER)[0] == ("walk", "VBG")
    # non-ascii OOV goes through the guesser without crashing
    assert m.analyze("čajing", GUESSER)


# ---------------------------------------------------------------- english
@pytest.fixture(scope="module")
def en_tagger():
    return MorphoditaTagger.load(os.path.join(FIX, "tiny_en.tagger"))


def test_en_load_metadata(en_tagger):
    m = en_tagger.morpho
    assert type(m).__name__ == "EnglishMorpho"
    assert m.version == 3
    assert m.guesser.exceptions and m.guesser.negations


@pytest.mark.parametrize("mode,golden", [
    (GUESSER, "fuzz_en_golden_guesser.tsv"),
    (NO_GUESSER, "fuzz_en_golden_noguesser.tsv"),
])
def test_en_analyze_fuzz_parity(en_tagger, mode, golden):
    """4,474-word fuzz corpus (dictionary, exceptions, negation prefixes,
    every rule machine, numbers/punct/symbols, unicode, letter soup):
    morpho analyze must be value- AND order-exact vs the compiled
    reference (37k analysis rows)."""
    forms = [l.rstrip("\n") for l in open(os.path.join(FIX, "fuzz_en_words.txt"), encoding="utf-8")]
    want_blocks = _blocks(os.path.join(FIX, golden))
    assert len(forms) == len(want_blocks)
    bad = []
    for form, block in zip(forms, want_blocks):
        mine = en_tagger.morpho.analyze(form, mode)
        want = [(r[1], r[2]) for r in block]
        if mine != want:
            bad.append((form, mine, want))
    assert not bad, bad[:5]


def test_en_tag_parity(en_tagger):
    sents = [[r[0] for r in b] for b in _blocks(os.path.join(FIX, "tag_input_en.txt"))]
    golden = _blocks(os.path.join(FIX, "tag_golden_en.tsv"))
    for forms, gold in zip(sents, golden):
        assert en_tagger.tag(forms) == [(r[1], r[2]) for r in gold]


def test_en_ner_parity():
    model = load_binary_ner(os.path.join(FIX, "tiny_en.ner"))
    got = _decode_all(model, os.path.join(FIX, "ner_input_en.txt"))
    assert got == [
        (1, 0, 2, "PER"), (1, 4, 1, "LOC"),
        (2, 3, 1, "LOC"), (2, 5, 1, "LOC"),
        (3, 0, 2, "PER"),
    ]


def test_en_lemma_addinfo():
    from nametag_spark.morpho.morphodita import _english_raw_lemma_len

    assert _english_raw_lemma_len("good^well") == 4
    assert _english_raw_lemma_len("do+") == 2
    assert _english_raw_lemma_len("x^") == 1
    assert _english_raw_lemma_len("a^b-c") == 1
    assert _english_raw_lemma_len("a^1") == 3  # digit after ^ -> not addinfo
    assert _english_raw_lemma_len("^x") == 2  # first position never splits


# ---------------------------------------------------------------- conllu
def test_conllu_tag_parity():
    """CONLLU2 tagger family: tag-string field parsing (UPos + named
    Case/Gender/Number/Negative/Person fields), verb detection at tag[1],
    FollowingVerbForm/PreviousVerbForm dynamic features — decode parity vs
    the reference on the committed fixture."""
    t = MorphoditaTagger.load(os.path.join(FIX, "tiny_cu.tagger"))
    assert t.tagger_family == "conllu"
    sents = [[r[0] for r in b] for b in _blocks(os.path.join(FIX, "tag_input_cu.txt"))]
    golden = _blocks(os.path.join(FIX, "tag_golden_cu.tsv"))
    assert len(sents) == len(golden)
    for forms, gold in zip(sents, golden):
        assert t.tag(forms) == [(r[1], r[2]) for r in gold]


def test_conllu_analyze_parity():
    t = MorphoditaTagger.load(os.path.join(FIX, "tiny_cu.tagger"))
    golden = _blocks(os.path.join(FIX, "analyze_golden_cu.tsv"))
    forms = ["pes", "psa", "vidí", "neznámé", "42", "malá"]
    for form, block in zip(forms, golden):
        assert t.morpho.analyze(form, GUESSER) == [(r[1], r[2]) for r in block], form


# --------------------------------------------------------------------------
# Derivator (morpho id 7 — DeriNet graph wrapping a czech dictionary)
# --------------------------------------------------------------------------
def test_derivator_parity():
    """DerivatorDictionary parity: tiny_cs_deriv.dict is the czech tiny
    dictionary wrapped by the reference's own derivator_dictionary_encoder
    (fixtures/morphodita/derinet_cs.tsv); derivator_golden_cs.tsv is the
    compiled reference's derivator::parent/children output on the queries in
    derivator_input_cs.txt — lemma-id truncation, comment re-append, and the
    reference's child ordering all covered."""
    from nametag_spark.morpho.morphodita import load_morpho

    with open(os.path.join(FIX, "tiny_cs_deriv.dict"), "rb") as f:
        m = load_morpho(f)
        assert not f.read(), "trailing bytes after derivator-wrapped morpho"
    assert m.kind == "czech" and m.derinet is not None
    assert m.derinet.dictionary is m

    queries = [l.strip() for l in open(os.path.join(FIX, "derivator_input_cs.txt"), encoding="utf-8") if l.strip()]
    golden = {}  # lemma -> {"parent": str, "children": [..]}
    for line in open(os.path.join(FIX, "derivator_golden_cs.tsv"), encoding="utf-8"):
        parts = line.rstrip("\n").split("\t")
        ent = golden.setdefault(parts[0], {})
        if parts[1] == "parent":
            ent["parent"] = parts[2] if len(parts) > 2 else ""
        else:
            ent["children"] = parts[2:]
    assert len(golden) == len(queries)
    for q in queries:
        assert (m.derinet.parent(q) or "") == golden[q]["parent"], q
        assert m.derinet.children(q) == golden[q]["children"], q

    # the wrapped morpho is unchanged: analysis equals the plain dictionary's
    with open(os.path.join(FIX, "tiny_cs.dict"), "rb") as f:
        plain = load_morpho(f)
    for form in ("pila", "Novák", "stát", "nejneznámější", "3,14"):
        assert m.analyze(form, GUESSER) == plain.analyze(form, GUESSER), form


def test_model_driven_tokenizer_selection():
    """bilou_ner::new_tokenizer parity (src/ner/bilou_ner.cpp:126-137):
    loading a CZECH .ner and recognizing raw text WITHOUT passing lang must
    tokenize with the czech grammar and reproduce the compiled reference
    run_ner's conll byte-for-byte (fixtures/morphodita/
    model_tokenizer_golden_cs.conll = run_ner on the same texts as
    paragraphs). The texts discriminate: the english grammar splits
    clitics ('s, n't, cannot) and breaks sentences after 'p.', so a wrong
    default would fail."""
    from nametag_spark.model.binary_reader import load_binary_ner
    from nametag_spark.ner.pipeline import _BatchRecognizer
    from nametag_spark.tokenizer.rules import tokenize_sentences
    from nametag_spark.sinks.render import render_conll

    m = load_binary_ner(os.path.join(FIX, "tiny_cs.ner"))
    assert m.ner_lang == "czech"
    assert m.default_tokenizer_lang == "cs"
    texts = [
        l.rstrip("\n")
        for l in open(os.path.join(FIX, "model_tokenizer_input_cs.txt"), encoding="utf-8")
        if l.strip()
    ]
    rec = _BatchRecognizer(m)
    out = []
    for t in texts:
        spans = tokenize_sentences(t, m.default_tokenizer_lang)
        forms = [[t[a : a + b] for (a, b) in s] for s in spans]
        ents = rec.recognize_batch([m.make_sentence(f) for f in forms])
        out.append(render_conll(forms, ents))
    golden = open(os.path.join(FIX, "model_tokenizer_golden_cs.conll"), encoding="utf-8").read()
    assert "".join(out) == golden
    # the en grammar provably differs on these texts (the test discriminates)
    out_en = []
    for t in texts:
        spans = tokenize_sentences(t, "en")
        forms = [[t[a : a + b] for (a, b) in s] for s in spans]
        ents = rec.recognize_batch([m.make_sentence(f) for f in forms])
        out_en.append(render_conll(forms, ents))
    assert "".join(out_en) != golden


def test_recognize_local_model_driven_default():
    """recognize_local with no lang uses the model tokenizer (czech here):
    'Pan p. Novák je tu.' stays one sentence (p. is a czech abbreviation)."""
    from nametag_spark.model.binary_reader import load_binary_ner
    from nametag_spark.ner.pipeline import recognize_local

    m = load_binary_ner(os.path.join(FIX, "tiny_cs.ner"))
    auto = recognize_local(m, ["Pan p. Novák je tu."])
    explicit = recognize_local(m, ["Pan p. Novák je tu."], lang="cs")
    assert auto == explicit
    assert any(mn["sent_idx"] == 0 for mn in auto[0])


def test_tagset_converters_and_derivation_formatters():
    """All 5 tagset converters x 4 derivation formatters vs the compiled
    reference (fixtures/morphodita/tagset_convert_golden_cs.tsv =
    morpho_tools `convert` over every combo on the 400-lemma fuzz czech
    dict + derivator forest, guesser on): format_tagged_lemmas output must
    match exactly, including the conditional-vs-unconditional dedup rules
    (none-formatter defers to the converter's convert_analyzed; derivating
    formatters always unique when >1) and the tree/path lemma strings."""
    import collections
    import itertools

    from nametag_spark.morpho.morphodita import load_morpho, GUESSER
    from nametag_spark.morpho.convert import (
        IdentityConverter,
        new_derivation_formatter,
        new_tagset_converter,
    )

    with open(os.path.join(FIX, "fuzz_cs_deriv.dict"), "rb") as f:
        m = load_morpho(f)
    golden = collections.defaultdict(list)
    forms_in_golden = []
    seen = set()
    with open(os.path.join(FIX, "tagset_convert_golden_cs.tsv"), encoding="utf-8") as f:
        for line in f:
            c, fm, form, lemma, tag = line.rstrip("\n").split("\t")
            golden[(c, fm, form)].append((lemma, tag))
            if form not in seen:
                seen.add(form)
                forms_in_golden.append(form)
    convs = ["none", "identity", "pdt_to_conll2009", "strip_lemma_id", "strip_lemma_comment"]
    fmts = ["none", "root", "path", "tree"]
    for c, fm in itertools.product(convs, fmts):
        conv = (
            IdentityConverter()
            if c == "identity"
            else (new_tagset_converter(c, m) if c != "none" else None)
        )
        fmtr = new_derivation_formatter(fm, m.derinet)
        for form in forms_in_golden:
            got = fmtr.format_tagged_lemmas(m.analyze(form, GUESSER), conv)
            assert got == golden[(c, fm, form)], (c, fm, form)


def test_derivation_formatter_scalar_api():
    """format_derivation / new_* factories (derivation_formatter.cpp
    contracts): none is a no-op, root climbs to the forest root, factories
    return None without a derivator (reference returns nullptr)."""
    from nametag_spark.morpho.morphodita import load_morpho
    from nametag_spark.morpho.convert import new_derivation_formatter

    with open(os.path.join(FIX, "fuzz_cs_deriv.dict"), "rb") as f:
        m = load_morpho(f)
    root_f = new_derivation_formatter("root", m.derinet)
    none_f = new_derivation_formatter("none", m.derinet)
    lemma = next(iter(m.derinet.parent_map))
    assert none_f.format_derivation(lemma) == lemma
    climbed = root_f.format_derivation(lemma)
    assert m.derinet.parent(climbed) is None
    assert new_derivation_formatter("root", None) is None
    assert new_derivation_formatter("bogus", m.derinet) is None


def test_morpho_generate_parity():
    """Dictionary GENERATION (morpho_dictionary.h:199-246 +
    {czech,english,generic}_morpho::generate) vs the compiled reference:
    fixtures/morphodita/generate_golden.tsv holds morpho_tools `generate`
    output for every (dict, converter, wildcard, lemma) combo — czech
    homonym ids / `_,x` non-generatable comments / tag-wildcard filters /
    convert_generated's merge+dedup order all pinned."""
    import collections

    from nametag_spark.morpho.morphodita import load_morpho, GUESSER
    from nametag_spark.morpho.convert import IdentityConverter, new_tagset_converter

    golden = collections.defaultdict(list)
    with open(os.path.join(FIX, "generate_golden.tsv"), encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            dictfile, conv_name, wc, lemma, status = parts[:5]
            rest = tuple(parts[5:])
            golden[(dictfile, conv_name, wc)].append((lemma, int(status), rest))
    by_dict = {}
    for (dictfile, conv_name, wc), rows in golden.items():
        m = by_dict.get(dictfile)
        if m is None:
            with open(os.path.join(FIX, dictfile), "rb") as f:
                m = by_dict[dictfile] = load_morpho(f)
        conv = (
            IdentityConverter()
            if conv_name == "identity"
            else (new_tagset_converter(conv_name, m) if conv_name != "none" else None)
        )
        per_query = collections.defaultdict(list)
        order = []
        for lemma, status, rest in rows:
            if lemma not in per_query:
                order.append(lemma)
            per_query[lemma].append((status, rest))
        for lemma in order:
            status, groups = m.generate(lemma, wc, GUESSER)
            if conv is not None:
                groups = conv.convert_generated(groups)
            got = [(status, (gl, form, tag)) for gl, forms in groups for form, tag in forms]
            if not got:
                got = [(status, ())]
            want = [(s, r) for s, r in per_query[lemma]]
            assert got == want, (dictfile, conv_name, wc, lemma, got[:4], want[:4])
