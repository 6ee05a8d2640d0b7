"""Binary .ner model reader parity.

fixtures/tiny_ref.ner was produced by the REFERENCE's own train_ner
(compiled unmodified from /root/reference/src, MPL-2.0) over
fixtures/tiny_ref_train.conll + tiny_ref_features.txt:

    train_ner english trivial features.txt 2 8 -0.2 0.1 0.01 0.5 0 < train

REF_GOLD below is the output of the reference's run_ner
(--input=vertical --output=vertical) on the four test sentences — so this
test is direct end-to-end output parity between this engine and the
reference binary on a reference-trained model."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nametag_spark.model.binary_reader import load_binary_ner
from nametag_spark.model.model import NerModel

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "tiny_ref.ner")

SENTENCES = [
    ["Alice", "Johnson", "works", "at", "Acme", "Corp", "in", "Prague", "."],
    ["Bob", "visited", "London", "and", "Berlin", "yesterday", "."],
    ["Contact", "alice@acme.com", "or", "see", "https://acme.com", "now", "."],
    ["Eve", "flew", "to", "New", "York", "."],
]

# reference run_ner output (vertical): (sentence, tok_start, tok_len, type)
REF_GOLD = [
    [(0, 2, "PER"), (4, 2, "ORG"), (7, 1, "LOC")],
    [(0, 1, "PER"), (2, 1, "LOC"), (4, 1, "LOC")],
    [(1, 1, "EMAIL"), (4, 1, "URL")],
    [(3, 2, "LOC")],
]


def test_binary_load_structure():
    m = load_binary_ner(FIXTURE)
    assert m.entities.id2str == ["PER", "ORG", "LOC", "URL", "EMAIL"]
    assert m.stages == 2
    assert [p.name for p in m.templates.processors] == [
        "Form", "FormCapitalization", "FormSuffix", "PreviousStage",
        "URLEmailDetector", "BrownClusters", "Gazetteers", "GazetteersEnhanced",
    ]
    assert m.networks[0].missing_weight == -0.2


def test_binary_decode_matches_reference_output():
    m = load_binary_ner(FIXTURE)
    for sent, gold in zip(SENTENCES, REF_GOLD):
        assert m.recognize_sentence(sent) == gold, sent


def test_binary_roundtrip_through_npz_dir(tmp_path):
    """binary -> our dir format -> reload -> identical decisions."""
    m = load_binary_ner(FIXTURE)
    d = str(tmp_path / "m")
    m.save(d)
    m2 = NerModel.load(d)
    for sent in SENTENCES:
        assert m.recognize_sentence(sent) == m2.recognize_sentence(sent)


def test_binary_rejects_morphodita_tagger(tmp_path):
    import io

    import pytest

    from nametag_spark.model.binary_reader import BinaryFormatError

    with pytest.raises(BinaryFormatError, match="MORPHODITA"):
        load_binary_ner(io.BytesIO(bytes([1, 2])))
