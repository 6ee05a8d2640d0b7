"""Sink renderings (SURVEY.md §2.1 S5-S7) + CoNLL reader (S3) + eval."""

import pandas as pd

from nametag_spark.sinks.render import render_conll, render_df, render_vertical, render_xml


def test_render_conll_nested():
    forms = [["John", "Smith", "Inc", "said"]]
    # nested: outer ORG over 0..2, inner PER over 0..1 (outermost-first sort)
    ents = [[(0, 3, "ORG"), (0, 2, "PER")]]
    out = render_conll(forms, ents)
    assert out.splitlines() == [
        "John\tB-ORG|B-PER",
        "Smith\tI-ORG|I-PER",
        "Inc\tI-ORG",
        "said\tO",
        "",
    ]


def test_render_vertical_global_ids():
    forms = [["Alice", "went"], ["to", "Prague", "now"]]
    ents = [[(0, 1, "PER")], [(1, 1, "LOC")]]
    out = render_vertical(forms, ents)
    # second sentence ids offset by len(sent1) + 1 gap = 3
    assert out.splitlines() == ["1\tPER\tAlice", "5\tLOC\tPrague"]


def test_render_xml_preserves_whitespace():
    text = "Alice  went to Prague ."
    from nametag_spark.tokenizer.rules import tokenize_sentences

    spans = tokenize_sentences(text)
    ents = [[(0, 1, "PER"), (3, 1, "LOC")]]
    out = render_xml(text, spans, ents)
    assert out == (
        '<sentence><ne type="PER"><token>Alice</token></ne>  <token>went</token> '
        '<token>to</token> <ne type="LOC"><token>Prague</token></ne> <token>.</token></sentence>'
    )


def test_render_xml_escapes():
    text = "a<b & c"
    from nametag_spark.tokenizer.rules import tokenize_sentences

    spans = tokenize_sentences(text)
    out = render_xml(text, spans, [[] for _ in spans])
    assert "&lt;" in out and "&amp;" in out


def test_render_df_spark(spark, tiny_model_dir):
    from nametag_spark.data.synth import synth_transcripts

    tdf, _ = synth_transcripts(n_conversations=5, seed=3)
    sdf = spark.createDataFrame(tdf)
    for fmt in ("conll", "vertical", "xml"):
        out = render_df(sdf, tiny_model_dir, fmt=fmt).toPandas()
        assert len(out) == len(tdf)
        assert out["rendered"].notna().all()
    conll = render_df(sdf, tiny_model_dir, fmt="conll").toPandas()
    assert conll["rendered"].str.contains("\t").all()


def test_conll_reader_roundtrip(spark, tmp_path):
    from nametag_spark.data.conll import conll_sentences, read_conll

    text = "Alice\tB-PER\nSmith\tI-PER\nspoke\tO\n\nBob\tB-PER\nleft\tO\n"
    p = tmp_path / "train.conll"
    p.write_text(text, encoding="utf-8")
    df = read_conll(spark, str(p))
    sents = conll_sentences(df)
    assert sents == [
        (["Alice", "Smith", "spoke"], ["B-PER", "I-PER", "O"]),
        (["Bob", "left"], ["B-PER", "O"]),
    ]


def test_span_prf(spark):
    from nametag_spark.ner.eval import span_prf

    cols = ["conv_id", "turn_idx", "sent_idx", "tok_start", "tok_len", "type"]
    pred = spark.createDataFrame(
        pd.DataFrame([("c", 0, 0, 0, 2, "PER"), ("c", 0, 0, 4, 1, "LOC")], columns=cols)
    )
    gold = spark.createDataFrame(
        pd.DataFrame([("c", 0, 0, 0, 2, "PER"), ("c", 0, 0, 7, 1, "ORG")], columns=cols)
    )
    m = span_prf(pred, gold)
    assert m["tp"] == 1 and m["precision"] == 0.5 and m["recall"] == 0.5


def test_tokenize_cli_formats(spark, tmp_path):
    """`cli tokenize` mirrors run_tokenizer.cpp:54-87: vertical = one form
    per line + blank line per sentence; xml = <sentence>/<token> markup with
    inter-token text preserved and no <ne> elements."""
    import pandas as pd

    from nametag_spark import cli

    text = "Dr. Smith visits Prague. It's nice!"
    src = str(tmp_path / "in")
    spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]})).write.parquet(src)

    out_v = str(tmp_path / "v")
    assert cli.main_tokenize([src, out_v, "--format", "vertical"]) == 0
    vertical = spark.read.parquet(out_v).collect()[0]["rendered"]
    assert vertical == "Dr\n.\nSmith\nvisits\nPrague\n.\n\nIt\n's\nnice\n!\n\n"

    out_x = str(tmp_path / "x")
    assert cli.main_tokenize([src, out_x, "--format=xml"]) == 0
    xml = spark.read.parquet(out_x).collect()[0]["rendered"]
    assert xml == (
        "<sentence><token>Dr</token><token>.</token> <token>Smith</token>"
        " <token>visits</token> <token>Prague</token><token>.</token></sentence>"
        " <sentence><token>It</token><token>'s</token> <token>nice</token>"
        "<token>!</token></sentence>"
    )

    out_t = str(tmp_path / "t")
    assert cli.main_tokenize([src, out_t]) == 0
    toks = spark.read.parquet(out_t)
    assert toks.count() > 0


def test_run_tokenizer_cli_reference_parity():
    """The tokenize CLI's vertical/xml renderings are byte-identical to the
    compiled reference run_tokenizer (--output=vertical|xml) on a czech
    paragraph pair covering abbreviations (např.), decimal numbers (3,5),
    URL/email single tokens, and hyphenated splits. Goldens captured from
    /tmp/refbuild/run_tokenizer with fixtures/morphodita/tiny_cs.ner (its
    embedded czech tokenizer)."""
    import os

    from nametag_spark.sinks.render import render_xml
    from nametag_spark.tokenizer.rules import tokenize_sentences

    fix = os.path.join(os.path.dirname(__file__), "..", "fixtures", "morphodita")
    text = open(os.path.join(fix, "run_tokenizer_input.txt"), encoding="utf-8").read()
    want_v = open(os.path.join(fix, "run_tokenizer_golden_vertical.txt"), encoding="utf-8").read()
    want_x = open(os.path.join(fix, "run_tokenizer_golden_xml.txt"), encoding="utf-8").read()

    paras = text.split("\n\n")
    got_v = []
    got_x = []
    for p in paras:
        spans = tokenize_sentences(p, "cs")
        got_v.append(
            "".join("".join(p[s : s + l] + "\n" for (s, l) in sent) + "\n" for sent in spans)
        )
        got_x.append(render_xml(p, spans, [[] for _ in spans]))
    assert "".join(got_v) == want_v
    assert "\n\n".join(x.rstrip("\n") for x in got_x) + "\n" == want_x
