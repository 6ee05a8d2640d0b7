"""Tokenizer goldens replicating the reference rules (SURVEY.md §2.2)."""

from nametag_spark.tokenizer.rules import tokenize_forms, tokenize_sentences


def forms(text):
    return tokenize_forms(text)


def test_basic_words_and_eos():
    assert forms("Hello world. Next sentence.") == [
        ["Hello", "world", "."],
        ["Next", "sentence", "."],
    ]


def test_no_break_without_following_uppercase():
    # eos rule requires ws+ then optional opening then Upper
    assert forms("version 2. is out") == [["version", "2", ".", "is", "out"]]


def test_abbreviations_do_not_break():
    # english_tokenizer.rl:18-32 abbreviation list
    assert forms("Dr. Smith arrived. Mr. Brown left.") == [
        ["Dr", ".", "Smith", "arrived", "."],
        ["Mr", ".", "Brown", "left", "."],
    ]


def test_single_capital_does_not_break():
    # unicode_tokenizer.cpp:73-75
    assert forms("J. Smith spoke. Then left.") == [
        ["J", ".", "Smith", "spoke", "."],
        ["Then", "left", "."],
    ]


def test_clitic_splitting():
    assert forms("can't won't I'll we've you're it's I'm he'd") == [
        ["ca", "n't", "wo", "n't", "I", "'ll", "we", "'ve", "you", "'re", "it", "'s", "I", "'m", "he", "'d"]
    ]


def test_irregular_clitics():
    assert forms("cannot gonna gotta wanna gimme lemme") == [
        ["can", "not", "gon", "na", "got", "ta", "wan", "na", "gim", "me", "lem", "me"]
    ]


def test_numbers():
    # note: "a-" is a single word token (the word grammar allows a trailing
    # hyphen and the scanner is longest-match), then "5" is a number
    assert forms("3.14 1,234 5e-3 12:30 -5 a-5") == [
        ["3.14", "1,234", "5e-3", "12", ":", "30", "-5", "a-", "5"]
    ]


def test_hyphenated_words():
    assert forms("state-of-the-art x--y") == [["state-of-the-art", "x", "-", "-", "y"]]


def test_url_email_single_token():
    assert forms("mail bob@acme.com or https://a.io/x?y=1 now") == [
        ["mail", "bob@acme.com", "or", "https://a.io/x?y=1", "now"]
    ]


def test_blank_line_ends_sentence():
    assert forms("one two\n\nthree") == [["one", "two"], ["three"]]


def test_closing_quote_before_break():
    assert forms("He said 'stop!' Then ran.") == [
        ["He", "said", "'", "stop", "!", "'"],
        ["Then", "ran", "."],
    ]


def test_offsets_roundtrip():
    text = "Alice met Bob. They talked."
    for sent in tokenize_sentences(text):
        for (s, l) in sent:
            assert text[s : s + l].strip() == text[s : s + l]


def test_emergency_split_500():
    text = " ".join(["word"] * 1200)
    sents = tokenize_sentences(text)
    assert all(len(s) <= 500 for s in sents)
    assert sum(len(s) for s in sents) == 1200


def test_emergency_split_400_po():
    # 399 words then a comma (Po) -> forces split at >=400
    text = " ".join(["w"] * 399) + " , " + " ".join(["v"] * 50)
    sents = tokenize_sentences(text)
    assert len(sents[0]) == 400


def test_synth_roundtrip():
    """Planted transcripts tokenize back to exactly the planted tokens."""
    from nametag_spark.data.synth import synth_transcripts

    tdf, gdf = synth_transcripts(n_conversations=20, seed=7)
    n_b_labels = 0
    for row in tdf.itertuples(index=False):
        toks = [t for s in tokenize_forms(row.text) for t in s]
        assert " ".join(toks) == row.text
    # every gold mention's surface matches the tokens at its span
    for r in gdf.itertuples(index=False):
        row = tdf[(tdf.conv_id == r.conv_id) & (tdf.turn_idx == r.turn_idx)].iloc[0]
        sents = tokenize_forms(row.text)
        assert r.sent_idx < len(sents)
        span = sents[r.sent_idx][r.tok_start : r.tok_start + r.tok_len]
        assert " ".join(span) == r.surface


def test_chunk_memo_fast_path_matches_scanner():
    """The chunk-memoized fast path is span-identical to the reference-shaped
    character scanner across randomized ws/eos/abbreviation/URL mixtures."""
    import random

    from nametag_spark.tokenizer import rules

    rng = random.Random(42)
    words = ["Praha", "pila", "dr", "Dr", "St", "A", "B.", "voda", "can't",
             "cannot", "3.14", "1,000", "42", "e.g", "i.e",
             "http://example.com/a(b)", "x@a.com", "…", "?!", ".", "..",
             "...", '"Hello"', "(He", "said)", "Karel!", "co.", "žena",
             "Čtyři", "İstanbul", "'quote'", "a-b", "x--y", "+5", "-3", ")",
             "max.", "End.", "“Quoted”", "‘tis", "M.",
             # ASCII-alpha chunks exercise the single-token fast path,
             # including the irregular-clitic exceptions
             "bamre", "Zelkrova", "xyzzy", "Gonna", "gimme", "Cannot"]
    seps = [" ", "  ", "\n", "\n\n", " \n ", "\t", "\r\n", "\n \n", "   ", "\r"]
    for _trial in range(800):
        k = rng.randint(1, 14)
        parts = []
        for _ in range(k):
            parts.append(rng.choice(words))
            parts.append(rng.choice(seps))
        text = "".join(parts)
        if rng.random() < 0.3:
            text = rng.choice(seps) + text
        for lang in ("en", "cs", "generic"):
            assert rules.tokenize_sentences(text, lang) == rules._tokenize_scan(text, lang), (lang, text)
    # emergency-split fallback stays byte-identical
    for t in (" ".join(["."] * 600), "." * 600, " ".join(["w"] * 450)):
        assert rules.tokenize_sentences(t, "en") == rules._tokenize_scan(t, "en")


def test_chunk_memo_clear_preserves_parity():
    """The 200k-entry memo clear (rules._chunk_entry) must be invisible:
    tokenization before, during (the wipe fires mid-corpus), and after the
    clear stays identical to the character scanner (round-5 verdict #7)."""
    from nametag_spark.tokenizer import rules

    memo = rules._CHUNK_MEMOS["cs"]
    saved = dict(memo)
    try:
        texts = [
            "Praha pila vodu dr. Nováka . OK",
            "Žena šla do Brna a B. řekl ahoj.",
            "bamre Zelkrova kupala 3.14 vodu!",
        ]
        before = [rules.tokenize_sentences(t, "cs") for t in texts]
        # push the memo past its bound so the NEXT miss wipes it mid-stream
        memo.update({f"__pad{i}": rules._CHUNK_BAIL for i in range(200_001)})
        during = [rules.tokenize_sentences(t + " novaforma", "cs") for t in texts]
        assert len(memo) < 200_001  # the wipe fired
        assert [rules.tokenize_sentences(t, "cs") for t in texts] == before
        for t, d in zip(texts, during):
            assert d == rules._tokenize_scan(t + " novaforma", "cs")
    finally:
        memo.clear()
        memo.update(saved)
