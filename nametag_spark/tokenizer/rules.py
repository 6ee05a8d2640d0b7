"""Pure-Python tokenizer kernel replicating the reference English/generic rules.

Behavioral contract (studied from the reference, re-expressed from scratch):
  - word / number / single-char-punct token grammar:
      /root/reference/src/morphodita/tokenizer/english_tokenizer.rl:100-101
  - clitic splitting ('s 'm 'd 'll 've 're n't + irregulars):
      english_tokenizer.rl:39-70
  - abbreviation-aware end-of-sentence and 1-char-capital guard:
      src/morphodita/tokenizer/unicode_tokenizer.cpp:69-87
  - emergency sentence split (>=500 tokens; >=450 at P*; >=400 at Po):
      unicode_tokenizer.cpp:60-67
  - eos rule `[.!?...] closing* ws+ opening* Upper`:
      english_tokenizer.rl:107,122-129
  - URL/email recognized as one token (RFC-lite approximation of the
      src/utils/url_detector.cpp FSM)

All offsets are Unicode character offsets into the input string (the
reference counts chars, not bytes — src/tokenizer/tokenizer.h:20-26).

This module is deliberately dependency-free so it can run inside Arrow
batches on executors; the hot loop is regex-driven (C speed) with a thin
Python scanner around it.
"""

from __future__ import annotations

import re
import sys
import unicodedata

# Lowercased words before an eos '.' that do not end a sentence
# (word list per english_tokenizer.rl:18-32; it is data, not code).
ABBREVIATIONS = frozenset(
    """adj adm adv assoc asst bart bldg brig bros capt cmdr col comdr con corp
    cpl d dr drs ens gen gov hon hosp hr insp lt mm mr mrs ms maj messrs mlle
    mme msgr op ord pfc ph phd prof pvt rep reps res rev rt sen sens sfc sgt
    sr st supt surg univ addr approx apr aug calif co dec def e e.g eg feb fla
    ft hrs i. i.e ie inc jan jr ltd mar max min mph mt n nov oct ont pa pres
    sec sep sept tel un v va vs w yrs""".split()
)

_APO = "'’"

# word = u_L (u_L | u_M | '-' | apo)* minus anything containing '--' or two apos
WORD_RE = re.compile(
    r"[^\W\d_](?:[^\W\d_]"
    r"|[̀-ͯ҃-҉֑-ֽؐ-ؚ"
    r"ً-ٟۖ-ۜัิ-ฺ"
    r"᪰-᫿᷀-᷿⃐-⃿︠-︯]"
    r"|-(?!-)|'(?!['’])|’(?!['’]))*"
)

# number = sign? Nd+ (',' Nd{3})* ('.' Nd+)? ([eE] sign? Nd+)?
UNSIGNED_NUM_RE = re.compile(r"\d+(?:,\d{3})*(?:\.\d+)?(?:[eE][+-]?\d+)?")

URL_RE = re.compile(
    r"""(?:(?:https?|ftp)://|www\.)[^\s<>"]*[^\s<>".,;:!?)\]}'’]""",
    re.IGNORECASE,
)
EMAIL_RE = re.compile(
    r"[A-Za-z0-9][A-Za-z0-9._%+-]*@[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)+"
)

EOL_RE = re.compile(r"\r\n|\n\r|\r|\n")

# Closing/opening punctuation sets for the eos rule (english_tokenizer.rl:108-109):
# closing = '"' | "'" | ';' | Pe | Pf ; opening = '"' | '`' | Ps | Pi
def _chars_in_categories(cats: tuple[str, ...]) -> str:
    out = []
    for cp in range(sys.maxunicode + 1):
        c = chr(cp)
        if unicodedata.category(c) in cats:
            out.append(c)
    return "".join(out)


_CLOSING = frozenset("\"';" + _chars_in_categories(("Pe", "Pf")))
_OPENING = frozenset("\"`" + _chars_in_categories(("Ps", "Pi")))

_EOS_CHARS = ".!?…"

_SUFFIX_CLITICS = ("n't", "'ll", "'ve", "'re", "'s", "'m", "'d")
# token -> length of the split-off tail (english_tokenizer.rl:57-59)
_IRREGULAR_CLITICS = {
    "cannot": 3,  # can | not
    "gimme": 2,   # gim | me
    "gonna": 2,   # gon | na
    "gotta": 2,   # got | ta
    "lemme": 2,   # lem | me
    "wanna": 2,   # wan | na
    "more'n": 2,  # more | 'n
    "d'ye": 3,    # d | 'ye
}


def _cat(c: str) -> str:
    return unicodedata.category(c)


def _is_ws(c: str) -> bool:
    return c in "\r\t\n" or unicodedata.category(c) == "Zs"


def _split_token(text: str, tokens: list) -> None:
    """English clitic splitting of the last token (english_tokenizer.rl:39-70)."""
    s, l = tokens[-1]
    if not _cat(text[s]).startswith("L"):
        return
    low = text[s : s + l].lower().replace("’", "'")
    split_len = 0
    for suf in _SUFFIX_CLITICS:
        if low.endswith(suf):
            split_len = len(suf)
            break
    if not split_len:
        split_len = _IRREGULAR_CLITICS.get(low, 0)
    if split_len and split_len < l:
        tokens[-1] = (s, l - split_len)
        tokens.append((s + l - split_len, split_len))


def _is_eos(text: str, tokens: list, eos_chr: str) -> bool:
    """unicode_tokenizer.cpp:69-87 — '.' is not eos after 1-char capitals
    or known abbreviations."""
    if eos_chr == "." and tokens:
        s, l = tokens[-1]
        if l == 1 and _cat(text[s]) in ("Lu", "Lt"):
            return False
        if text[s : s + l].lower() in ABBREVIATIONS:
            return False
    return True


def _match_number(text: str, i: int):
    """Number grammar with unary-sign context checks (english_tokenizer.rl:101)."""
    j = i
    c = text[i]
    if c in "+-":
        if i > 0:
            k = _cat(text[i - 1])
            if c == "-":
                # unary minus not allowed after L*, M*, N*, Pd
                if k[0] in "LMN" or k == "Pd":
                    return None
            else:
                # unary plus not allowed after L*, M*, N* or another '+'
                if k[0] in "LMN" or text[i - 1] == "+":
                    return None
        j = i + 1
        if j >= len(text):
            return None
    m = UNSIGNED_NUM_RE.match(text, j)
    if not m or m.end() == j:
        return None
    return m.end()


def tokenize_sentences(text: str) -> list:
    """Tokenize + sentence-segment one text.

    Returns a list of sentences; each sentence is a list of (start, length)
    Unicode-char spans into *text*.
    """
    n = len(text)
    i = 0
    sentences: list = []
    tokens: list = []

    def end_sentence() -> None:
        nonlocal tokens
        if tokens:
            sentences.append(tokens)
            tokens = []

    def emergency() -> bool:
        # unicode_tokenizer.cpp:60-67
        if not tokens:
            return False
        nt = len(tokens)
        if nt >= 500:
            return True
        if nt >= 400:
            k = _cat(text[tokens[-1][0]])
            if nt >= 450 and k.startswith("P"):
                return True
            if k == "Po":
                return True
        return False

    while i < n:
        c = text[i]

        # --- whitespace runs; blank line (two eols) ends the sentence
        if _is_ws(c):
            j = i
            while j < n and _is_ws(text[j]):
                j += 1
            if len(EOL_RE.findall(text[i:j])) >= 2:
                end_sentence()
            i = j
            continue

        # --- URL / email as one token
        m = URL_RE.match(text, i) or EMAIL_RE.match(text, i)
        if m and m.end() > i:
            tokens.append((i, m.end() - i))
            i = m.end()
            if emergency():
                end_sentence()
            continue

        # --- eos rule: eos closing* ws+ opening* Upper
        if c in _EOS_CHARS:
            j = i + 1
            while j < n and text[j] in _CLOSING:
                j += 1
            ws = j
            while j < n and _is_ws(text[j]):
                j += 1
            if j > ws:
                k = j
                while k < n and text[k] in _OPENING:
                    k += 1
                if k < n and _cat(text[k]) in ("Lu", "Lt"):
                    brk = _is_eos(text, tokens, c)
                    for p in range(i, ws):
                        tokens.append((p, 1))
                    i = ws
                    if brk:
                        end_sentence()
                    continue

        # --- word
        m = WORD_RE.match(text, i)
        if m and m.end() > i:
            tokens.append((i, m.end() - i))
            _split_token(text, tokens)
            i = m.end()
            if emergency():
                end_sentence()
            continue

        # --- number
        e = _match_number(text, i)
        if e is not None:
            tokens.append((i, e - i))
            i = e
            if emergency():
                end_sentence()
            continue

        # --- any other single char
        tokens.append((i, 1))
        i += 1
        if emergency():
            end_sentence()

    end_sentence()
    return sentences


def tokenize_forms(text: str) -> list:
    """Like tokenize_sentences but returns sentences of surface forms."""
    return [
        [text[s : s + l] for (s, l) in sent] for sent in tokenize_sentences(text)
    ]
