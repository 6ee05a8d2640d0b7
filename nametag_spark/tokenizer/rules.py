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

# Czech word = u_L (u_L | u_M)* — no hyphens or apostrophes inside words and
# no clitic splitting (czech_tokenizer.rl:125)
CS_WORD_RE = re.compile(
    r"[^\W\d_](?:[^\W\d_]"
    r"|[̀-ͯ҃-҉֑-ֽؐ-ؚ"
    r"ً-ٟۖ-ۜัิ-ฺ"
    r"᪰-᫿᷀-᷿⃐-⃿︠-︯])*"
)

# number = sign? Nd+ (',' Nd{3})* ('.' Nd+)? ([eE] sign? Nd+)?
UNSIGNED_NUM_RE = re.compile(r"\d+(?:,\d{3})*(?:\.\d+)?(?:[eE][+-]?\d+)?")

# Czech number = sign? Nd+ ([.,] Nd+)? ([eE] sign? Nd+)? — one decimal
# separator (either . or ,), no thousands groups (czech_tokenizer.rl:126)
CS_UNSIGNED_NUM_RE = re.compile(r"\d+(?:[.,]\d+)?(?:[eE][+-]?\d+)?")

# Lowercased Czech abbreviations that suppress eos before '.'
# (czech_tokenizer.rl:29-43 abbreviations_czech; word list is data, not code)
CS_ABBREVIATIONS = frozenset(
    """prof csc drsc doc phd ph d judr mddr mudr mvdr paeddr paedr phdr rndr
    rsdr dr ing arch mgr bc mag mba bca mga gen plk pplk npor por ppor kpt mjr
    sgt pls p s pí fa fy mr mrs ms miss tr sv angl fr čes ces čs cs slov něm
    nem it pol maď mad rus sev vých vych již jiz záp zap adr č c eg ev g hod j
    kr m max min mj např napr okr popř popr pozn r ř red rep resp srov st stř
    str tel tj tzv ú u uh ul um zl zn""".split()
)

# --- URL/email detector -----------------------------------------------------
# Re-expression of the reference FSM grammar (ragel_tokenizer.rl:101-140,
# version 2; the same grammar backs src/utils/url_detector.cpp):
#   uchar    = alnum | $ - _ . + ! * ' ( ) , %
#   xchar    = uchar | ; / ? : @ & =
#   urlpath  = '/' | '/' ('('++ | ')'-- | xchar | u_alnum)*
#                    ( ')'{parens>0} | (xchar -- [.!',;?:)]) | u_alnum )
#   port     = ':' digit+   (a bare ':' never extends the accepted prefix —
#                            verified against the compiled reference FSM)
#   ip       = 0..255 (strict grammar); hostnumber = ip.ip.ip.ip
#   hostname = (subdomain '.')+ alpha{2,}
#   url      = protocol? user? host port? urlpath?   (protocol = alpha{3,}'://')
#   email    = uchar+ '@' hostname
# Ties (same end) resolve to EMAIL, like the reference detector.
_UCHAR = r"[A-Za-z0-9$\-_.+!*'(),%]"
_SUB = r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
_IP = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
_HOSTNAME = rf"(?:{_SUB}\.)+[A-Za-z]{{2,}}"
_URL_PRE_RE = re.compile(
    rf"(?:[A-Za-z]{{3,}}://)?(?:{_UCHAR}+(?::{_UCHAR}+)?@)?"
    rf"(?:{_HOSTNAME}|{_IP}\.{_IP}\.{_IP}\.{_IP})(?::[0-9]+)?"
)
_EMAIL_FSM_RE = re.compile(rf"{_UCHAR}+@{_HOSTNAME}")
_XCHAR_SYM = frozenset("$-_.+!*'(),%;/?:@&=")
_PATH_NO_FINAL = frozenset(".!',;?:)")


def _is_u_alnum(c: str) -> bool:
    return c.isalnum() or unicodedata.category(c)[0] == "M"


# every first char any url/email alternative can accept: uchar (email/user),
# [A-Za-z]{3,} scheme, [A-Za-z0-9] hostname, digit IP — all ASCII, so one
# set membership rejects a position without running either regex
_URL_START = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789$-_.+!*'(),%"
)


def detect_url_email(text: str, i: int):
    """Longest (url|email) match at position i.

    Returns (kind, end) with kind in {"URL", "EMAIL"} or None. Behavior is
    pinned against the compiled reference FSM by the URL_FSM_GOLD fixture."""
    if text[i] not in _URL_START:
        return None
    m_email = _EMAIL_FSM_RE.match(text, i)
    email_end = m_email.end() if m_email else -1

    url_end = -1
    m = _URL_PRE_RE.match(text, i)
    if m:
        url_end = m.end()
        j = url_end
        n = len(text)
        if j < n and text[j] == "/":
            last = j + 1  # urlpath = '/' alone is accepting
            parens = 0
            k = j + 1
            while k < n:
                c = text[k]
                if c == "(":
                    parens += 1
                    last = k + 1  # '(' is xchar and not final-excluded
                elif c == ")":
                    if parens > 0:
                        last = k + 1
                        parens -= 1
                elif _is_u_alnum(c):
                    last = k + 1
                elif c in _XCHAR_SYM:
                    if c not in _PATH_NO_FINAL:
                        last = k + 1
                else:
                    break
                k += 1
            url_end = last

    if email_end >= url_end and email_end > i:
        return ("EMAIL", email_end)
    if url_end > i:
        return ("URL", url_end)
    return None


def classify_url_email(form: str):
    """Whole-string classification, as the URLEmailDetector feature template
    uses it (url_detector::detect(form) with length==nullptr — the entire
    form must match; feature_processor_instances.cpp:1003).

    Returns "URL", "EMAIL", or None."""
    d = detect_url_email(form, 0)
    if d is not None and d[1] == len(form):
        return d[0]
    return None

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
    return c == " " or c in "\r\t\n" or unicodedata.category(c) == "Zs"


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


def _is_eos(text: str, tokens: list, eos_chr: str, abbreviations=ABBREVIATIONS) -> bool:
    """unicode_tokenizer.cpp:69-87 — '.' is not eos after 1-char capitals
    or known abbreviations."""
    if eos_chr == "." and tokens:
        s, l = tokens[-1]
        if l == 1 and _cat(text[s]) in ("Lu", "Lt"):
            return False
        if text[s : s + l].lower() in abbreviations:
            return False
    return True


def _match_number(text: str, i: int, num_re=UNSIGNED_NUM_RE):
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
    m = num_re.match(text, j)
    if not m or m.end() == j:
        return None
    return m.end()


# per-language tokenizer grammar: (word_re, number_re, abbreviations,
# clitic splitting). 'en' follows english_tokenizer.rl, 'cs' (and the
# mutually-intelligible 'sk' abbreviation variant is folded into cs here)
# follows czech_tokenizer.rl; 'generic' = czech grammar with NO abbreviation
# list (generic_tokenizer.rl uses the same word/number rules).
_LANGS = {
    "en": (WORD_RE, UNSIGNED_NUM_RE, ABBREVIATIONS, True),
    "cs": (CS_WORD_RE, CS_UNSIGNED_NUM_RE, CS_ABBREVIATIONS, False),
    "generic": (CS_WORD_RE, CS_UNSIGNED_NUM_RE, frozenset(), False),
}


_GRU_CACHE: dict = {}

# whitespace EXACTLY as _is_ws defines it (not python \s, which differs on
# \x0b/\x1c-\x1f etc.): " \t\r\n" + Zs
_WS_CLASS = " \t\r\n" + _chars_in_categories(("Zs",))
_CHUNK_RE = re.compile(f"[^{re.escape(_WS_CLASS)}]+")

# chunk memo per language: chunk string -> (spans_rel, n_tokens,
#   candidate_rel | None, eos_chr, prev_tok_str | None, opens_upper) or
#   _CHUNK_BAIL when the isolated scan is not context-free (emergency split)
_CHUNK_MEMOS: dict = {"en": {}, "cs": {}, "generic": {}}
_CHUNK_BAIL = object()


def _chunk_entry(chunk: str, lang: str, memo: dict):
    """Context-free tokenization facts for one whitespace-delimited chunk.

    The isolated scan equals the in-context scan for every position except
    the trailing `eos closing*` suffix, whose single-char tokens are
    identical either way — only the sentence-break decision needs context
    (next chunk's opening*Upper + the token preceding the eos char)."""
    e = memo.get(chunk)
    if e is None:
        if len(memo) > 200_000:
            memo.clear()
        # ASCII-letter chunks (the dominant case on fresh-vocabulary text)
        # are a single word token in every rule grammar: no digits, no
        # apostrophe/hyphen (so no suffix/hyphen clitics), no EOS or
        # opening/closing punctuation. English irregular clitics (cannot,
        # gonna, ...) are the one all-letter exception — checked explicitly.
        # Parity with _tokenize_scan is pinned by the chunk-memo fuzz test.
        if (
            chunk.isascii()
            and chunk.isalpha()
            and (lang != "en" or chunk.lower() not in _IRREGULAR_CLITICS)
        ):
            e = memo[chunk] = (
                ((0, len(chunk)),), 1, None, "", None, chunk[0].isupper()
            )
            return e
        sents = _tokenize_scan(chunk, lang)
        if len(sents) != 1:  # emergency split inside one chunk: not safe
            e = memo[chunk] = _CHUNK_BAIL
            return e
        spans = sents[0]
        n = len(chunk)
        # trailing closing* run, then the eos candidate before it
        cl = n
        while cl > 0 and chunk[cl - 1] in _CLOSING:
            cl -= 1
        cand = None
        eos_chr = ""
        prev_tok = None
        if cl > 0 and chunk[cl - 1] in _EOS_CHARS:
            cpos = cl - 1
            # the branch can only fire if the scan reaches cpos as a token
            # start (binary search: spans are sorted by start)
            for k in range(len(spans) - 1, -1, -1):
                s, l = spans[k]
                if s == cpos:
                    cand = cpos
                    eos_chr = chunk[cpos]
                    if k > 0:
                        ps, pl = spans[k - 1]
                        prev_tok = chunk[ps : ps + pl]
                    break
                if s < cpos:
                    break
        # opening* Upper flag (for the PREVIOUS chunk's eos decision)
        k = 0
        while k < n and chunk[k] in _OPENING:
            k += 1
        opens_upper = k < n and unicodedata.category(chunk[k]) in ("Lu", "Lt")
        e = memo[chunk] = (tuple(spans), len(spans), cand, eos_chr, prev_tok, opens_upper)
    return e


def tokenize_sentences(text: str, lang: str = "en") -> list:
    """Tokenize + sentence-segment one text.

    Returns a list of sentences; each sentence is a list of (start, length)
    Unicode-char spans into *text*.

    lang: 'en' | 'cs' | 'generic' (rule grammars), or 'gru:<factory-file>'
    to tokenize with a trained GRU tokenizer (the serialized
    gru_tokenizer_factory format; loaded once per process and cached).
    """
    if lang.startswith("gru:"):
        tok = _GRU_CACHE.get(lang)
        if tok is None:
            from .gru import GruTokenizer, load_gru_factory

            net, _url_email, segment, allow_spaces = load_gru_factory(lang[4:])
            tok = _GRU_CACHE[lang] = GruTokenizer(
                net, segment=segment, allow_spaces=allow_spaces
            )
        return tok.tokenize(text)
    memo = _CHUNK_MEMOS.get(lang)
    if memo is None:
        return _tokenize_scan(text, lang)

    abbreviations = _LANGS[lang][2]
    n = len(text)
    sentences: list = []
    tokens: list = []
    prev_end = 0
    find = text.find
    append = None  # (start, end, entry) of the chunk awaiting its successor
    memo_get = memo.get
    for m in _CHUNK_RE.finditer(text):
        chunk = m.group()
        ent2 = memo_get(chunk)
        if ent2 is None:
            ent2 = _chunk_entry(chunk, lang, memo)
        if ent2 is _CHUNK_BAIL:
            return _tokenize_scan(text, lang)
        if append is not None:
            s, e, ent = append
            # whitespace run before the pending chunk: blank line break
            if (
                tokens
                and (find("\n", prev_end, s) >= 0 or find("\r", prev_end, s) >= 0)
                and len(EOL_RE.findall(text[prev_end:s])) >= 2
            ):
                sentences.append(tokens)
                tokens = []
            spans, ntok, cand, eos_chr, prev_tok, _ou = ent
            if len(tokens) + ntok >= 400:
                # emergency thresholds could engage: replay the exact scanner
                return _tokenize_scan(text, lang)
            if cand is not None and ent2[5]:
                # sentence-break decision (unicode_tokenizer.cpp:69-87): the
                # token preceding the eos char — inside this chunk, or the
                # last token of the running sentence when the eos starts it
                if cand > 0:
                    last = prev_tok
                else:
                    last = (
                        text[tokens[-1][0] : tokens[-1][0] + tokens[-1][1]]
                        if tokens
                        else None
                    )
                brk = True
                if eos_chr == "." and last is not None:
                    if len(last) == 1 and unicodedata.category(last) in ("Lu", "Lt"):
                        brk = False
                    elif last.lower() in abbreviations:
                        brk = False
                if ntok == 1:
                    a, bl = spans[0]
                    tokens.append((s + a, bl))
                else:
                    tokens.extend((s + a, b) for (a, b) in spans)
                if brk:
                    sentences.append(tokens)
                    tokens = []
            elif ntok == 1:
                a, bl = spans[0]
                tokens.append((s + a, bl))
            else:
                tokens.extend((s + a, b) for (a, b) in spans)
            prev_end = e
        append = (m.start(), m.end(), ent2)
    if append is not None:
        # final chunk: no successor, so its trailing eos can never fire
        s, e, ent = append
        if (
            tokens
            and (find("\n", prev_end, s) >= 0 or find("\r", prev_end, s) >= 0)
            and len(EOL_RE.findall(text[prev_end:s])) >= 2
        ):
            sentences.append(tokens)
            tokens = []
        spans, ntok, _cand, _eos, _pt, _ou = ent
        if len(tokens) + ntok >= 400:
            return _tokenize_scan(text, lang)
        if ntok == 1:
            a, bl = spans[0]
            tokens.append((s + a, bl))
        else:
            tokens.extend((s + a, b) for (a, b) in spans)
    # trailing whitespace cannot end a sentence beyond the final flush
    if tokens:
        sentences.append(tokens)
    return sentences


def _tokenize_scan(text: str, lang: str) -> list:
    """The reference-shaped character scanner (the semantic definition).
    tokenize_sentences routes through the chunk memo and falls back here
    verbatim whenever a chunk is not provably context-free."""
    word_re, num_re, abbreviations, split_clitics = _LANGS[lang]
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
            has_eol = False
            while j < n:
                cj = text[j]
                if cj == " ":
                    j += 1
                elif cj in "\r\t\n" or unicodedata.category(cj) == "Zs":
                    has_eol = has_eol or cj in "\r\n"
                    j += 1
                else:
                    break
            if has_eol and len(EOL_RE.findall(text[i:j])) >= 2:
                end_sentence()
            i = j
            continue

        # --- URL / email as one token (full FSM grammar; see detect_url_email)
        d = detect_url_email(text, i)
        if d is not None:
            tokens.append((i, d[1] - i))
            i = d[1]
            if len(tokens) >= 400 and emergency():
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
                    brk = _is_eos(text, tokens, c, abbreviations)
                    for p in range(i, ws):
                        tokens.append((p, 1))
                    i = ws
                    if brk:
                        end_sentence()
                    continue

        # --- word
        m = word_re.match(text, i)
        if m and m.end() > i:
            tokens.append((i, m.end() - i))
            if split_clitics:
                _split_token(text, tokens)
            i = m.end()
            if len(tokens) >= 400 and emergency():
                end_sentence()
            continue

        # --- number
        e = _match_number(text, i, num_re)
        if e is not None:
            tokens.append((i, e - i))
            i = e
            if len(tokens) >= 400 and emergency():
                end_sentence()
            continue

        # --- any other single char
        tokens.append((i, 1))
        i += 1
        if len(tokens) >= 400 and emergency():
            end_sentence()

    end_sentence()
    return sentences


def tokenize_forms(text: str, lang: str = "en") -> list:
    """Like tokenize_sentences but returns sentences of surface forms."""
    return [
        [text[s : s + l] for (s, l) in sent] for sent in tokenize_sentences(text, lang)
    ]
