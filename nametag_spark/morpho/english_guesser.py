"""English morphological guesser — re-expression of the reference's
Ragel machines (src/morphodita/morpho/english_morpho_guesser.rl, itself a
reimplementation of Morphium/morpha, LGPL-credited there).

Each Ragel machine scans the word REVERSED (suffix rules written backwards)
and keeps the best (lowest-letter) rule whose pattern fires; '@' actions
fire on a prefix match of the reversed string, '%' actions only when the
pattern consumes the whole reversed string. This module expresses each
machine as an ordered regex table over the reversed byte string and is
fuzz-verified byte-exact against the compiled reference on ~4.5k words
(tests/test_morphodita_en.py; 37k analysis rows).

No code is shared with the reference — the grammars were transcribed from
the .rl source and verified behaviorally.
"""

from __future__ import annotations

import re
import struct

# character classes over the REVERSED lowercase byte string
V = "[aeiou]"
VY = "[aeiouy]"
C = "[bcdfghjklmnpqrstvwxyz]"
CXY = "[bcdfghjklmnpqrstvwxz]"
CXY_NOT_N = "[bcdfghjklmpqrstvwxz]"
C2 = "(?:bb|cc|dd|ff|gg|hh|jj|kk|ll|mm|nn|pp|qq|rr|ss|tt|vv|ww|xx|yy|zz)"
CXY2 = "(?:bb|cc|dd|ff|gg|hh|jj|kk|ll|mm|nn|pp|qq|rr|ss|tt|vv|ww|xx|zz)"
S = "(?:[sxz]|h[cs])"
S2 = "(?:ss|zz)"
PRE = "(?:eb|xe|ni|sim|erp|orp|er)"

# case-insensitive variants (NNPS machine)
Vi = "[aeiouAEIOU]"
VYi = "[aeiouyAEIOUY]"
Ci = "[bcdfghjklmnpqrstvwxyzBCDFGHJKLMNPQRSTVWXYZ]"
CXYi = "[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]"
Si = "(?:[sxzSXZ]|[hH][csCS])"
S2i = "(?:[sS][sS]|[zZ][zZ])"


def _table(rules):
    """rules: [(kind, pattern, remove, append)] in priority order; compile.
    kind: 'p' prefix-match, 'f' full-match."""
    out = []
    for kind, pat, remove, append in rules:
        out.append((kind, re.compile(pat.encode("ascii")), remove, append))
    return out


def _apply(table, rev: bytes):
    """-> (remove, append) of the first (best) matching rule, else (0, '')."""
    for kind, rx, remove, append in table:
        if kind == "p":
            if rx.match(rev):
                return remove, append
        else:
            if rx.fullmatch(rev):
                return remove, append
    return 0, ""


# english_morpho_guesser.rl machine NNS
_NNS = _table([
    ("p", "nem", 2, "an"),
    ("p", "seohs", 1, ""),
    ("p", "seviw", 3, "fe"),
    ("p", f"sesu{C}", 2, ""),
    ("p", f"ses{V}", 1, ""),
    ("p", f"sez{CXY}.", 2, ""),
    ("p", f"sez{VY}", 1, ""),
    ("p", f"se{S2}", 2, ""),
    ("p", f"sesr{V}.", 1, ""),
    ("p", "sesno", 1, ""),
    ("p", f"se{S}", 2, ""),
    ("p", f"sei{C}.", 3, "y"),
    ("p", f"seo{CXY}", 2, ""),
    ("p", "s.", 1, ""),
])

# machine NNPS (case-insensitive; uppercase rules first where they differ)
_NNPS = _table([
    ("p", "NEM", 2, "AN"),
    ("p", "(?i:nem)", 2, "an"),
    ("p", "(?i:seohs)", 1, ""),
    ("p", "SEVIW", 3, "FE"),
    ("p", "(?i:seviw)", 3, "fe"),
    ("p", f"(?i:sesu){Ci}", 2, ""),
    ("p", f"(?i:ses){Vi}", 1, ""),
    ("p", f"(?i:sez){CXYi}.", 2, ""),
    ("p", f"(?i:sez){VYi}", 1, ""),
    ("p", f"(?i:se){S2i}", 2, ""),
    ("p", f"(?i:sesr){Vi}.", 1, ""),
    ("p", "(?i:sesno)", 1, ""),
    ("p", f"(?i:se){Si}", 2, ""),
    ("p", f"SEI{Ci}.", 3, "Y"),
    ("p", f"(?i:sei){Ci}.", 3, "y"),
    ("p", f"(?i:seo){CXYi}", 2, ""),
    ("p", "(?i:s).", 1, ""),
])

# machine VBG
_VBG = _table([
    ("p", f"gniz{CXY}", 3, ""),
    ("p", f"gniz{VY}", 3, "e"),
    ("p", f"(?:gnikci|gni{CXY2}{V}{C}|gnill{V}{C}|gni{S2})", 3, ""),
    ("f", f"(?:gnign{V}{C}{PRE}*|gni{CXY})", 3, ""),
    ("p", f"gnini{C}", 3, "e"),
    ("p", f"gni[npwx]{V}{C}", 3, ""),
    ("p", f"(?:gnitel{C}|gnid{V}u|gni{C}{V}uq)", 3, "e"),
    ("f", f"gnit[ei]{C}+{PRE}*", 3, "e"),
    ("p", f"(?:gnitae{CXY}{CXY}{PRE}|gnit[ei])", 3, ""),
    ("p", f"gnitae{CXY}{CXY}{V}", 3, "e"),
    ("p", "gnita[eo].", 3, ""),
    ("p", f"(?:gni[cgsv]{V}{V}|gnita{V}.)", 3, "e"),
    ("p", f"(?:gnil[rw].|gni{C}{V}{V})", 3, ""),
    ("p", f"(?:gni[cglsv]{CXY}|gniht.)", 3, "e"),
    ("p", f"gni{CXY}{CXY}", 3, ""),
    ("p", "gniu", 3, "e"),
    ("p", f"(?:gnio{CXY}|gniy|gni{VY}{VY})", 3, ""),
    ("p", f"gniro[clt]{C}", 3, "e"),
    ("f", f"gniro{C}+{PRE}*", 3, "e"),
    ("p", "gnir[eo]", 3, ""),
    ("p", "gni", 3, "e"),
])

# machine VBD_VBN
_VBD_VBN = _table([
    ("p", "ne", 1, ""),
    ("p", f"dez{CXY}", 2, ""),
    ("p", f"dez{VY}", 1, ""),
    ("p", f"(?:dekci|de{CXY2}{V}{C}|dell{V}{C}|de{S2})", 2, ""),
    ("f", f"(?:degn{V}{C}{PRE}*|de{CXY})", 2, ""),
    ("p", f"(?:dero[clnt]{C}|deni{C})", 1, ""),
    ("p", f"de[npwx]{V}{C}", 2, ""),
    ("f", f"dero{C}+{PRE}*", 1, ""),
    ("p", "der[eo]", 2, ""),
    ("p", f"dei{C}", 3, "y"),
    ("p", f"(?:detel{C}|ded{V}u|de{C}{V}uq)", 1, ""),
    ("f", f"det[ei]{C}+{PRE}*", 1, ""),
    ("p", f"(?:detae{CXY}{CXY}{PRE}|det[ei])", 2, ""),
    ("p", f"detae{CXY}{CXY}{V}", 1, ""),
    ("p", "deta[eo].", 2, ""),
    ("p", f"(?:de[cgsv]{V}{V}|deta{V}.)", 1, ""),
    ("p", f"(?:del[rw].|de{C}{V}{V})", 2, ""),
    ("p", f"(?:de[cglsv]{CXY}|deu|deht.)", 1, ""),
    ("p", f"(?:de{VY}{VY}|de{CXY}{CXY})", 2, ""),
    ("p", "de", 1, ""),
])

# machine VBZ
_VBZ = _table([
    ("p", f"ses{V}", 1, ""),
    ("p", f"sez{CXY}.", 2, ""),
    ("p", f"sez{VY}", 1, ""),
    ("p", f"se{S2}", 2, ""),
    ("p", f"(?:sesno|sesr{V}.)", 1, ""),
    ("p", f"se{S}", 2, ""),
    ("p", f"sei{C}.", 3, "y"),
    ("p", f"seo{CXY}", 2, ""),
    ("p", "s.", 1, ""),
])

# machine JJR_RBR
_JJR_RBR = _table([
    ("p", "rell[^e]", 2, ""),
    ("p", f"re{C2}", 3, ""),
    ("p", "rei", 3, "y"),
    ("p", f"(?:re[npwx]{V}{C}|re{C}{V}{V})", 2, ""),
    ("p", f"(?:re[eu]|re[cglsv]{CXY_NOT_N}|re{C}{V})", 1, ""),
    ("p", "re.", 2, ""),
])

# machine JJS_RBS
_JJS_RBS = _table([
    ("p", "tsell[^e]", 3, ""),
    ("p", f"tse{C2}", 4, ""),
    ("p", "tsei", 4, "y"),
    ("p", f"(?:tse[npwx]{V}{C}|tse{C}{V}{V})", 3, ""),
    ("p", f"(?:tse[cglsv]{CXY_NOT_N}|tse{C}{V})", 2, ""),
    ("p", "tse...", 3, ""),
])


class EnglishGuesser:
    """english_morpho_guesser.cpp runtime: exceptions map, negation
    prefixes, default + rule-machine tag guesses, proper names."""

    __slots__ = ("exceptions_tags", "exceptions", "negations")

    def __init__(self, exceptions_tags, exceptions, negations):
        self.exceptions_tags = exceptions_tags
        self.exceptions = exceptions  # bytes(form_lc) -> [(lemma, [tag_idx])]
        self.negations = negations    # bytes(prefix) -> (negation_len, to_follow)

    @classmethod
    def load(cls, d) -> "EnglishGuesser":
        from .morphodita import _load_pmap_buckets, _pmap_items, _Decoder

        tags = []
        for _ in range(d.u2()):
            tags.append(bytes(d.raw(d.u1())).decode("utf-8"))

        def skip_exc(dec):
            for _ in range(dec.u1()):
                dec.raw(dec.u1())
                dec.raw(dec.u1() * 2)

        exceptions = {}
        for key, _l, e in _pmap_items(_load_pmap_buckets(d), skip_exc):
            entries = []
            for _ in range(e.u1()):
                lemma = bytes(e.raw(e.u1())).decode("utf-8")
                ntags = e.u1()
                idxs = struct.unpack_from("<%dH" % ntags, e.data, e.pos)
                e.raw(ntags * 2)
                entries.append((lemma, list(idxs)))
            if key not in exceptions:
                exceptions[key] = entries

        negations = {}
        for key, _l, e in _pmap_items(_load_pmap_buckets(d), lambda dec: dec.raw(2)):
            if key not in negations:
                negations[key] = (e.u1(), e.u1())
        return cls(tags, exceptions, negations)

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _neg_format(form: str, negation_len: int) -> str:
        if negation_len:
            return form[negation_len:] + "^" + form[:negation_len]
        return form

    def _machine(self, table, form: str, negation_len: int) -> str:
        rev = form.encode("utf-8")[negation_len:][::-1]
        remove, append = _apply(table, rev)
        return form[: len(form) - remove] + append

    # -------------------------------------------------------------- analyze
    def analyze(self, form: str, form_lc: str, out: list) -> None:
        fb_lc = form_lc.encode("utf-8")
        exception = self.exceptions.get(fb_lc)
        if exception is not None:
            for lemma, idxs in exception:
                for ti in idxs:
                    out.append((lemma, self.exceptions_tags[ti]))
        else:
            # negation prefix: longest prefix whose rule leaves enough tail
            negation_len = 0
            for plen in range(1, len(fb_lc) + 1):
                found = self.negations.get(fb_lc[:plen])
                if found is None:
                    break
                if found[0] and len(fb_lc) - plen >= found[1]:
                    negation_len = found[0]

            lemma_lc = form_lc
            neg = self._neg_format

            # default tags (guesser source order)
            out.append((lemma_lc, "FW"))
            out.append((neg(lemma_lc, negation_len), "JJ"))
            out.append((neg(lemma_lc, negation_len), "RB"))
            out.append((neg(lemma_lc, negation_len), "NN"))
            out.append(
                (neg(self._machine(_NNS, lemma_lc, negation_len), negation_len), "NNS")
            )

            # specialized tags: actions fire in Ragel char-scan order over
            # the reversed string; ties at the same index follow the source
            # union order (JJR_RBR, JJS_RBS, VBG, VBD_VBN, VBZ, VB_VBP,
            # SYM, CD)
            rev = fb_lc[::-1]
            fires = []  # (char_index, union_order, emit_fn)

            def jjr():
                lm = self._machine(_JJR_RBR, lemma_lc, negation_len)
                out.append((neg(lm, negation_len), "JJR"))
                out.append((neg(lm, negation_len), "RBR"))

            def jjs():
                lm = self._machine(_JJS_RBS, lemma_lc, negation_len)
                out.append((neg(lm, negation_len), "JJS"))
                out.append((neg(lm, negation_len), "RBS"))

            def vbg():
                out.append((self._machine(_VBG, lemma_lc, 0), "VBG"))

            def vbd():
                lm = self._machine(_VBD_VBN, lemma_lc, 0)
                out.append((lm, "VBD"))
                out.append((lm, "VBN"))

            def vbz():
                out.append((self._machine(_VBZ, lemma_lc, 0), "VBZ"))

            def vbp():
                out.append((lemma_lc, "VB"))
                out.append((lemma_lc, "VBP"))

            def sym():
                out.append((lemma_lc, "SYM"))

            def cd():
                out.append((lemma_lc, "CD"))

            # JJR_RBR: 're' @ | any* '-' ('re'|'erom'|'ssel') @
            idx = None
            if rev.startswith(b"re"):
                idx = 1
            m = re.search(rb"-(?:re|erom|ssel)", rev)
            if m is not None:
                j = m.end() - 1
                idx = j if idx is None else min(idx, j)
            if idx is not None:
                fires.append((idx, 0, jjr))
            # JJS_RBS: 'tse' @ | any* '-' ('tse'|'tsom'|'tsael') @
            idx = None
            if rev.startswith(b"tse"):
                idx = 2
            m = re.search(rb"-(?:tse|tsom|tsael)", rev)
            if m is not None:
                j = m.end() - 1
                idx = j if idx is None else min(idx, j)
            if idx is not None:
                fires.append((idx, 1, jjs))
            # VBG: ('gni' | 'ni' [^aeiouy]) @
            if rev.startswith(b"gni") or re.match(rb"ni[^aeiouy]", rev):
                fires.append((2, 2, vbg))
            # VBD_VBN: 'de' @
            if rev.startswith(b"de"):
                fires.append((1, 3, vbd))
            # VBZ: 's' [^s] @
            if re.match(rb"s[^s]", rev):
                fires.append((1, 4, vbz))
            # VB_VBP: ([^s] | 'ss') @
            if rev[:1] and rev[:1] != b"s":
                fires.append((0, 5, vbp))
            elif rev.startswith(b"ss"):
                fires.append((1, 5, vbp))
            # SYM: any* [^a-zA-Z0-9] @
            m = re.search(rb"[^a-zA-Z0-9]", rev)
            if m is not None:
                fires.append((m.start(), 6, sym))
            # CD: any* [0-9-] @ | [ixvcmd.]+ %
            idx = None
            m = re.search(rb"[0-9\-]", rev)
            if m is not None:
                idx = m.start()
            if re.fullmatch(rb"[ixvcmd.]+", rev):
                j = len(rev) - 1
                idx = j if idx is None else min(idx, j)
            if idx is not None:
                fires.append((idx, 7, cd))

            for _i, _o, fn in sorted(fires, key=lambda t: (t[0], t[1])):
                fn()

        self.analyze_proper_names(form, form_lc, out)

    def analyze_proper_names(self, form: str, form_lc: str, out: list) -> bool:
        is_nnp = form != form_lc or (form[:1] and (form[0] == "'" or form[0].isdigit() and form[0].isascii()))
        is_nnps = form != form_lc
        if not is_nnp and not is_nnps:
            return False
        was_nnp = any(t == "NNP" for (_l, t) in out)
        was_nnps = any(t == "NNPS" for (_l, t) in out)
        if not ((is_nnp and not was_nnp) or (is_nnps and not was_nnps)):
            return False
        if is_nnp and not was_nnp:
            out.append((form, "NNP"))
        if is_nnps and not was_nnps:
            out.append((self._machine(_NNPS, form, 0), "NNPS"))
        return True
