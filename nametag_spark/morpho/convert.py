"""Tagset converters + derivation formatters (MorphoDiTa runtime surface).

Re-expression of /root/reference/src/morphodita/tagset_converter/*.cpp and
/root/reference/src/morphodita/derivator/derivation_formatter.cpp — no code
shared; the semantics were studied from the cited files and the outputs are
pinned by goldens produced by the compiled reference itself
(fixtures/morphodita/tagset_convert_golden_cs.tsv via scripts/ref_tools/
morpho_tools.cpp `convert`).

Tagged lemmas are (lemma, tag) tuples; converters/formatters are pure
(return new lists) rather than mutating, which is the DataFrame-friendly
shape — the distributed entry point applies them inside mapInPandas over
analysis rows.
"""

from __future__ import annotations

from .morphodita import _czech_raw_lemma_len

# CoNLL2009 FEAT names per PDT tag position
# (pdt_to_conll2009_tagset_converter.cpp:19)
_CONLL2009_NAMES = ["POS", "SubPOS", "Gen", "Num", "Cas", "PGe", "PNu", "Per",
                    "Ten", "Gra", "Neg", "Voi", "", "", "Var"]


def _unique_analyzed(tagged):
    """tagset_converter.cpp:46-56 tagset_converter_unique_analyzed: sort by
    (lemma, tag) byte order and drop duplicates (UTF-8 byte order equals
    code-point order, so Python str comparison is equivalent)."""
    out = []
    last = None
    for tl in sorted(tagged):
        if tl != last:
            out.append(tl)
            last = tl
    return out


def _unique_generated(groups):
    """tagset_converter.cpp:58-87 tagset_converter_unique_generated,
    including the swap-with-last removal order (it determines the surviving
    group order) and the sort-only-when-merged rule. groups: mutable list
    of [lemma, [(form, tag), ...]]."""
    i = 0
    while i < len(groups):
        any_merged = False
        j = len(groups) - 1
        while j > i:
            if groups[j][0] == groups[i][0]:
                groups[i][1].extend(groups[j][1])
                if j < len(groups) - 1:
                    groups[j] = groups[len(groups) - 1]
                groups.pop()
                any_merged = True
            j -= 1
        if any_merged and len(groups[i][1]) > 1:
            dedup = []
            last = None
            for ft in sorted(groups[i][1], key=lambda ft: (ft[1], ft[0])):
                if ft != last:
                    dedup.append(ft)
                    last = ft
            groups[i][1] = dedup
        i += 1
    return groups


class IdentityConverter:
    """identity_tagset_converter.cpp — no conversion, no dedup."""

    def convert(self, lemma, tag):
        return lemma, tag

    def convert_analyzed(self, tagged):
        return list(tagged)

    def convert_generated(self, groups):
        return [(lemma, list(forms)) for lemma, forms in groups]


class PdtToConll2009Converter:
    """pdt_to_conll2009_tagset_converter.cpp:21-67."""

    def convert(self, lemma, tag):
        # tag: first 15 chars, '-' positions dropped, FEAT=char pairs
        parts = [
            f"{_CONLL2009_NAMES[i]}={c}"
            for i, c in enumerate(tag[:15])
            if c != "-"
        ]
        # Sem FEAT from the FULL lemma's first `_;X` marker (scanned before
        # the lemma is truncated, exactly like convert() which converts the
        # tag first)
        for i in range(max(0, len(lemma) - 2)):
            if lemma[i] == "_" and lemma[i + 1] == ";":
                parts.append(f"Sem={lemma[i + 2]}")
                break
        new_tag = "|".join(parts)
        return lemma[: _czech_raw_lemma_len(lemma)], new_tag

    def convert_analyzed(self, tagged):
        out = []
        lemma_changed = False
        for lemma, tag in tagged:
            nl, nt = self.convert(lemma, tag)
            lemma_changed = lemma_changed or nl != lemma
            out.append((nl, nt))
        if not lemma_changed or len(out) < 2:
            return out
        return _unique_analyzed(out)

    def convert_generated(self, groups):
        """pdt_to_conll2009_tagset_converter.cpp:69-82: every form's tag is
        converted with the GROUP's (pre-truncation) lemma, then the lemma
        truncates; dedup only when a lemma changed and >= 2 groups."""
        out = []
        lemma_changed = False
        for lemma, forms in groups:
            nf = [(form, self.convert(lemma, tag)[1]) for form, tag in forms]
            nl = lemma[: _czech_raw_lemma_len(lemma)]
            lemma_changed = lemma_changed or nl != lemma
            out.append([nl, nf])
        if not lemma_changed or len(out) < 2:
            return [(l, f) for l, f in out]
        return [(l, f) for l, f in _unique_generated(out)]


class _StripConverter:
    """Common body of strip_lemma_id / strip_lemma_comment converters
    (strip_lemma_{id,comment}_tagset_converter.cpp): truncate the lemma by a
    dictionary-provided length; dedup only when a lemma actually changed."""

    def __init__(self, morpho):
        self.morpho = morpho

    def _len(self, lemma):  # pragma: no cover - abstract
        raise NotImplementedError

    def convert(self, lemma, tag):
        return lemma[: self._len(lemma)], tag

    def convert_analyzed(self, tagged):
        out = []
        lemma_changed = False
        for lemma, tag in tagged:
            nl = lemma[: self._len(lemma)]
            lemma_changed = lemma_changed or nl != lemma
            out.append((nl, tag))
        if not lemma_changed or len(out) < 2:
            return out
        return _unique_analyzed(out)

    def convert_generated(self, groups):
        out = []
        lemma_changed = False
        for lemma, forms in groups:
            nl = lemma[: self._len(lemma)]
            lemma_changed = lemma_changed or nl != lemma
            out.append([nl, list(forms)])
        if not lemma_changed or len(out) < 2:
            return [(l, f) for l, f in out]
        return [(l, f) for l, f in _unique_generated(out)]


class StripLemmaIdConverter(_StripConverter):
    def _len(self, lemma):
        return self.morpho.raw_lemma_len(lemma)


class StripLemmaCommentConverter(_StripConverter):
    def _len(self, lemma):
        return self.morpho.lemma_id_len(lemma)


def new_tagset_converter(name, morpho=None):
    """tagset_converter.cpp:38-43 factory (None for unknown names)."""
    if name == "pdt_to_conll2009":
        return PdtToConll2009Converter()
    if name == "strip_lemma_comment":
        return StripLemmaCommentConverter(morpho)
    if name == "strip_lemma_id":
        return StripLemmaIdConverter(morpho)
    return None


# ---------------------------------------------------------------------------
# derivation formatters (derivation_formatter.cpp)
# ---------------------------------------------------------------------------
class DerivationFormatter:
    """Base: format_derivation via format_tagged_lemma; list formatting
    always dedups when >1 entries (derivation_formatter.cpp:16-29)."""

    def format_derivation(self, lemma):
        return self.format_tagged_lemma(lemma, "", None)[0]

    def format_tagged_lemma(self, lemma, tag, converter=None):  # pragma: no cover
        raise NotImplementedError

    def format_tagged_lemmas(self, tagged, converter=None):
        out = [self.format_tagged_lemma(l, t, converter) for (l, t) in tagged]
        if len(out) > 1:
            out = _unique_analyzed(out)
        return out


class NoneDerivationFormatter(DerivationFormatter):
    """derivation_formatter.cpp:32-42 — no derivation; the converter's OWN
    list rules apply (conditional dedup), unlike the derivating formatters."""

    def format_derivation(self, lemma):
        return lemma

    def format_tagged_lemma(self, lemma, tag, converter=None):
        return converter.convert(lemma, tag) if converter else (lemma, tag)

    def format_tagged_lemmas(self, tagged, converter=None):
        return converter.convert_analyzed(tagged) if converter else list(tagged)


class RootDerivationFormatter(DerivationFormatter):
    """derivation_formatter.cpp:48-62: climb to the derivation root, then
    convert."""

    def __init__(self, derinet):
        self.derinet = derinet

    def format_tagged_lemma(self, lemma, tag, converter=None):
        while True:
            parent = self.derinet.parent(lemma)
            if parent is None:
                break
            lemma = parent
        return converter.convert(lemma, tag) if converter else (lemma, tag)


class PathDerivationFormatter(DerivationFormatter):
    """derivation_formatter.cpp:67-82: 'lemma parent grandparent ...', each
    element converted with the ORIGINAL tag; the walk follows unconverted
    lemmas."""

    def __init__(self, derinet):
        self.derinet = derinet

    def format_tagged_lemma(self, lemma, tag, converter=None):
        cur = lemma
        out_lemma, out_tag = converter.convert(lemma, tag) if converter else (lemma, tag)
        while True:
            parent = self.derinet.parent(cur)
            if parent is None:
                break
            conv = converter.convert(parent, tag)[0] if converter else parent
            out_lemma += " " + conv
            cur = parent
        return out_lemma, out_tag


class TreeDerivationFormatter(DerivationFormatter):
    """derivation_formatter.cpp:88-116: find the root from the UNCONVERTED
    lemma, then append the whole derivation tree pre-order, one trailing
    space closing each subtree."""

    def __init__(self, derinet):
        self.derinet = derinet

    def format_tagged_lemma(self, lemma, tag, converter=None):
        root = lemma
        while True:
            parent = self.derinet.parent(root)
            if parent is None:
                break
            root = parent
        out_lemma, out_tag = converter.convert(lemma, tag) if converter else (lemma, tag)
        out_lemma = self._format_tree(root, tag, out_lemma, converter)
        return out_lemma, out_tag

    def _format_tree(self, node, tag, acc, converter):
        conv = converter.convert(node, tag)[0] if converter else node
        acc += " " + conv
        for child in self.derinet.children(node):
            acc = self._format_tree(child, tag, acc, converter)
        return acc + " "


def new_derivation_formatter(name, derinet=None):
    """derivation_formatter.cpp:126-132 factory."""
    if name == "none":
        return NoneDerivationFormatter()
    if name == "root":
        return RootDerivationFormatter(derinet) if derinet else None
    if name == "path":
        return PathDerivationFormatter(derinet) if derinet else None
    if name == "tree":
        return TreeDerivationFormatter(derinet) if derinet else None
    return None
