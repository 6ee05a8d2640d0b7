"""Morphological dictionary + guessers (MorphoDiTa G5 layer).

Re-expression of the reference semantics, not the storage format:

  - morpho_dictionary.h:156-196 `analyze`: a form is split into root+suffix
    at every position; root entries carry (inflection class, lemma) and each
    suffix maps inflection classes to tag lists — the analyses are the
    (lemma, tag) pairs where the root's class appears in the suffix's class
    map. The reference stores this as persistent tries with binary class
    tables; here it's two plain dicts (broadcast to executors with the
    model), which is the idiomatic Spark shape for a dimension table.
  - english_morpho_guesser.cpp: suffix-rewrite rules producing (lemma, tag)
    candidates for out-of-vocabulary forms -> SuffixRuleGuesser.
  - morpho_statistical_guesser.cpp: longest-known-suffix tag statistics
    learned from data -> StatisticalSuffixGuesser.
  - morpho::analyze guesser modes (morpho.h): NO_GUESSER / GUESSER; unknown
    forms fall back to a single (form, unknown_tag) analysis so downstream
    decoding always has a lattice column (viterbi.h:63 returns early on an
    empty column — we never produce one).
"""

from __future__ import annotations

NO_GUESSER = 0
GUESSER = 1


class MorphoDictionary:
    """Root + suffix-class dictionary.

    roots:    root string -> list of (class_id, lemma)
    suffixes: suffix string -> {class_id: [tags]}
    """

    def __init__(self, roots=None, suffixes=None):
        self.roots = roots or {}
        self.suffixes = suffixes or {}
        self._max_suffix = max((len(s) for s in self.suffixes), default=0)
        self._max_root = max((len(r) for r in self.roots), default=0)

    # ------------------------------------------------------------ builders
    @classmethod
    def from_paradigms(cls, paradigms: dict, lexicon: list) -> "MorphoDictionary":
        """paradigms: {class_name: [(suffix, tag), ...]};
        lexicon: [(lemma, root, class_name), ...]."""
        class_ids = {name: i for i, name in enumerate(sorted(paradigms))}
        roots: dict = {}
        suffixes: dict = {}
        for name, endings in paradigms.items():
            cid = class_ids[name]
            for suffix, tag in endings:
                suffixes.setdefault(suffix, {}).setdefault(cid, [])
                if tag not in suffixes[suffix][cid]:
                    suffixes[suffix][cid].append(tag)
        for lemma, root, name in lexicon:
            roots.setdefault(root, []).append((class_ids[name], lemma))
        return cls(roots, suffixes)

    @classmethod
    def from_forms(cls, rows: list) -> "MorphoDictionary":
        """rows: [(form, lemma, tag), ...] — a full-form lexicon becomes the
        degenerate paradigm root=form, suffix=''."""
        roots: dict = {}
        suffixes: dict = {"": {}}
        next_cid = 0
        form_cid: dict = {}
        for form, lemma, tag in rows:
            key = (form, lemma)
            cid = form_cid.get(key)
            if cid is None:
                cid = form_cid[key] = next_cid
                next_cid += 1
                roots.setdefault(form, []).append((cid, lemma))
            suffixes[""].setdefault(cid, [])
            if tag not in suffixes[""][cid]:
                suffixes[""][cid].append(tag)
        return cls(roots, suffixes)

    # ------------------------------------------------------------- analyze
    def analyze(self, form: str) -> list:
        """All (lemma, tag) analyses of form (morpho_dictionary.h:156-196:
        every root_len split with a known suffix, classes intersected)."""
        out = []
        n = len(form)
        lo = max(0, n - self._max_suffix)
        for root_len in range(n, lo - 1, -1):
            root, suffix = form[:root_len], form[root_len:]
            entries = self.roots.get(root)
            if not entries:
                continue
            classes = self.suffixes.get(suffix)
            if not classes:
                continue
            for cid, lemma in entries:
                for tag in classes.get(cid, ()):
                    out.append((lemma, tag))
        return out

    # ---------------------------------------------------------------- state
    def state(self) -> dict:
        return {
            "roots": {r: [[c, l] for (c, l) in v] for r, v in self.roots.items()},
            "suffixes": {
                s: {str(c): list(tags) for c, tags in v.items()}
                for s, v in self.suffixes.items()
            },
        }

    @classmethod
    def from_state(cls, st: dict) -> "MorphoDictionary":
        roots = {r: [(int(c), l) for (c, l) in v] for r, v in st["roots"].items()}
        suffixes = {
            s: {int(c): list(tags) for c, tags in v.items()}
            for s, v in st["suffixes"].items()
        }
        return cls(roots, suffixes)


# Default English-ish guesser rules, in english_morpho_guesser.cpp's shape:
# (suffix, n_strip, append, tags). First matching rule wins per tag set;
# multiple rules may fire (all analyses are returned, like the reference
# guesser emitting several candidates).
EN_GUESSER_RULES = [
    ("ies", 3, "y", ["NNS", "VBZ"]),
    ("sses", 2, "", ["NNS"]),
    ("ing", 3, "", ["VBG"]),
    ("ed", 2, "", ["VBD", "VBN"]),
    ("ly", 2, "ly", ["RB"]),
    ("s", 1, "", ["NNS", "VBZ"]),
]


class SuffixRuleGuesser:
    """Rule-table guesser (english_morpho_guesser.cpp analogue): suffix
    rewrite rules + shape fallbacks (capitalized -> NNP, numeric -> CD,
    default NN)."""

    def __init__(self, rules=None, cap_tag="NNP", num_tag="CD", default_tag="NN"):
        self.rules = EN_GUESSER_RULES if rules is None else rules
        self.cap_tag = cap_tag
        self.num_tag = num_tag
        self.default_tag = default_tag

    def analyze(self, form: str) -> list:
        out = []
        low = form.lower()
        for suffix, n_strip, append, tags in self.rules:
            if low.endswith(suffix) and len(low) > len(suffix):
                lemma = low[: len(low) - n_strip] + append
                for tag in tags:
                    out.append((lemma, tag))
        if form[:1].isupper():
            out.append((form, self.cap_tag))
        if form[:1].isdigit():
            out.append((form, self.num_tag))
        if not out:
            out.append((low, self.default_tag))
        return out

    def state(self) -> dict:
        return {
            "rules": [list(r) for r in self.rules],
            "cap_tag": self.cap_tag,
            "num_tag": self.num_tag,
            "default_tag": self.default_tag,
        }

    @classmethod
    def from_state(cls, st: dict) -> "SuffixRuleGuesser":
        return cls(
            [
                (s, int(n), a, list(tags)) for (s, n, a, tags) in st["rules"]
            ],
            st["cap_tag"],
            st["num_tag"],
            st["default_tag"],
        )


class StatisticalSuffixGuesser:
    """Longest-known-suffix tag statistics (morpho_statistical_guesser.cpp
    analogue): fit() counts tags per form suffix of length <= max_suffix;
    analyze() backs off from the longest matching suffix and emits that
    suffix's tags (lemma = form)."""

    def __init__(self, max_suffix: int = 4, max_tags: int = 4):
        self.max_suffix = max_suffix
        self.max_tags = max_tags
        self.table: dict = {}  # suffix -> [tags sorted by count desc, tag asc]

    def fit(self, forms, tags) -> "StatisticalSuffixGuesser":
        counts: dict = {}
        for form, tag in zip(forms, tags):
            low = form.lower()
            for k in range(1, min(self.max_suffix, len(low)) + 1):
                counts.setdefault(low[-k:], {}).setdefault(tag, 0)
                counts[low[-k:]][tag] += 1
        self.table = {
            s: [t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: self.max_tags]]
            for s, c in counts.items()
        }
        return self

    def analyze(self, form: str) -> list:
        low = form.lower()
        for k in range(min(self.max_suffix, len(low)), 0, -1):
            tags = self.table.get(low[-k:])
            if tags:
                return [(low, t) for t in tags]
        return []

    def state(self) -> dict:
        return {"max_suffix": self.max_suffix, "max_tags": self.max_tags, "table": self.table}

    @classmethod
    def from_state(cls, st: dict) -> "StatisticalSuffixGuesser":
        g = cls(int(st["max_suffix"]), int(st["max_tags"]))
        g.table = {s: list(t) for s, t in st["table"].items()}
        return g


class Morpho:
    """Dictionary + guesser facade with the reference's analyze contract
    (morpho.h): dictionary analyses win; guesser only consulted on misses
    when mode >= GUESSER; a final (form, unknown_tag) fallback keeps the
    lattice column non-empty."""

    def __init__(self, dictionary: MorphoDictionary, guesser=None, unknown_tag: str = "UNK"):
        self.dictionary = dictionary
        self.guesser = guesser
        self.unknown_tag = unknown_tag

    def analyze(self, form: str, mode: int = GUESSER) -> list:
        out = self.dictionary.analyze(form)
        if not out and form != form.lower():
            # reference dictionaries fold case via lowercase variants
            out = self.dictionary.analyze(form.lower())
        if not out and mode >= GUESSER and self.guesser is not None:
            out = self.guesser.analyze(form)
        if not out:
            out = [(form.lower(), self.unknown_tag)]
        # deterministic order, duplicates removed
        seen = []
        for a in out:
            if a not in seen:
                seen.append(a)
        return seen

    def state(self) -> dict:
        st = {"dictionary": self.dictionary.state(), "unknown_tag": self.unknown_tag}
        if isinstance(self.guesser, SuffixRuleGuesser):
            st["guesser"] = {"kind": "rules", **self.guesser.state()}
        elif isinstance(self.guesser, StatisticalSuffixGuesser):
            st["guesser"] = {"kind": "stats", **self.guesser.state()}
        return st

    @classmethod
    def from_state(cls, st: dict) -> "Morpho":
        guesser = None
        g = st.get("guesser")
        if g is not None:
            guesser = (
                SuffixRuleGuesser.from_state(g) if g["kind"] == "rules"
                else StatisticalSuffixGuesser.from_state(g)
            )
        return cls(MorphoDictionary.from_state(st["dictionary"]), guesser, st["unknown_tag"])
