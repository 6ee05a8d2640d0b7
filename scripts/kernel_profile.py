"""Profile ONE wide-corpus kernel rep (round-6 verdict #3): turn the
"~28µs/token of per-unique-form Python string work" bound into committed
evidence. Runs the exact engine_rep protocol from kernel_ab (fresh model
load, disjoint warm-up, one timed cold-cache pass) under cProfile and
aggregates the flat profile into named phase buckets, so BENCH.md can show
WHERE the wide-vocab per-token cost goes — dictionary suffix-class walks vs
guesser rules vs lemma splits vs trie recasing vs scoring/decode — and
whether any single bucket is a >30% vectorization target.

Usage: python scripts/kernel_profile.py [wide|fuzz] [n_sentences]
Prints a per-bucket table (% of profiled time, µs/token) plus the top-25
functions by tottime. Pure driver-side, no Spark.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from kernel_ab import MODEL, _build_sentences, corpus  # noqa: E402

# class of each line in morphodita.py (frames there share generic names
# like `analyze` across the dictionary, the three guessers, and the
# language dispatchers — the class is what names the phase)
def _class_map(path: str):
    bounds = []
    for i, line in enumerate(open(path), 1):
        m = re.match(r"class (\w+)", line)
        if m:
            bounds.append((i, m.group(1)))
    return bounds


_MD_CLASSES = None


def _md_class(lineno: int) -> str:
    global _MD_CLASSES
    if _MD_CLASSES is None:
        import nametag_spark.morpho.morphodita as md

        _MD_CLASSES = _class_map(md.__file__)
    prev = "?"
    for i, name in _MD_CLASSES:
        if i > lineno:
            break
        prev = name
    return prev


# morphodita.py class -> phase bucket (the vocabulary of the round-6
# verdict: dictionary suffix-class walks / guesser rules / lemma splits)
_MD_CLASS_BUCKETS = [
    ("MdDictionary", "dictionary-analyze (suffix-class walks)"),
    ("MdStatisticalGuesser", "guesser-rules"),
    ("MdPrefixGuesser", "guesser-rules"),
    ("MdSuffixGuesser", "guesser-rules"),
    ("ElementaryFeatures", "tagger-features"),  # *ElementaryFeatures
    ("MorphoditaTagger", None),  # split by function below
]


def bucket_of(filename: str, lineno: int, funcname: str) -> str:
    f = filename.replace("\\", "/")
    if f == "~" or funcname.startswith("<built-in") or "/numpy/" in f:
        return "builtins/numpy (called from above)"
    if "morpho/morphodita.py" in f:
        cls = _md_class(lineno)
        for sub, b in _MD_CLASS_BUCKETS:
            if sub in cls and b is not None:
                return b
        if "MorphoditaTagger" in cls:
            if "batch" in funcname or "column" in funcname:
                return "batch-orchestration (flatten/cache fill)"
            return "tagger-decode (viterbi)"
        if re.search(r"lemma|_split|raw_", funcname):
            return "lemma-split"
        if re.search(r"casing|variant|analyze|special", funcname):
            return "analyze-dispatch/casing-variants"
        return "morpho-other"
    BUCKETS = [
        ("tokenize", "tokenizer/", None),
        ("dictionary-analyze (suffix-class walks)", "morpho/dictionary.py", None),
        ("guesser-rules", "morpho/english_guesser.py", None),
        ("tagger-decode (viterbi)", "morpho/tagger.py", None),
        ("morpho-other", "morpho/", None),
        ("gazetteer-trie/recasing", "ner/fast.py", r"pins|gaz|_casing|recase|trie"),
        ("gazetteer-trie/recasing", "features/templates.py", r"recase|_key_entry|gaz"),
        ("feature-scoring", "ner/fast.py", None),
        ("feature-scoring", "features/templates.py", None),
        ("feature-scoring", "<string>", None),  # codegen'd _events_fn
        ("ner-decode", "ner/core.py", None),
        ("pipeline/batching", "ner/pipeline.py", None),
        ("pipeline/batching", "model/", None),
    ]
    for name, sub, funcpat in BUCKETS:
        if sub in f and (funcpat is None or re.search(funcpat, funcname)):
            return name
    return "other"


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "wide"
    n_sent = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    texts = corpus(kind, n_sent, "timed")
    warm = corpus(kind, 200, "warm")
    ntok = sum(len(t.split()) for t in texts)
    nforms = len({w for t in texts for w in t.split()})
    print(f"[{kind}] {len(texts)} sentences, {ntok} tokens, {nforms} distinct forms")

    from nametag_spark.model.binary_reader import load_binary_ner
    from nametag_spark.ner.pipeline import _BatchRecognizer

    # un-profiled reference pass FIRST (same fresh-load cold-cache protocol
    # as kernel_ab.engine_rep) so the tracing overhead is measured, not
    # guessed — cProfile's per-call hook costs ~2-3x on this kernel because
    # the per-unique-form work is many small Python calls. The overhead
    # scales with call count, so high-call-count buckets read somewhat
    # inflated; the table is a SHARE map, not an absolute-µs claim.
    model = load_binary_ner(MODEL)
    rec = _BatchRecognizer(model)
    rec.recognize_batch(_build_sentences(model, warm))
    t0 = time.perf_counter()
    rec.recognize_batch(_build_sentences(model, texts))
    base_wall = time.perf_counter() - t0
    print(f"un-profiled pass: {base_wall:.2f}s = {ntok / base_wall / 1000:.1f}k tok/s "
          f"({base_wall / ntok * 1e6:.1f} µs/token)")

    model = load_binary_ner(MODEL)
    rec = _BatchRecognizer(model)
    rec.recognize_batch(_build_sentences(model, warm))
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    sentences = _build_sentences(model, texts)
    rec.recognize_batch(sentences)
    pr.disable()
    wall = time.perf_counter() - t0
    print(f"profiled pass: {wall:.2f}s = {ntok / wall / 1000:.1f}k tok/s "
          f"({wall / ntok * 1e6:.1f} µs/token; tracing overhead {wall / base_wall:.2f}x)")

    st = pstats.Stats(pr)
    # per-bucket TOTTIME shares: tottime is exclusive (time in the frame
    # itself), so buckets sum to the profiled total without double counting
    shares: dict = {}
    rows = []
    total_tt = 0.0
    for (filename, lineno, funcname), (cc, nc, tt, ct, callers) in st.stats.items():
        b = bucket_of(filename, lineno, funcname)
        shares[b] = shares.get(b, 0.0) + tt
        total_tt += tt
        rows.append((tt, ct, nc, filename, lineno, funcname))

    print(f"\nper-bucket exclusive time (profiled total {total_tt:.2f}s):")
    print(f"{'bucket':<36} {'sec':>7} {'%':>6} {'µs/tok':>8}")
    for b, tt in sorted(shares.items(), key=lambda kv: -kv[1]):
        print(f"{b:<36} {tt:>7.2f} {tt / total_tt * 100:>5.1f}% {tt / ntok * 1e6:>8.2f}")

    print("\ntop 25 functions by exclusive time:")
    rows.sort(reverse=True)
    for tt, ct, nc, filename, lineno, funcname in rows[:25]:
        short = "/".join(filename.replace("\\", "/").split("/")[-2:])
        print(f"  {tt:7.2f}s  ({nc:>9} calls, cum {ct:7.2f}s)  {short}:{lineno} {funcname}")


if __name__ == "__main__":
    main()
