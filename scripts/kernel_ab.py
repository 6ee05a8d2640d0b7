"""Single-core kernel A/B: engine vs compiled reference run_ner on the SAME
corpora (round-5 verdict #2).

Two corpora, both fully-distinct sentences (no sentence-memo hits):
  fuzz  — gen_ner_fuzz czech pools (~60 distinct forms): per-form caches HIT,
          measures the decode/scorer kernel (the judge's 215-228k protocol).
  wide  — syllable-built pseudo-words, ~tens of thousands of DISTINCT FORMS:
          per-form morpho caches MISS, measures the dictionary-analyze +
          guesser miss path (the realistic fresh-web-text worst case).

Engine protocol per rep: FRESH model load (all per-form/sentence caches
cold), warm-up on a 200-sentence pool drawn from the same distribution but
disjoint from the timed corpus (python-JIT/alloc warm-up without seeding
form caches for timed tokens beyond the natural overlap), then ONE timed
pass text -> tokenize -> recognize. tok/s = whitespace tokens / seconds.

Reference protocol: run_ner <model> over the same text file; model load is
netted out by running the corpus once and concatenated x3 and taking the
marginal (T3 - T1) / (2 * ntok).

Usage: python scripts/kernel_ab.py [fuzz|wide|both] [reps]
Requires /tmp/refbuild/run_ner (scripts/reference_parity.sh) for the
reference side; engine-only numbers print regardless.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "morphodita")
MODEL = os.path.join(FIX, "tiny_cs.ner")
RUN_NER = os.environ.get("BUILD", "/tmp/refbuild") + "/run_ner"

_SYLLABLES = (
    "ba be bo bu da de do du ga ge go gu cha che la le lo lu ma me mo mu "
    "na ne no nu pa pe po pu ra re ro ru sa se so su ta te to tu va ve vo "
    "vu za ze zo zu pra pre sta sto kra kre vla vle dra dre"
).split()


def _pseudo(rng: random.Random) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))


def corpus(kind: str, n_sentences: int, seed: str):
    """List of sentence texts (space-joined tokens), all distinct."""
    from gen_ner_fuzz import EXTRAS, POOLS

    rng = random.Random(f"kernel_ab:{kind}:{seed}")
    pool = POOLS["cs"]
    out = []
    seen = set()
    for i in range(n_sentences):
        k = rng.randint(3, 12)
        toks = []
        for _t in range(k):
            r = rng.random()
            if kind == "wide":
                if r < 0.50:
                    toks.append(_pseudo(rng))
                elif r < 0.65:
                    toks.append(_pseudo(rng).capitalize())
                elif r < 0.92:
                    toks.append(rng.choice(pool["vocab"]))
                else:
                    toks.append(rng.choice(EXTRAS))
            else:
                if r < 0.72:
                    toks.append(rng.choice(pool["vocab"]))
                elif r < 0.92:
                    toks.append(rng.choice(pool["oov"]))
                else:
                    toks.append(rng.choice(EXTRAS))
        if rng.random() < 0.8:
            toks.append(".")
        t = " ".join(toks)
        if t in seen:
            t = t + f" {i}"
        seen.add(t)
        out.append(t)
    return out


def _build_sentences(model, texts):
    from nametag_spark.tokenizer.rules import tokenize_sentences

    forms_lists = []
    for t in texts:
        for spans in tokenize_sentences(t, "cs"):
            forms_lists.append([t[a : a + b] for (a, b) in spans])
    return model.make_sentence_batch(forms_lists)


def engine_rep(texts, warm_texts) -> tuple[float, int]:
    """(seconds, ntok) for one cold-cache timed pass."""
    from nametag_spark.model.binary_reader import load_binary_ner
    from nametag_spark.ner.pipeline import _BatchRecognizer

    model = load_binary_ner(MODEL)
    rec = _BatchRecognizer(model)
    rec.recognize_batch(_build_sentences(model, warm_texts))
    ntok = sum(len(t.split()) for t in texts)
    t0 = time.perf_counter()
    rec.recognize_batch(_build_sentences(model, texts))
    dt = time.perf_counter() - t0
    return dt, ntok


def reference_rep(path1, path3, ntok: int) -> tuple[float, float]:
    """(steady_state_toks_per_sec, single_pass_toks_per_sec_incl_load)."""

    def run(path):
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            subprocess.run([RUN_NER, MODEL], stdin=f, stdout=subprocess.DEVNULL, check=True)
        return time.perf_counter() - t0

    t1 = run(path1)
    t3 = run(path3)
    return 2 * ntok / max(t3 - t1, 1e-9), ntok / t1


def main() -> None:
    kinds = ["fuzz", "wide"] if (len(sys.argv) < 2 or sys.argv[1] == "both") else [sys.argv[1]]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    have_ref = os.path.exists(RUN_NER)
    for kind in kinds:
        texts = corpus(kind, 8000, "timed")
        warm = corpus(kind, 200, "warm")
        ntok = sum(len(t.split()) for t in texts)
        nforms = len({w for t in texts for w in t.split()})
        print(f"[{kind}] {len(texts)} sentences, {ntok} tokens, {nforms} distinct forms")
        p1 = f"/tmp/kernel_ab_{kind}.txt"
        p3 = f"/tmp/kernel_ab_{kind}_x3.txt"
        body = "\n".join(texts) + "\n"
        with open(p1, "w") as f:
            f.write(body)
        with open(p3, "w") as f:
            f.write(body * 3)
        # interleaved: each rep measures engine then reference back-to-back,
        # so a host-load window hits both sides equally
        eng, ref_ss, ref_one = [], [], []
        for r in range(reps):
            dt, n = engine_rep(texts, warm)
            eng.append(n / dt)
            print(f"  rep{r}: engine {eng[-1] / 1000:.1f}k tok/s")
            if have_ref:
                ss, one = reference_rep(p1, p3, ntok)
                ref_ss.append(ss)
                ref_one.append(one)
                print(f"  rep{r}: reference steady {ss / 1000:.1f}k, incl-load {one / 1000:.1f}k tok/s")
        eng.sort()
        med = eng[len(eng) // 2]
        line = f"[{kind}] engine median {med / 1000:.1f}k tok/s (range {eng[0] / 1000:.1f}-{eng[-1] / 1000:.1f}k)"
        if have_ref:
            ref_ss.sort()
            rmed = ref_ss[len(ref_ss) // 2]
            line += f" | reference steady median {rmed / 1000:.1f}k -> ratio {med / rmed:.2f}x"
        print(line)


if __name__ == "__main__":
    main()
