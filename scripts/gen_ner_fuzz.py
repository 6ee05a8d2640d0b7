"""NER decode-parity fuzz goldens: run the compiled reference run_ner over
deterministic ~10k-sentence corpora for each MorphoDiTa fixture model
(generic / czech / english) and commit the outputs. The corpora mix
dictionary forms, inflections, guesser-eligible OOV words, numbers and
punctuation — stressing the whole morpho+NER lattice far beyond the
hand-written parity sentences. tests/test_morphodita_fuzz.py replays the
same corpora through the Python reader and requires byte-identical spans.

Requires /tmp/refbuild (scripts/reference_parity.sh)."""

import gzip
import os
import random
import subprocess
import sys

BUILD = os.environ.get("BUILD", "/tmp/refbuild")
FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "morphodita")

POOLS = {
    "md": dict(  # generic english-ish (tiny_md.ner vocabulary)
        vocab="the a book books booked walk walks walked dog dogs cat cats man men "
              "run runs ran see sees saw saws park parks parked flight flights "
              "quickly in to I he she Praha Prahy čaj čaje město města be is was "
              "old older new newer Alice Bob Eve Karel".split(),
        oov="jumping played slowly Xylofon running stopped quietly flying "
            "walkings booking parking Zelda Praze limping".split(),
    ),
    "cs": dict(
        vocab="pila pily pije žena ženou voda Praha Prahy Praze Brno Brna Brně "
              "Karel Karla Novák Nováka je byla viděl malá malý velká velký nová "
              "nové v do a stát město městě on ona".split(),
        oov="nemalá nejnemalá vodou ženách ženami stojí nestojí Plzeň Ostrava "
            "viděla pískala zpívá nevelká".split(),
    ),
    "en": dict(
        vocab="the a be is was are been being good better best dog dogs walk "
              "walks walked walking city cities have has had do does London "
              "quick quicker in children feet mice went people John Smith Mary "
              "Alice Brown Jones Paris Prague unhappy".split(),
        oov="jumping fixes boxes carried stopping quickest unkind disliked "
            "nonstop swimming flies Torino Madrid Berlin runs costs dollars".split(),
    ),
}
EXTRAS = ["42", "3.14", "1990", ".", ",", "-", "+"]


def sentences(lang: str, n: int = 10000):
    rng = random.Random(f"nerfuzz:{lang}")
    pool = POOLS[lang]
    out = []
    for _ in range(n):
        k = rng.randint(3, 12)
        toks = []
        for _t in range(k):
            r = rng.random()
            if r < 0.72:
                toks.append(rng.choice(pool["vocab"]))
            elif r < 0.92:
                toks.append(rng.choice(pool["oov"]))
            else:
                toks.append(rng.choice(EXTRAS))
        if rng.random() < 0.8:
            toks.append(".")
        out.append(toks)
    return out


def vertical(sents) -> str:
    return "\n".join("\n".join(s) + "\n" for s in sents) + "\n"


def main() -> None:
    for lang, model in (("md", "tiny_md.ner"), ("cs", "tiny_cs.ner"), ("en", "tiny_en.ner")):
        sents = sentences(lang)
        res = subprocess.run(
            [os.path.join(BUILD, "run_ner"), "--input=vertical", "--output=conll",
             os.path.join(FIX, model)],
            input=vertical(sents).encode("utf-8"), capture_output=True, check=True,
        )
        path = os.path.join(FIX, f"ner_fuzz_golden_{lang}.conll.gz")
        with gzip.open(path, "wb") as f:
            f.write(res.stdout)
        n_ent = sum(1 for l in res.stdout.splitlines() if b"\tB-" in l)
        print(f"{lang}: {len(sents)} sentences, {n_ent} reference entities -> {path}")


if __name__ == "__main__":
    main()
