"""Fuzz-compare nametag_spark's URL/email detector against the COMPILED
reference FSM (src/utils/url_detector.cpp).

Usage: python scripts/fuzz_url_detector.py [/root/reference] [/tmp/urlbuild]

Builds a tiny probe harness around the unmodified reference detector, then
drives both implementations over 24k cases (structured compositions +
adversarial random ASCII) and reports mismatches. The committed
URL_FSM_FIXTURE in __spark_entry__.py is a pinned 53-case subset of this."""

from __future__ import annotations

import os
import random
import string
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_SRC = r"""
#include "url_detector.h"
#include <cstdio>
#include <cstring>
using namespace ufal::nametag::utils;
int main() {
  char line[4096];
  while (fgets(line, sizeof line, stdin)) {
    size_t n = strlen(line);
    while (n && (line[n-1]=='\n' || line[n-1]=='\r')) line[--n] = 0;
    size_t len = 0;
    url_detector::url_type t = url_detector::detect(string_piece(line, n), &len);
    printf("%d\t%zu\n", (int)t, len);
  }
  return 0;
}
"""


def build_probe(ref: str, build_dir: str) -> str:
    os.makedirs(build_dir, exist_ok=True)
    probe = os.path.join(build_dir, "url_probe")
    if os.path.exists(probe):
        return probe
    src = os.path.join(build_dir, "url_probe.cpp")
    with open(src, "w") as f:
        f.write(PROBE_SRC)
    subprocess.run(
        ["g++", "-O1", "-std=c++11", f"-I{ref}/src/utils", src,
         f"{ref}/src/utils/url_detector.cpp", "-o", probe],
        check=True,
    )
    return probe


def gen_cases() -> list:
    rng = random.Random(7)
    atoms = ["http://", "https://", "ftp://", "www.", "example", "com", "org",
             "io", "x", "ab", "a", "1", "10", "255", "256", ".", "@", ":", "/",
             "//", "?", "#", "(", ")", ",", ";", "'", "!", "-", "_", "%", "=",
             "&", "+", "*", "~", "e.g", "bob", "pass", "8080", "txt", "co2m",
             "...", " ", "$"]
    cases = ["".join(rng.choice(atoms) for _ in range(rng.randint(2, 8)))
             for _ in range(4000)]
    rng2 = random.Random(99)
    alphabet = string.ascii_letters + string.digits + "$-_.+!*'(),%;/?:@&=#~ <>[]{}\\|\"^`"
    wild = ["".join(rng2.choice(alphabet) for _ in range(rng2.randint(1, 40)))
            for _ in range(20000)]
    seeds = ["a.bc", "1.2.3.4", "x@y.zw", "http://", "www.", ":80", "/p(q)r", "e.com/"]
    for i in range(0, len(wild), 2):
        s = rng2.choice(seeds)
        pos = rng2.randint(0, len(wild[i]))
        wild[i] = wild[i][:pos] + s + wild[i][pos:]
    return cases + wild


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    build_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="urlfuzz_")
    if not os.path.isdir(os.path.join(ref, "src", "utils")):
        print(f"reference not found at {ref}; skipping")
        return 0
    probe = build_probe(ref, build_dir)

    from nametag_spark.tokenizer.rules import detect_url_email

    cases = gen_cases()
    out = subprocess.run([probe], input="\n".join(cases), capture_output=True,
                         text=True).stdout.splitlines()
    bad = 0
    for case, line in zip(cases, out):
        t, ln = (int(x) for x in line.split("\t"))
        d = detect_url_email(case, 0)
        mine = (0, 0) if d is None else ({"URL": 1, "EMAIL": 2}[d[0]], d[1])
        if mine != (t, ln):
            bad += 1
            if bad <= 10:
                print(f"MISMATCH ref=({t},{ln}) mine={mine} :: {case!r}")
    print(f"{bad} mismatches / {len(out)} cases")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
