#!/bin/bash
# Reproduce every compiled-reference parity artifact in this repo.
#
# 1. builds the UNMODIFIED reference (copied out of the read-only mount)
# 2. regenerates fixtures/tiny_ref.ner with the reference's own train_ner
# 3. re-runs the reference run_ner on the parity sentences
# 4. fuzz-compares the Python URL/email detector against the reference FSM
#
# Requires: g++ (any C++11), ~2 min of build time.
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
REPO="$(cd "$(dirname "$0")/.." && pwd)"

if [ ! -x "$BUILD/train_ner" ]; then
  echo "== building reference in $BUILD"
  rm -rf "$BUILD"
  cp -r "$REF/src" "$BUILD"
  make -C "$BUILD" -j"$(nproc)" exe >/dev/null
fi

echo "== retraining fixtures/tiny_ref.ner with the reference trainer"
WORK=$(mktemp -d)
cp "$REPO/fixtures/tiny_ref_features.txt" "$WORK/features.txt"
cp "$REPO/fixtures/tiny_ref_train.conll" "$WORK/big.conll"
cat > "$WORK/brown.tsv" <<'EOF'
00	Prague
00	Berlin
00	London
01	Acme
10	Alice
10	Bob
EOF
cat > "$WORK/gaz_loc.txt" <<'EOF'
Prague
Berlin
London
New York
EOF
(cd "$WORK" && "$BUILD/train_ner" english trivial features.txt 2 8 -0.2 0.1 0.01 0.5 0 \
  < big.conll > tiny.ner 2>/dev/null)
if cmp -s "$WORK/tiny.ner" "$REPO/fixtures/tiny_ref.ner"; then
  echo "   byte-identical to committed fixtures/tiny_ref.ner"
else
  echo "   differs from committed fixture (toolchain variation) — running decode parity anyway"
fi

echo "== reference run_ner decode on the parity sentences"
printf 'Alice\nJohnson\nworks\nat\nAcme\nCorp\nin\nPrague\n.\n\nBob\nvisited\nLondon\nand\nBerlin\nyesterday\n.\n\nContact\nalice@acme.com\nor\nsee\nhttps://acme.com\nnow\n.\n\nEve\nflew\nto\nNew\nYork\n.\n\n' \
  | "$BUILD/run_ner" --input=vertical --output=vertical "$WORK/tiny.ner" 2>/dev/null

echo "== URL/email detector fuzz vs the compiled reference FSM"
python3 "$REPO/scripts/fuzz_url_detector.py" "$REF" "$BUILD"

echo "== binary-model pytest parity (uses $BUILD/run_ner when present)"
(cd "$REPO" && python -m pytest tests/test_binary_model.py -q)
