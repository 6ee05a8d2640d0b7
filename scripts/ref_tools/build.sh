#!/bin/bash
# Build scripts/ref_tools/morpho_tools.cpp against the UNMODIFIED reference
# sources in $BUILD (default /tmp/refbuild, created by reference_parity.sh).
#
# Links every reference object except the three CLI mains, plus the encoder /
# trainer translation units the reference's own 'exe' target doesn't compile
# (they ship only in MorphoDiTa's full distribution; NameTag builds just the
# runtime). Produces $BUILD/morpho_tools used by gen_goldens / fixture
# generation scripts.
set -euo pipefail

BUILD=${BUILD:-/tmp/refbuild}
REPO="$(cd "$(dirname "$0")/../.." && pwd)"

if [ ! -d "$BUILD/.build" ]; then
  echo "building reference first (see reference_parity.sh)"
  cp -r "${REF:-/root/reference}/src" "$BUILD"
  make -C "$BUILD" -j"$(nproc)" exe >/dev/null
fi

cd "$BUILD"
OBJS=$(ls .build/*.o | grep -vE "(run_ner|run_tokenizer|train_ner)\.")

EXTRA=""
for cpp in \
    morphodita/morpho/generic_morpho_encoder.cpp \
    morphodita/morpho/czech_morpho_encoder.cpp \
    morphodita/morpho/english_morpho_encoder.cpp \
    morphodita/morpho/english_morpho_guesser_encoder.cpp \
    morphodita/morpho/morpho_statistical_guesser_encoder.cpp \
    morphodita/morpho/morpho_prefix_guesser_encoder.cpp \
    morphodita/morpho/raw_morpho_dictionary_reader.cpp \
    morphodita/derivator/derivator_dictionary_encoder.cpp \
    morphodita/tagger/training_maps.cpp \
    morphodita/tokenizer/tokenizer_factory.cpp \
    morphodita/tokenizer/gru_tokenizer.cpp \
    morphodita/tokenizer/gru_tokenizer_factory.cpp \
    morphodita/tokenizer/gru_tokenizer_network.cpp \
    morphodita/tokenizer/gru_tokenizer_trainer.cpp \
    morphodita/tokenizer/czech_tokenizer_factory.cpp \
    morphodita/tokenizer/generic_tokenizer_factory.cpp \
    unilib/uninorms.cpp; do
  [ -f "$cpp" ] && EXTRA="$EXTRA $cpp"
done

# shellcheck disable=SC2086
g++ -std=c++11 -O2 -I. -o morpho_tools \
    "$REPO/scripts/ref_tools/morpho_tools.cpp" $EXTRA $OBJS -lpthread
echo "built $BUILD/morpho_tools"
"$BUILD/morpho_tools" 2>&1 | head -1 || true
