"""Build the reference-agreement eval assets (north rule: span F1 + triple
P/R vs the NameTag REFERENCE's own output, not just vs planted gold).

Requires the compiled unmodified reference (scripts/reference_parity.sh
builds /tmp/refbuild). Produces committed fixtures:

  fixtures/ref_agreement/model.ner          — trained by the REFERENCE
      train_ner on a 200-conversation synthetic CoNLL corpus (seed 42)
  fixtures/ref_agreement/reference_output.conll.gz — the reference
      run_ner's decode of the 500-conversation eval corpus (seed 20260816)

eval_report.py then decodes the SAME eval corpus with this engine's
binary-model reader (distributed) and scores span/triple agreement against
the committed reference output. The eval corpus itself is regenerated
deterministically — only the model and the reference's output are pinned.
"""

import gzip
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUILD = os.environ.get("BUILD", "/tmp/refbuild")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "ref_agreement")

REF_FEATURES = """Form/2
FormCapitalization/2
FormCaseNormalized/2
FormSuffix/1 2 4
NumericTimeValue/2
PreviousStage/3
URLEmailDetector/1 URL EMAIL
"""

TRAIN_SEED, TRAIN_CONVS = 42, 200
EVAL_SEED, EVAL_CONVS = 20260816, 2000


def eval_vertical() -> str:
    """The eval corpus as vertical text — deterministic; shared with
    eval_report.py via this function."""
    from nametag_spark.data.synth import synth_transcripts
    from nametag_spark.tokenizer.rules import tokenize_forms

    tdf, _ = synth_transcripts(n_conversations=EVAL_CONVS, seed=EVAL_SEED)
    lines = []
    for row in tdf.itertuples(index=False):
        for forms in tokenize_forms(row.text):
            lines.extend(forms)
            lines.append("")
    return "\n".join(lines) + "\n"


def main() -> None:
    from nametag_spark.data.synth import gold_to_conll, synth_transcripts

    os.makedirs(OUT, exist_ok=True)
    tdf, gdf = synth_transcripts(n_conversations=TRAIN_CONVS, seed=TRAIN_SEED)
    conll = gold_to_conll(tdf, gdf)

    feat_path = os.path.join(OUT, "features.txt")
    with open(feat_path, "w", encoding="utf-8") as f:
        f.write(REF_FEATURES)

    model_path = os.path.join(OUT, "model.ner")
    with open(model_path, "wb") as out:
        subprocess.run(
            [os.path.join(BUILD, "train_ner"), "english", "trivial", "features.txt",
             "2", "10", "-0.2", "0.1", "0.01", "0.5", "0"],
            input=conll.encode("utf-8"), stdout=out, cwd=OUT, check=True,
            stderr=subprocess.DEVNULL,
        )
    print(f"model: {model_path} ({os.path.getsize(model_path)} bytes)")

    vertical = eval_vertical()
    res = subprocess.run(
        [os.path.join(BUILD, "run_ner"), "--input=vertical", "--output=conll", model_path],
        input=vertical.encode("utf-8"), capture_output=True, check=True,
    )
    golden_path = os.path.join(OUT, "reference_output.conll.gz")
    with gzip.open(golden_path, "wb") as f:
        f.write(res.stdout)
    n_tokens = sum(1 for l in res.stdout.splitlines() if l.strip())
    print(f"reference output: {golden_path} ({n_tokens} tokens)")


if __name__ == "__main__":
    main()
