"""spark-submit entry points mirroring the reference CLIs.

train (reference: src/train_ner.cpp:50-84, same parameter set;
tagger = trivial | shape | morphodita:<tagger_file>):
  python -m nametag_spark.cli train <ner_id> <tagger> <features_file> \
      <stages> <iterations> <missing_weight> <initial_lr> <final_lr> \
      <gaussian_sigma> <hidden_layer> <train.conll> <model_dir> [heldout.conll]

recognize (reference: src/run_ner.cpp, output formats xml/vertical/conll +
the mention/kg tables this engine adds):
  python -m nametag_spark.cli recognize <model_dir> <input_parquet> \
      <output_path> [--format mentions|conll|vertical|xml|triples]

tokenize (reference: src/run_tokenizer.cpp:23-48 — tokenize-only driver):
  python -m nametag_spark.cli tokenize <input_parquet> <output_path> \
      [--format tokens|vertical|xml] [--lang en|cs|generic|gru:<factory-file>]
"""

from __future__ import annotations

import sys


def main_train(argv) -> int:
    if len(argv) < 12:
        print(__doc__, file=sys.stderr)
        return 1
    (ner_id, tagger, features_file, stages, iterations, missing_weight,
     lr0, lrF, sigma, hidden, train_path, model_dir) = argv[:12]
    heldout_path = argv[12] if len(argv) > 12 else None
    tagger_obj = None
    if tagger.startswith("morphodita:"):
        # reference train_ner tagger spec (tagger_ids::parse + the
        # morphodita tagger's option = its .tagger file): the stream is
        # embedded verbatim into the saved model
        from .morpho.morphodita import MorphoditaTagger

        tagger_obj = MorphoditaTagger.load(tagger.split(":", 1)[1])
    elif tagger == "shape":
        # engine-specific deterministic shape tagger: empty dictionary +
        # suffix rule guesser decoded with zero perceptron weights — makes
        # RawLemma*/Lemma/Tag templates live without a trained morphology
        from .morpho.dictionary import Morpho, MorphoDictionary, SuffixRuleGuesser
        from .morpho.tagger import MorphoTagger, PerceptronTagger

        tagger_obj = MorphoTagger(
            Morpho(MorphoDictionary(), SuffixRuleGuesser(), unknown_tag="UNK"),
            PerceptronTagger(),
        )
    elif tagger != "trivial":
        print("unsupported tagger spec (trivial | shape | morphodita:<file>)", file=sys.stderr)
        return 1
    if ner_id not in ("czech", "english", "generic"):
        print(f"unknown ner_id {ner_id!r} (czech|english|generic)", file=sys.stderr)
        return 1

    from .train.trainer import train_ner

    with open(features_file, encoding="utf-8") as f:
        templates = f.read()
    with open(train_path, encoding="utf-8") as f:
        train_conll = f.read()
    heldout_conll = None
    if heldout_path:
        with open(heldout_path, encoding="utf-8") as f:
            heldout_conll = f.read()

    import os

    model = train_ner(
        templates,
        train_conll,
        heldout_conll,
        stages=int(stages),
        params={
            "iterations": int(iterations),
            "missing_weight": float(missing_weight),
            "initial_learning_rate": float(lr0),
            "final_learning_rate": float(lrF),
            "gaussian_sigma": float(sigma),
            "hidden_layer": int(hidden),
        },
        base_dir=os.path.dirname(os.path.abspath(features_file)),
        tagger=tagger_obj,
        verbose=True,
    )
    # the CLI's <ner_id> selects the model's tokenizer like the reference
    # (train_ner.cpp parses it via ner_ids::parse; bilou_ner::new_tokenizer
    # dispatches on it)
    model.ner_lang = ner_id
    model.save(model_dir)
    print(f"model saved to {model_dir}", file=sys.stderr)
    return 0


def main_recognize(argv) -> int:
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    model_dir, input_path, output_path = argv[:3]
    fmt = "mentions"
    if len(argv) > 3 and (argv[3] == "--format" or argv[3].startswith("--format=")):
        if "=" in argv[3]:
            fmt = argv[3].split("=", 1)[1]
        elif len(argv) > 4:
            fmt = argv[4]
        else:
            print("--format requires a value", file=sys.stderr)
            return 1

    from .session import get_spark

    spark = get_spark(app_name="nametag_spark_recognize")
    df = spark.read.parquet(input_path)

    if fmt == "mentions":
        from .ner.pipeline import recognize_df

        recognize_df(df, model_dir).write.mode("overwrite").parquet(output_path)
    elif fmt in ("conll", "vertical", "xml"):
        from .sinks.render import render_df

        render_df(df, model_dir, fmt=fmt).write.mode("overwrite").parquet(output_path)
    elif fmt == "triples":
        from .kg.graph_io import build_knowledge_graph

        build_knowledge_graph(spark, df, model_dir, output_path)
    else:
        print(f"unknown format {fmt!r}", file=sys.stderr)
        return 1
    print(f"written to {output_path}", file=sys.stderr)
    return 0


def main_tokenize(argv) -> int:
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    input_path, output_path = argv[:2]
    fmt, lang = "tokens", "en"
    rest = argv[2:]
    while rest:
        a = rest.pop(0)
        if a == "--format" or a.startswith("--format="):
            if "=" in a:
                fmt = a.split("=", 1)[1]
            elif rest:
                fmt = rest.pop(0)
            else:
                print("--format requires a value", file=sys.stderr)
                return 1
        elif a == "--lang" or a.startswith("--lang="):
            if "=" in a:
                lang = a.split("=", 1)[1]
            elif rest:
                lang = rest.pop(0)
            else:
                print("--lang requires a value", file=sys.stderr)
                return 1
        else:
            print(f"unknown argument {a!r}", file=sys.stderr)
            return 1

    from .session import get_spark

    spark = get_spark(app_name="nametag_spark_tokenize")
    df = spark.read.parquet(input_path)

    if fmt == "tokens":
        from pyspark.sql import functions as F

        from .ner.pipeline import tokenize_df

        # the token table keys on (conv_id, turn_idx); synthesize them for
        # plain document inputs
        if "conv_id" not in df.columns:
            df = df.withColumn("conv_id", F.monotonically_increasing_id().cast("string"))
        if "turn_idx" not in df.columns:
            df = df.withColumn("turn_idx", F.lit(0))
        tokenize_df(df, lang=lang).write.mode("overwrite").parquet(output_path)
    elif fmt in ("vertical", "xml"):
        # run_tokenizer.cpp:54-87 renders without entities: vertical = one
        # form per line, blank line per sentence; xml = <sentence>/<token>
        # markup preserving inter-token text (≡ render_xml with no entities)
        from .tokenizer.rules import tokenize_sentences
        from .sinks.render import render_xml

        other = [c for c in df.columns if c != "text"]

        def fn(batches):
            for pdf in batches:
                rendered = []
                for text in pdf["text"]:
                    if text is None:
                        rendered.append("")
                        continue
                    spans = tokenize_sentences(text, lang)
                    if fmt == "vertical":
                        rendered.append(
                            "".join(
                                "".join(text[s : s + l] + "\n" for (s, l) in sent) + "\n"
                                for sent in spans
                            )
                        )
                    else:
                        rendered.append(render_xml(text, spans, [[] for _ in spans]))
                out = pdf[other].copy()
                out["rendered"] = rendered
                yield out

        schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c != "text")
        schema = (schema + ", " if schema else "") + "rendered string"
        df.mapInPandas(fn, schema).write.mode("overwrite").parquet(output_path)
    else:
        print(f"unknown format {fmt!r}", file=sys.stderr)
        return 1
    print(f"written to {output_path}", file=sys.stderr)
    return 0


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("train", "recognize", "tokenize"):
        print(__doc__, file=sys.stderr)
        return 1
    if sys.argv[1] == "train":
        return main_train(sys.argv[2:])
    if sys.argv[1] == "tokenize":
        return main_tokenize(sys.argv[2:])
    return main_recognize(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
