import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from nametag_spark.session import get_spark

    s = get_spark(app_name="nametag_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    """A tiny 2-stage model trained on synthetic transcripts (seed-fixed)."""
    from nametag_spark.data.synth import gold_to_conll, synth_transcripts
    from nametag_spark.train.trainer import train_ner

    tdf, gdf = synth_transcripts(n_conversations=40, seed=1)
    hdf, hgdf = synth_transcripts(n_conversations=10, seed=2)
    templates = """
Form/2
FormCapitalization/2
FormCaseNormalized/2
FormSuffix/1 2 4
NumericTimeValue/2
PreviousStage/3
URLEmailDetector/1 URL EMAIL
"""
    model = train_ner(
        templates,
        gold_to_conll(tdf, gdf),
        gold_to_conll(hdf, hgdf),
        stages=2,
        params={"iterations": 6},
    )
    out = str(tmp_path_factory.mktemp("model") / "tiny")
    model.save(out)
    return out
