"""Driver script for spark-submit --py-files validation."""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("nametag_spark_submit_test")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)

from nametag_spark.data.synth import synth_transcripts, gold_to_conll
from nametag_spark.train.trainer import train_ner
from nametag_spark.ner.pipeline import recognize_df
from nametag_spark.kg.resolution import resolve_entities
from nametag_spark.kg.triples import extract_triples

tdf, gdf = synth_transcripts(n_conversations=20, seed=1)
model = train_ner("Form/2\nFormCapitalization/2\nFormSuffix/1 2 4\nPreviousStage/2",
                  gold_to_conll(tdf, gdf), stages=2, params={"iterations": 4})
model.save("/tmp/submit_model")

edf, _ = synth_transcripts(n_conversations=10, seed=9)
transcripts = spark.createDataFrame(edf)
mentions = recognize_df(transcripts, "/tmp/submit_model")
me, ents = resolve_entities(mentions)
triples = extract_triples(me, transcripts)
print(f"SUBMIT_OK mentions={mentions.count()} entities={ents.count()} triples={triples.count()}")
spark.stop()
