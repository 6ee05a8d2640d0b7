"""CoNLL 2-column reader as a Spark source (SURVEY.md §2.1 S3).

The reference trainer reads `form<TAB>label`, blank line = sentence
(/root/reference/src/ner/bilou_ner_trainer.cpp:77-125). Here the file is
read distributed (spark.read.text keeps line order within a file via a
window over a monotonic id) and grouped into sentences; labels can then be
BIO->BILOU converted relationally (ops.labels.bio_to_bilou_df).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """-> (sent_id:long, tok_idx:int, form:string, label:string).

    Sentence ids are global (running count of blank-line separators).
    """
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_id"), F.col("value")
    )
    w = Window.orderBy("line_id")
    # sentence id = number of blank lines seen so far
    with_sent = lines.withColumn(
        "sent_id",
        F.sum(F.when(F.trim("value") == "", 1).otherwise(0)).over(w),
    ).where(F.trim("value") != "")
    parts = F.split("value", "\t")
    toks = with_sent.select(
        "sent_id",
        "line_id",
        parts.getItem(0).alias("form"),
        parts.getItem(1).alias("label"),
    )
    w2 = Window.partitionBy("sent_id").orderBy("line_id")
    return toks.withColumn("tok_idx", (F.row_number().over(w2) - 1).cast("int")).select(
        "sent_id", "tok_idx", "form", "label"
    )


def conll_sentences(df: DataFrame):
    """Collect a CoNLL token table into [(forms, labels)] on the driver
    (training corpora are small; SURVEY.md §2.7)."""
    rows = df.orderBy("sent_id", "tok_idx").collect()
    out = []
    cur_id = None
    forms: list = []
    labels: list = []
    for r in rows:
        if r["sent_id"] != cur_id:
            if forms:
                out.append((forms, labels))
            forms, labels = [], []
            cur_id = r["sent_id"]
        forms.append(r["form"])
        labels.append(r["label"])
    if forms:
        out.append((forms, labels))
    return out
