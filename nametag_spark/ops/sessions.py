"""Sessionization: gap-based session assignment over an event stream.

Classic windowed derivation (no reference analogue; standard pipeline op):
a new session starts when the gap to the previous event of the same user
exceeds the threshold; session_id = running count of session starts. One
shuffle on the partition key; everything else is window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Adds session_seq (per-user session ordinal, 1-based) and a globally
    unique session_id string."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-exact gap; works for both TIMESTAMP and TIMESTAMP_NTZ
    # (session timezone is UTC in get_spark)
    micros = lambda c: F.unix_micros(c.cast("timestamp")).cast("double")  # noqa: E731
    gap_s = (micros(F.col(ts_col)) - micros(prev_ts)) / 1e6
    new_session = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return (
        df.withColumn("_new", new_session)
        .withColumn("session_seq", F.sum("_new").over(w).cast("int"))
        .drop("_new")
        .withColumn("session_id", F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq")))
    )


def session_stats(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-session aggregates: bounds, event count, value sum."""
    s = sessionize(df, user_col, ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )
