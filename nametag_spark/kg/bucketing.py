"""Bucketed table support for co-located joins (task brief: "bucketing for
co-located joins").

Writing both sides of a recurring join bucketed+sorted on the join key lets
Spark run a sort-merge join with NO exchange on either side — the shuffle
is paid once at write time and amortized over every subsequent join
(entity-id joins between the mention, entity, and triple tables are the
recurring pattern here). Bucketed writes go through the session catalog
(`saveAsTable`); the warehouse dir defaults to ./spark-warehouse or
spark.sql.warehouse.dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int = 16,
    sort_cols=None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort_cols = (
        bucket_cols if sort_cols is None else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str, on) -> bool:
    """True when joining the two bucketed tables plans no Exchange
    (diagnostic used by tests/EXPLAIN)."""
    on = [on] if isinstance(on, str) else list(on)
    plan = (
        spark.table(left)
        .join(spark.table(right), on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange" not in plan
