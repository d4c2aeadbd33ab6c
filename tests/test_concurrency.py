"""Optimistic concurrency: racing appends serialize through the atomic
create-if-absent commit; losers retry and land on later versions."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from delta_lake_spark import read_delta, write_delta


def test_concurrent_appends_all_land(spark, tmp_table):
    write_delta(spark.range(10).select(F.col("id")), tmp_table)

    def append(i: int) -> int:
        df = spark.range(i * 100, i * 100 + 10).select(F.col("id"))
        return write_delta(df, tmp_table)

    with ThreadPoolExecutor(max_workers=4) as pool:
        versions = list(pool.map(append, range(1, 5)))

    # every append won a distinct version and no rows were lost
    assert sorted(versions) == [1, 2, 3, 4]
    assert read_delta(spark, tmp_table).count() == 50
