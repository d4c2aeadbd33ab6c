"""End-to-end medallion pipeline: raw -> bronze -> silver (+quarantine
repair) -> gold, reproducing the control flow of the reference's
04_main.py:11-47 on the synthetic events table and our table format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..reader import read_delta
from .operations import (
    batch_writer,
    make_raw_json,
    read_batch_bronze,
    read_batch_raw,
    repair_quarantined,
    split_clean_quarantine,
    transform_bronze,
    transform_raw,
    update_bronze_table_status,
)


def run_pipeline(
    spark: SparkSession, events: DataFrame, base_dir: str
) -> dict[str, str]:
    """Run the full medallion flow; returns the zone paths.

    ``events`` is the source feed; rows whose user_id arrives null are
    quarantined at the silver gate and later repaired via the user
    dimension (derived from the feed's own event->user mapping, standing
    in for the reference's health_tracker_user table, user.py:99-105).
    """
    raw_path = os.path.join(base_dir, "raw")
    bronze_path = os.path.join(base_dir, "bronze")
    silver_path = os.path.join(base_dir, "silver")
    gold_path = os.path.join(base_dir, "gold")

    # user dimension for the repair join (event -> user mapping)
    user_dim = events.select("event_id", "user_id")

    # --- ingest: simulated Kafka feed lands JSON-lines text (00_ingest) ---
    corrupted = events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 17 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )
    make_raw_json(corrupted).write.mode("overwrite").text(raw_path)

    # --- raw -> bronze (01_raw_to_bronze) ---
    raw_df = read_batch_raw(spark, raw_path)
    bronze_ready = transform_raw(raw_df)
    batch_writer(bronze_ready, partition_column="p_ingestdate")(bronze_path)

    # --- bronze -> silver with quarantine (02_bronze_to_silver) ---
    new_rows = read_batch_bronze(spark, bronze_path)
    silver = transform_bronze(new_rows)
    clean, quarantined = split_clean_quarantine(silver)
    batch_writer(clean, partition_column="p_eventdate", exclude_columns=["value"])(
        silver_path
    )
    update_bronze_table_status(spark, bronze_path, clean.select("value"), "loaded")
    update_bronze_table_status(
        spark, bronze_path, quarantined.select("value"), "quarantined"
    )

    # --- quarantine repair via dimension join (03_silver_update) ---
    repaired = repair_quarantined(spark, bronze_path, user_dim)
    batch_writer(repaired, partition_column="p_eventdate", exclude_columns=["value"])(
        silver_path
    )
    update_bronze_table_status(spark, bronze_path, repaired.select("value"), "loaded")

    # --- silver -> gold aggregate (rapid_start gold pattern :185-198) ---
    gold = (
        read_delta(spark, silver_path)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("reading").alias("avg_reading"),
            F.max("reading").alias("max_reading"),
            F.stddev("reading").alias("std_reading"),
        )
    )
    batch_writer(gold)(gold_path, mode="overwrite")

    return {
        "raw": raw_path,
        "bronze": bronze_path,
        "silver": silver_path,
        "gold": gold_path,
    }
