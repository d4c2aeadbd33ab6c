from .operations import (
    batch_writer,
    read_batch_bronze,
    read_batch_delta,
    read_batch_raw,
    repair_quarantined,
    transform_bronze,
    transform_raw,
    update_bronze_table_status,
)

__all__ = [
    "read_batch_raw",
    "read_batch_bronze",
    "read_batch_delta",
    "transform_raw",
    "transform_bronze",
    "batch_writer",
    "update_bronze_table_status",
    "repair_quarantined",
]
