"""delta_lake_spark — a PySpark-native versioned-table analytics engine.

Re-creates the capabilities of the reference Delta Lake medallion
pipeline (see SURVEY.md) on stock PySpark: an ACID transaction log over
parquet, versioned reads with time travel, MERGE/DELETE/UPDATE by
touched-file rewrite, vacuum/compaction, plus the relational operator
surface and large-scale data-pipeline operators (dedup, similarity
search, text analysis) the driver's north star asks for.
"""

from .errors import (
    AppendOnlyTableError,
    ConcurrentModificationError,
    DataFileLostError,
    DeltaError,
    MergeAmbiguityError,
    RetentionSafetyError,
    SchemaMismatchError,
    TableNotFoundError,
    VersionNotFoundError,
)
from .catalog import Catalog
from .cdf import table_changes
from .log import DeltaLog, DomainMetadata, Snapshot
from .reader import read_delta
from .sql import sql
from .errors import ConstraintViolationError, UnsupportedProtocolError
from .log import Protocol
from .table import DeltaTable
from .writer import convert_to_delta, copy_into, write_delta

__all__ = [
    "table_changes",
    "Catalog",
    "sql",
    "DeltaLog",
    "DomainMetadata",
    "Snapshot",
    "DeltaTable",
    "read_delta",
    "write_delta",
    "convert_to_delta",
    "copy_into",
    "AppendOnlyTableError",
    "ConstraintViolationError",
    "UnsupportedProtocolError",
    "Protocol",
    "DeltaError",
    "ConcurrentModificationError",
    "SchemaMismatchError",
    "VersionNotFoundError",
    "DataFileLostError",
    "RetentionSafetyError",
    "TableNotFoundError",
    "MergeAmbiguityError",
]

__version__ = "0.1.0"
