from .incremental import stream_table_to_table, windowed_event_counts

__all__ = ["stream_table_to_table", "windowed_event_counts"]
