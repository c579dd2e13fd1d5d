from pandas_to_postgres_spark.streaming.events import windowed_event_counts

__all__ = ["windowed_event_counts"]
