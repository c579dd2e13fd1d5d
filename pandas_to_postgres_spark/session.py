"""SparkSession builder tuned for this engine.

Scale notes (100 TB design): AQE is on so join strategies and skewed shuffle
partitions are re-planned at runtime; shuffle partition count here is sized for
local[32] test runs — on a real cluster it should be ~2-3x total executor cores
or left to AQE coalescing. Arrow is enabled because every pandas interop path
(mapInPandas / pandas_udf, used by the HDF5 source and the multimodal
operators) moves data through Arrow record batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pandas_to_postgres_spark") -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default tuning."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (sources/pg_datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Python DataSourceStreamReaders (pgwire, hdf5) cannot implement
        # SupportsTriggerAvailableNow, so without the wrapper an
        # availableNow drain falls back to Trigger.Once semantics: ONE
        # batch only. If a killed query left a WAL-pending batch, the
        # restart's drain replays just that batch and stops BEFORE new
        # data — measured in the restart-resume integration test. The
        # wrapper snapshots the end offset at start and drains fully.
        .config("spark.sql.streaming.triggerAvailableNowWrapper.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet scans: vectorized reader on, sane split size for local runs
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
