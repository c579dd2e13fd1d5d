"""Row-level provenance: tag every row with where it came from.

Spark-first take on lineage capture (cf. Titian, VLDB 2015 — provenance
support *inside* Spark): rather than instrumenting the engine, stamp the
scan-time identifiers Catalyst already knows — source file, partition id,
and a per-partition row offset — as ordinary columns. Downstream operators
carry them like any data column, so after arbitrary
filter/join/dedup/sample stages every surviving row still names its origin
(file + position), which is what an auditable 100 TB training-data
pipeline needs ("which crawl shard did this training doc come from?").

Costs nothing at scale: ``input_file_name()`` and
``spark_partition_id()`` are metadata lookups, and the row offset is a
per-partition counter — no shuffle, no join against a lineage table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_provenance(
    df: DataFrame,
    file_col: str = "_prov_file",
    part_col: str = "_prov_partition",
    offset_col: str = "_prov_offset",
) -> DataFrame:
    """Add (source file, partition id, within-partition offset) columns.

    ``monotonically_increasing_id()`` already encodes
    ``partition_id << 33 | within_partition_offset``, so the offset is its
    low 33 bits — a pure map-side expression, NO window and NO shuffle.
    Deterministic for a fixed input layout (same files, same splits); after
    repartitioning the stamped values survive as ordinary data (that is the
    point — provenance travels with the row).
    """
    mid = F.monotonically_increasing_id()
    return (
        df.withColumn(file_col, F.input_file_name())
        .withColumn(part_col, F.spark_partition_id())
        .withColumn(offset_col, mid.bitwiseAND(F.lit((1 << 33) - 1)))
    )


def provenance_summary(df_with_prov: DataFrame, file_col: str = "_prov_file") -> DataFrame:
    """Rows surviving per source file — the audit rollup: after a pipeline
    (filter → dedup → sample), how much of each input shard remains."""
    return df_with_prov.groupBy(
        F.regexp_extract(F.col(file_col), r"[^/]+$", 0).alias("source_file")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
