"""File-based sinks for training-data pipelines.

The reference's only sink is Postgres; a 100 TB training-data pipeline's
primary outputs are partitioned columnar datasets. These helpers encode the
layout decisions that matter at scale:

- ``partitionBy`` columns become directory partitions → downstream readers
  get partition PRUNING for free (filters on the partition column never
  touch excluded files).
- ``maxRecordsPerFile`` bounds file size so a skewed partition value cannot
  produce a multi-GB file (small-file problem's evil twin).
- writer-side ``repartition(partition_cols)`` lines task outputs up with
  directory partitions — without it, every task writes into every partition
  directory (tasks × partitions tiny files).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Partitioned parquet dataset write with file-size bounds."""
    if partition_cols:
        df = df.repartition(*partition_cols)
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    num_partitions: Optional[int] = None,
) -> None:
    """CSV export (the reference's wire format, as a file sink). NULL →
    empty field, matching the COPY convention (`/root/reference/
    pandas_to_postgres/utilities.py:90`)."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    df.write.mode(mode).option("header", str(header).lower()).option(
        "nullValue", ""
    ).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export (interchange format for document pipelines)."""
    df.write.mode(mode).json(path)


def compact_dataset(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: Sequence[str] = (),
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files; returns
    the output file count.

    The small-file problem is the dominant operational failure of long-run
    ingest at scale: streaming/foreachBatch sinks and over-parallel writers
    leave thousands of KB-sized files, and every downstream scan pays a
    task + footer read per file. Compaction = read → repartition to
    ceil(total_bytes / target) → rewrite. Sizing uses the filesystem's
    content summary (works for any Hadoop-compatible FS), not driver-side
    file listing.

    With ``partition_cols`` the repartition keys on those columns so each
    task writes into one directory partition (otherwise tasks x partitions
    small files come right back).
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(conf)
    total_bytes = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(in_path)
    if partition_cols:
        df = df.repartition(n, *partition_cols)
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_path)
    else:
        df = df.repartition(n)
        df.write.mode("overwrite").parquet(out_path)
    out = spark.read.parquet(out_path)
    return len([f for f in out.inputFiles()])


def write_sorted(
    df: DataFrame,
    path: str,
    order_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Globally-sorted parquet export WITHOUT a single-reducer sort.

    ``repartitionByRange`` samples the order keys and assigns each task a
    disjoint key range (range partitioner — file i's keys all precede
    file i+1's), then ``sortWithinPartitions`` orders inside each task.
    Reading files in part-number order yields the total order, but no
    executor ever sees more than 1/num_files of the data and there is no
    driver-side or single-task global sort — the standard final step for
    a training corpus that must stream in a fixed order.

    Parquet row-group min/max stats on the sort column additionally give
    downstream range scans file- and row-group-level skipping."""
    (
        df.repartitionByRange(num_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode(mode)
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leaving all other partition directories untouched — the
    idempotent daily-job write (re-running a day replaces that day, never
    truncates history). Static overwrite mode (Spark's default) would drop
    the WHOLE dataset first; the WRITER-scoped
    ``option("partitionOverwriteMode", "dynamic")`` (takes precedence over
    the session conf since Spark 2.4) scopes the overwrite to the incoming
    partition values without mutating session state — a save/set/restore
    of the global conf would race concurrent writes on the same session."""
    (
        df.repartition(*partition_cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_parquet_observed(
    df: DataFrame,
    path: str,
    null_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> dict:
    """Parquet write with IN-FLIGHT load metrics via ``df.observe``:
    row count and per-column null counts are accumulated on the rows as
    they stream through the write — no second scan, unlike the
    count()-after-write pattern that re-reads the whole input (at 100 TB
    the difference is the job's entire scan cost, twice). Returns the
    metrics dict, e.g. ``{"rows": n, "nulls_x": k}`` — the hook for load
    auditing and freshness/completeness gates (`dq_checks_orders` is the
    query-side twin; this is the sink-side one).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("load_metrics")
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
        for c in null_cols
    ]
    df.observe(obs, *metrics).write.mode(mode).parquet(path)
    return obs.get
