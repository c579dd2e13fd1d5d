"""IS NULL / IS NOT NULL planning-time pruning from the per-file footer
null counts the manifest records for its stat columns."""

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M


@pytest.fixture
def table(spark, tmp_path):
    """3 files: all-null v, no-null v, mixed v."""
    p = str(tmp_path / "nulls_tbl")
    spark.range(0, 100).selectExpr(
        "id AS k", "CAST(NULL AS DOUBLE) AS v"
    ).coalesce(1).write.parquet(p)
    spark.range(100, 200).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(p)
    spark.range(200, 300).selectExpr(
        "id AS k",
        "CASE WHEN id % 2 = 0 THEN CAST(id AS DOUBLE) END AS v",
    ).coalesce(1).write.mode("append").parquet(p)
    M.publish_snapshot(p, ["k", "v"])
    return p


class TestNullCountStats:
    def test_entries_record_null_counts(self, table):
        snap = M.load_snapshot(table)
        by_nulls = sorted(e["nulls"]["v"] for e in snap["files"])
        assert by_nulls == [0, 50, 100]
        assert all(e["nulls"]["k"] == 0 for e in snap["files"])

    def test_is_null_prunes_no_null_files(self, spark, table):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
            SnapshotReader,
        )
        from pyspark.sql.datasource import IsNull

        r = SnapshotReader({"path": table}, ["k", "v"])
        list(r.pushFilters([IsNull(("v",))]))
        parts = r.partitions()
        assert len(parts) == 2, "the zero-null file must be pruned"

        spark.dataSource.register(SnapshotDataSource)
        got = (
            spark.read.format("snapshot").option("path", table).load()
            .filter(F.col("v").isNull())
            .count()
        )
        assert got == 150

    def test_is_not_null_prunes_all_null_files(self, spark, table):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotReader,
        )
        from pyspark.sql.datasource import IsNotNull

        r = SnapshotReader({"path": table}, ["k", "v"])
        list(r.pushFilters([IsNotNull(("v",))]))
        parts = r.partitions()
        assert len(parts) == 2, "the all-null file must be pruned"

    def test_unknown_column_conservative(self, table):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotReader,
        )
        from pyspark.sql.datasource import IsNull

        r = SnapshotReader({"path": table}, ["k", "v"])
        r.null_preds["w"] = True  # no stats for w anywhere
        assert len(r.partitions()) == 3
