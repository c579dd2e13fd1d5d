"""Named refs on the snapshot table: immutable tags, movable branches,
ref-aware retention, the DataSource ``ref`` option, and the
write-audit-publish flow built on a ``main`` branch."""

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.manifest import (
    list_refs,
    read_snapshot_ref,
    resolve_ref,
    set_branch,
    tag_snapshot,
)


@pytest.fixture
def table(spark, tmp_path):
    p = str(tmp_path / "refs_tbl")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(p)
    M.publish_snapshot(p, ["k"])
    spark.range(100, 150).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.mode("append").parquet(p)
    M.append_snapshot(p, [
        f for f in sorted(__import__("os").listdir(p))
        if f.endswith(".parquet")
        and f not in {e["path"] for e in M.load_snapshot(p, 1)["files"]}
    ])
    return p


class TestTagsAndBranches:
    def test_tags_are_immutable_and_idempotent(self, table):
        assert tag_snapshot(table, "v1.0", 1) == 1
        assert tag_snapshot(table, "v1.0", 1) == 1  # same version: no-op
        with pytest.raises(ValueError, match="immutable"):
            tag_snapshot(table, "v1.0", 2)
        assert resolve_ref(table, "v1.0") == 1

    def test_branches_move(self, table):
        set_branch(table, "main", 1)
        assert resolve_ref(table, "main") == 1
        set_branch(table, "main", 2)
        assert resolve_ref(table, "main") == 2
        refs = list_refs(table)
        assert refs["branches"] == {"main": 2}

    def test_read_through_ref(self, spark, table):
        tag_snapshot(table, "first", 1)
        assert read_snapshot_ref(spark, table, "first").count() == 100
        set_branch(table, "main", 2)
        assert read_snapshot_ref(spark, table, "main").count() == 150

    def test_datasource_ref_option(self, spark, table):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        tag_snapshot(table, "audit", 1)
        spark.dataSource.register(SnapshotDataSource)
        df = (
            spark.read.format("snapshot")
            .option("path", table)
            .option("ref", "audit")
            .load()
        )
        assert df.count() == 100
        with pytest.raises(Exception, match="at most one"):
            (
                spark.read.format("snapshot")
                .option("path", table)
                .option("ref", "audit")
                .option("version", 2)
                .load()
                .count()
            )

    def test_expire_never_retires_reffed_versions(self, spark, table):
        tag_snapshot(table, "keepme", 1)
        res = M.expire_snapshots(table, keep_latest=1)
        assert res["expired_versions"] == []
        assert M.read_snapshot(spark, table, version=1).count() == 100
        # untag-equivalent: a version with no ref and out of window expires
        spark.range(150, 160).selectExpr("id AS k", "id * 2 AS v").coalesce(
            1
        ).write.mode("append").parquet(table)
        import os

        head = {e["path"] for e in M.load_snapshot(table)["files"]}
        M.append_snapshot(table, [
            f for f in sorted(os.listdir(table))
            if f.endswith(".parquet") and f not in head
        ])
        res2 = M.expire_snapshots(table, keep_latest=1)
        assert res2["expired_versions"] == [2], "v1 tagged, v3 head — only v2 goes"


class TestWriteAuditPublish:
    def test_main_readers_never_see_unaudited_versions(self, spark, table):
        """WAP: consumers pin ref='main'; writers publish freely; only an
        explicit branch advance (the audit passing) exposes data."""
        set_branch(table, "main", 2)
        # a writer lands v3 (bad data, audit will fail)
        import os

        spark.range(9_000, 9_010).selectExpr(
            "id AS k", "CAST(-1 AS BIGINT) AS v"
        ).coalesce(1).write.mode("append").parquet(table)
        head = {e["path"] for e in M.load_snapshot(table)["files"]}
        M.append_snapshot(table, [
            f for f in sorted(os.listdir(table))
            if f.endswith(".parquet") and f not in head
        ])
        assert M.load_snapshot(table, materialize=False)["version"] == 3
        # main-pinned consumers still read the audited v2
        assert read_snapshot_ref(spark, table, "main").count() == 150
        # audit fails (negative v) → main never advances; a fix lands as v4
        bad = M.read_snapshot(spark, table).filter(F.col("v") < 0).count()
        assert bad > 0
        # audit passes on v2-equivalent; promote main to latest good state
        set_branch(table, "main", 2)
        assert read_snapshot_ref(spark, table, "main").count() == 150


class TestColumnMapping:
    """Metadata-only RENAME/DROP: no data file is rewritten, readers
    project physical names to the logical schema across file vintages,
    time travel shows each version's own schema."""

    def _table(self, spark, tmp_path):
        import os

        p = str(tmp_path / "cmap_tbl")
        spark.range(50).selectExpr("id AS k", "id * 2 AS price").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        return p

    def test_rename_is_metadata_only_and_reads_logical(self, spark, tmp_path):
        import os

        from pandas_to_postgres_spark.sources.manifest import (
            rename_snapshot_column,
        )

        p = self._table(spark, tmp_path)
        files_before = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet")
        )
        man = rename_snapshot_column(p, "price", "amount")
        assert sorted(
            f for f in os.listdir(p) if f.endswith(".parquet")
        ) == files_before
        assert man["data_change"] is False

        head = M.read_snapshot(spark, p)
        assert "amount" in head.columns and "price" not in head.columns
        assert head.agg({"amount": "sum"}).first()[0] == sum(
            i * 2 for i in range(50)
        )
        # time travel: v1 still has the old name
        v1 = M.read_snapshot(spark, p, version=1)
        assert "price" in v1.columns

    def test_mixed_vintage_files_coalesce(self, spark, tmp_path):
        import os

        from pandas_to_postgres_spark.sources.manifest import (
            rename_snapshot_column,
        )

        p = self._table(spark, tmp_path)
        rename_snapshot_column(p, "price", "amount")
        # a post-rename writer appends with the LOGICAL name
        spark.range(50, 80).selectExpr(
            "id AS k", "id * 2 AS amount"
        ).coalesce(1).write.mode("append").parquet(p)
        head_files = {e["path"] for e in M.load_snapshot(p)["files"]}
        M.append_snapshot(p, [
            f for f in sorted(os.listdir(p))
            if f.endswith(".parquet") and f not in head_files
        ])
        head = M.read_snapshot(spark, p)
        assert head.count() == 80
        assert head.filter("amount IS NULL").count() == 0
        assert head.agg({"amount": "sum"}).first()[0] == sum(
            i * 2 for i in range(80)
        )

    def test_chained_rename(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            rename_snapshot_column,
        )

        p = self._table(spark, tmp_path)
        rename_snapshot_column(p, "price", "amount")
        rename_snapshot_column(p, "amount", "total")
        head = M.read_snapshot(spark, p)
        assert "total" in head.columns
        assert "price" not in head.columns and "amount" not in head.columns
        assert head.agg({"total": "sum"}).first()[0] == sum(
            i * 2 for i in range(50)
        )

    def test_drop_is_metadata_only(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            drop_snapshot_column,
        )

        p = self._table(spark, tmp_path)
        drop_snapshot_column(p, "price")
        head = M.read_snapshot(spark, p)
        assert head.columns == ["k"]
        assert M.read_snapshot(spark, p, version=1).columns == ["k", "price"]

    def test_rename_then_drop_drops_all_aliases(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            drop_snapshot_column,
            rename_snapshot_column,
        )

        p = self._table(spark, tmp_path)
        rename_snapshot_column(p, "price", "amount")
        drop_snapshot_column(p, "amount")
        assert M.read_snapshot(spark, p).columns == ["k"]


class TestBranchFollowingStream:
    """The change feed follows a branch ref (audited streaming) and
    bounds catch-up batches via maxVersionsPerTrigger."""

    def _publish_n(self, spark, p, n, start=0):
        import os

        for i in range(n):
            spark.range(start + i * 10, start + i * 10 + 10).selectExpr(
                "id AS k", "id * 2 AS v"
            ).coalesce(1).write.mode("append").parquet(p)
            head = (
                {e["path"] for e in M.load_snapshot(p)["files"]}
                if M.snapshot_versions(p)
                else set()
            )
            M.append_snapshot(p, [
                f for f in sorted(os.listdir(p))
                if f.endswith(".parquet") and f not in head
            ])

    def test_stream_follows_branch_not_latest(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotStreamReader,
        )

        p = str(tmp_path / "brstream")
        self._publish_n(spark, p, 3)
        set_branch(p, "main", 2)
        schema = spark.range(1).selectExpr("id AS k", "id AS v").schema
        r = SnapshotStreamReader({"path": p, "ref": "main"}, schema)
        assert r.latestOffset() == {"version": 2}, "feed stops at the branch"
        set_branch(p, "main", 3)
        assert r.latestOffset() == {"version": 3}

    def test_max_versions_per_trigger_bounds_catchup(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotStreamReader,
        )

        p = str(tmp_path / "ratestream")
        self._publish_n(spark, p, 5)
        schema = spark.range(1).selectExpr("id AS k", "id AS v").schema
        r = SnapshotStreamReader(
            {"path": p, "maxVersionsPerTrigger": "2"}, schema
        )
        # first poll of the session: uncapped (restart-safe full drain)
        assert r.latestOffset() == {"version": 5}
        r.commit({"version": 1})
        # now capped: at most 2 versions past the committed floor
        assert r.latestOffset() == {"version": 3}
        r.commit({"version": 3})
        assert r.latestOffset() == {"version": 5}


class TestColumnMappingDataSource:
    """format('snapshot') reads the LOGICAL schema across file vintages
    (the executor projects each file's physical alias); In-list pushdown
    prunes by stats."""

    def test_datasource_reads_logical_schema(self, spark, tmp_path):
        import os

        from pandas_to_postgres_spark.sources.manifest import (
            rename_snapshot_column,
        )
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        p = str(tmp_path / "cmds")
        spark.range(40).selectExpr("id AS k", "id * 3 AS price").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        rename_snapshot_column(p, "price", "amount")
        spark.range(40, 60).selectExpr(
            "id AS k", "id * 3 AS amount"
        ).coalesce(1).write.mode("append").parquet(p)
        head = {e["path"] for e in M.load_snapshot(p)["files"]}
        M.append_snapshot(p, [
            f for f in sorted(os.listdir(p))
            if f.endswith(".parquet") and f not in head
        ])

        spark.dataSource.register(SnapshotDataSource)
        df = spark.read.format("snapshot").option("path", p).load()
        assert "amount" in df.columns and "price" not in df.columns
        assert df.count() == 60
        assert df.filter("amount IS NULL").count() == 0
        assert df.agg({"amount": "sum"}).first()[0] == sum(
            i * 3 for i in range(60)
        )

    def test_in_list_pushdown_prunes_by_stats(self, spark, tmp_path):
        from pyspark.sql.datasource import In

        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotReader,
        )

        p = str(tmp_path / "intbl")
        spark.range(300).selectExpr("id AS k", "id AS v").repartitionByRange(
            3, "k"
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        r = SnapshotReader({"path": p}, ["k", "v"])
        list(r.pushFilters([In(("k",), (5, 17, 63))]))
        parts = r.partitions()
        assert len(parts) == 1, "all IN values live in the first range file"


class TestRestore:
    """Delta-style RESTORE: metadata-only rollback that preserves
    history and composes with appends, DVs, and expiry."""

    def test_restore_rolls_back_and_keeps_history(self, spark, tmp_path):
        p = str(tmp_path / "restore_tbl")
        spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        spark.range(100, 150).selectExpr(
            "id AS k", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in __import__("os").listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        assert M.read_snapshot(spark, p).count() == 150

        man = M.restore_snapshot(p, 1)
        assert man["version"] == 3
        assert man["dml"] == "restore"
        assert man["restored_from"] == 1
        assert M.read_snapshot(spark, p).count() == 100
        # history preserved: the "bad" v2 still time-travels
        assert M.read_snapshot(spark, p, version=2).count() == 150
        # restore is idempotent at the same content: no new version
        again = M.restore_snapshot(p, 1)
        assert again["version"] == 3

        # life continues after a restore: append composes
        spark.range(150, 160).selectExpr(
            "id AS k", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(p)
        seen = set()
        for v in M.snapshot_versions(p):
            seen.update(e["path"] for e in M.load_snapshot(p, v)["files"])
        newer = sorted(
            f for f in __import__("os").listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in seen
        )
        M.append_snapshot(p, newer)
        assert M.read_snapshot(spark, p).count() == 110

    def test_restore_undoes_dv_delete(self, spark, tmp_path):
        from pyspark.sql import Row

        p = str(tmp_path / "restore_dv")
        spark.range(50).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        M.delete_snapshot_rows_dv(
            spark, p, spark.createDataFrame([Row(k=7)]), ["k"]
        )
        assert M.read_snapshot(spark, p).count() == 49
        M.restore_snapshot(p, 1)
        assert M.read_snapshot(spark, p).count() == 50
        assert M.count_snapshot(p) == 50

    def test_restore_past_rename_restores_schema(self, spark, tmp_path):
        p = str(tmp_path / "restore_cm")
        spark.range(20).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        M.rename_snapshot_column(p, "v", "val")
        assert set(M.read_snapshot(spark, p).columns) == {"k", "val"}
        M.restore_snapshot(p, 1)
        assert set(M.read_snapshot(spark, p).columns) == {"k", "v"}

    def test_expire_after_restore_keeps_restored_files(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "restore_exp")
        spark.range(30).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        # compact rewrites into new files -> v2 doesn't reference v1's
        spark.range(30, 60).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in __import__("os").listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        M.restore_snapshot(p, 1)
        out = M.expire_snapshots(p, keep_latest=1)
        # v1's files are re-referenced by the restored head: must survive
        assert M.read_snapshot(spark, p).count() == 30
        assert 2 in out["expired_versions"]


class TestRestoreByRef:
    def test_restore_to_tag_name(self, spark, tmp_path):
        p = str(tmp_path / "restore_ref")
        spark.range(40).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        M.tag_snapshot(p, "audited")
        spark.range(40, 70).selectExpr("id AS k", "id AS v").coalesce(
            1
        ).write.mode("append").parquet(p)
        published = {e["path"] for e in M.load_snapshot(p, 1)["files"]}
        new = sorted(
            f for f in __import__("os").listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in published
        )
        M.append_snapshot(p, new)
        man = M.restore_snapshot(p, "audited")
        assert man["restored_from"] == 1
        assert M.read_snapshot(spark, p).count() == 40
