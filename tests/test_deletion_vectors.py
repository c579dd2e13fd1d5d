"""Deletion vectors (merge-on-read DELETE): data files stay untouched,
the manifest records dead row ordinals, every reader anti-joins them,
rewrites materialize them, and time travel stays exact."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.manifest import (
    delete_snapshot_rows_dv,
)


@pytest.fixture
def table(spark, tmp_path):
    p = str(tmp_path / "dv_tbl")
    df = spark.range(300).selectExpr("id AS k", "id * 2 AS v")
    df.repartitionByRange(3, "k").write.parquet(p)
    M.publish_snapshot(p, ["k"])
    return p


class TestDvDelete:
    def test_point_delete_is_metadata_only(self, spark, table):
        files_before = sorted(
            f for f in os.listdir(table) if f.endswith(".parquet")
        )
        keys = spark.createDataFrame([Row(k=5), Row(k=150), Row(k=299)])
        man = delete_snapshot_rows_dv(spark, table, keys, ["k"])
        files_after = sorted(
            f for f in os.listdir(table) if f.endswith(".parquet")
        )
        assert files_before == files_after, "DV delete must not touch data"
        assert man["dml"] == "delete_dv"
        assert sum(len(e.get("dv") or ()) for e in man["files"]) == 3

        head = M.read_snapshot(spark, table)
        assert head.count() == 297
        assert head.filter("k in (5, 150, 299)").count() == 0
        # time travel: v1 still sees everything
        assert M.read_snapshot(spark, table, version=1).count() == 300
        # metadata-only count
        assert M.count_snapshot(table) == 297
        assert M.count_snapshot(table, version=1) == 300

    def test_redelete_same_keys_is_noop(self, spark, table):
        keys = spark.createDataFrame([Row(k=7)])
        m1 = delete_snapshot_rows_dv(spark, table, keys, ["k"])
        m2 = delete_snapshot_rows_dv(spark, table, keys, ["k"])
        assert m2["version"] == m1["version"], "already-dead: no version"

    def test_hybrid_fraction_falls_back_to_rewrite(self, spark, table):
        # kill 2/3 of one file's range: way past max_dv_fraction
        keys = spark.range(0, 67).selectExpr("id AS k")
        man = delete_snapshot_rows_dv(spark, table, keys, ["k"])
        got = M.read_snapshot(spark, table)
        assert got.count() == 233
        assert got.filter("k < 67").count() == 0
        # the mostly-dead file was rewritten: no entry carries a 67-long dv
        assert all(
            len(e.get("dv") or ()) <= 0.2 * e["rows"] for e in man["files"]
        )
        assert any(e["path"].startswith("part-d") for e in man["files"])

    def test_compaction_materializes_dvs(self, spark, table):
        keys = spark.createDataFrame([Row(k=10), Row(k=20)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        man = M.compact_snapshot(spark, table, target_bytes=10**9)
        assert all(not e.get("dv") for e in man["files"])
        assert M.read_snapshot(spark, table).count() == 298
        assert M.count_snapshot(table) == 298

    def test_merge_does_not_resurrect_dv_rows(self, spark, table):
        keys = spark.createDataFrame([Row(k=42)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        ups = spark.createDataFrame([Row(k=43, v=-1)])
        M.merge_snapshot(spark, table, ups, ["k"])
        head = M.read_snapshot(spark, table)
        assert head.filter("k = 42").count() == 0
        assert head.filter("k = 43").first()["v"] == -1
        assert head.count() == 299

    def test_pruned_read_honors_dv(self, spark, table):
        keys = spark.createDataFrame([Row(k=55)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        got = M.read_snapshot_pruned(spark, table, "k", 50, 60)
        assert sorted(r["k"] for r in got.collect()) == [
            50, 51, 52, 53, 54, 56, 57, 58, 59, 60
        ]

    def test_datasource_read_honors_dv(self, spark, table):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        keys = spark.createDataFrame([Row(k=99), Row(k=100)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        spark.dataSource.register(SnapshotDataSource)
        df = spark.read.format("snapshot").option("path", table).load()
        assert df.count() == 298
        assert df.filter("k in (99, 100)").count() == 0
        v1 = (
            spark.read.format("snapshot")
            .option("path", table)
            .option("version", 1)
            .load()
        )
        assert v1.count() == 300

    def test_change_feed_fails_fast_unless_ignored(self, spark, table, tmp_path):
        from pandas_to_postgres_spark.sources.snapshot_datasource import (
            SnapshotStreamReader,
        )

        keys = spark.createDataFrame([Row(k=1)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        r = SnapshotStreamReader({"path": table}, spark.range(1).selectExpr(
            "id AS k", "id AS v").schema)
        with pytest.raises(ValueError, match="deletion-vector"):
            r.partitions({"version": 1}, {"version": 2})
        r2 = SnapshotStreamReader(
            {"path": table, "ignoreChanges": "true"},
            spark.range(1).selectExpr("id AS k", "id AS v").schema,
        )
        parts = r2.partitions({"version": 1}, {"version": 2})
        assert [p.value for p in parts] == [None], "DV version emits nothing"

    def test_sharded_manifest_rewrites_only_touched_shard(
        self, spark, tmp_path, monkeypatch
    ):
        monkeypatch.setattr(M, "INLINE_MAX", 2)
        monkeypatch.setattr(M, "SHARD_TARGET", 2)
        p = str(tmp_path / "dv_sharded")
        df = spark.range(300).selectExpr("id AS k", "id * 2 AS v")
        df.repartitionByRange(6, "k").write.parquet(p)
        M.publish_snapshot(p, ["k"])
        v1_shards = {
            r["path"] for r in M.load_snapshot(p, materialize=False)["shards"]
        }
        keys = spark.createDataFrame([Row(k=5)])
        delete_snapshot_rows_dv(spark, p, keys, ["k"])
        head = M.load_snapshot(p, materialize=False)
        v2_shards = {r["path"] for r in head["shards"]}
        assert len(v1_shards & v2_shards) == 2, "untouched shards reused"
        assert M.count_snapshot(p) == 299  # via shard dv_total, no loads
        assert M.read_snapshot(spark, p).count() == 299


class TestSmallFileOnlyCompaction:
    def test_big_files_carry_over_untouched(self, spark, tmp_path):
        p = str(tmp_path / "optim")
        # one big file + four small ones
        spark.range(50_000).selectExpr("id AS k", "id * 2 AS v").coalesce(
            1
        ).write.parquet(p)
        for i in range(4):
            spark.range(50_000 + i * 10, 50_000 + i * 10 + 10).selectExpr(
                "id AS k", "id * 2 AS v"
            ).coalesce(1).write.mode("append").parquet(p)
        M.publish_snapshot(p, ["k"])
        v1 = M.load_snapshot(p)
        big = max(v1["files"], key=lambda e: e["bytes"])["path"]
        man = M.compact_snapshot(
            spark, p, target_bytes=10**9, max_input_bytes=100_000
        )
        names = {e["path"] for e in man["files"]}
        assert big in names, "the big file must carry over by reference"
        assert len(man["files"]) == 2, "4 small files -> 1 rewritten"
        assert M.read_snapshot(spark, p).count() == 50_040
        # no-op when nothing small remains
        man2 = M.compact_snapshot(
            spark, p, target_bytes=10**9, max_input_bytes=10
        )
        assert man2["version"] == man["version"]

    def test_dv_file_always_qualifies(self, spark, tmp_path):
        from pyspark.sql import Row

        p = str(tmp_path / "optim_dv")
        spark.range(1000).selectExpr("id AS k", "id * 2 AS v").coalesce(
            1
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        delete_snapshot_rows_dv(
            spark, p, spark.createDataFrame([Row(k=5)]), ["k"]
        )
        # file is "big" relative to the threshold, but carries a dv
        man = M.compact_snapshot(
            spark, p, target_bytes=10**9, max_input_bytes=10
        )
        assert all(not e.get("dv") for e in man["files"])
        assert M.read_snapshot(spark, p).count() == 999


class TestDvReaderParity:
    """Every reader path honors deletion vectors and the column map —
    the Bloom point lookup and hidden-partition readers used to scan
    entries with spark.read.parquet directly, resurrecting DV-deleted
    rows and leaking physical column names (ADVICE r7, high)."""

    def test_bloom_point_lookup_honors_dv(self, spark, table):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_bloom_index,
            read_snapshot_point,
        )

        build_bloom_index(spark, table, "k")
        keys = spark.createDataFrame([Row(k=150)])
        delete_snapshot_rows_dv(spark, table, keys, ["k"])
        assert read_snapshot_point(spark, table, "k", 150).count() == 0
        got = read_snapshot_point(spark, table, "k", 151).collect()
        assert [(r["k"], r["v"]) for r in got] == [(151, 302)]

    def test_bloom_point_lookup_applies_column_map(self, spark, table):
        from pandas_to_postgres_spark.sources.file_bloom import (
            build_bloom_index,
            read_snapshot_point,
        )

        build_bloom_index(spark, table, "k")
        M.rename_snapshot_column(table, "v", "val")
        got = read_snapshot_point(spark, table, "k", 7)
        assert set(got.columns) == {"k", "val"}
        assert got.first()["val"] == 14

    def test_hidden_read_honors_dv_and_column_map(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.partition_spec import (
            read_snapshot_hidden,
            spec_field,
            write_partitioned_snapshot,
        )

        p = str(tmp_path / "hidden_dv")
        df = spark.range(400).selectExpr(
            "id AS k", "id % 8 AS uid", "id * 3 AS v"
        )
        write_partitioned_snapshot(
            spark, df, p, [spec_field("bucket", "uid", 4)], stat_cols=["k"]
        )
        delete_snapshot_rows_dv(
            spark, p, spark.createDataFrame([Row(k=16), Row(k=24)]), ["k"]
        )
        M.rename_snapshot_column(p, "v", "val")
        got = read_snapshot_hidden(spark, p, {"uid": ("=", 0)})
        ks = {r["k"] for r in got.collect()}
        assert 16 not in ks and 24 not in ks
        assert ks == {k for k in range(0, 400, 8)} - {16, 24}
        assert set(got.columns) == {"k", "uid", "val"}

    def test_stale_version_delete_merges_head_dv(self, spark, table):
        """A DV delete computed against an OLD version must not clobber
        ordinals a later delete already published on the same file —
        the claim loop re-merges against the head's current vector."""
        delete_snapshot_rows_dv(
            spark, table, spark.createDataFrame([Row(k=10)]), ["k"]
        )
        # second delete deliberately computed from pre-delete version 1
        man = delete_snapshot_rows_dv(
            spark, table, spark.createDataFrame([Row(k=11)]), ["k"],
            version=1,
        )
        assert sum(len(e.get("dv") or ()) for e in man["files"]) == 2
        got = M.read_snapshot(spark, table)
        assert got.filter("k in (10, 11)").count() == 0
        assert got.count() == 298

    def test_statcols_change_preserves_dv(self, spark, table):
        """A publish that changes stat_cols rebuilds kept entries from
        parquet footers — the rebuilt entries must carry the head's dv
        (and partition tuple) or deleted rows resurrect (ADVICE r7)."""
        delete_snapshot_rows_dv(
            spark, table, spark.createDataFrame([Row(k=5)]), ["k"]
        )
        # write one new file so the append has something to do
        df = spark.createDataFrame([Row(k=10_000, v=20_000)])
        df.coalesce(1).write.mode("append").parquet(table)
        published = set()
        for v in M.snapshot_versions(table):
            published.update(
                e["path"] for e in M.load_snapshot(table, v)["files"]
            )
        new = sorted(
            f
            for f in os.listdir(table)
            if f.endswith(".parquet")
            and not f.startswith((".", "_"))
            and f not in published
        )
        man = M.append_snapshot(table, new, stat_cols=["v"])  # CHANGED
        assert set(man["stat_cols"]) == {"v"}
        assert sum(len(e.get("dv") or ()) for e in man["files"]) == 1
        got = M.read_snapshot(spark, table)
        assert got.filter("k = 5").count() == 0
        assert got.count() == 300  # 299 survivors + 1 appended
