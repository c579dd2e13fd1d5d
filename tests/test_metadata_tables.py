"""Iceberg-style METADATA TABLES over the snapshot log (round 10):
``snapshot_metadata_table(spark, path, kind)`` with kinds ``history``
(one row per version: operation, data_change, file/row/byte counts —
Delta's DESCRIBE HISTORY / Iceberg's ``tbl.history``), ``files`` (one
row per live entry with stats and DV state — Iceberg's ``tbl.files``)
and ``manifests`` (one row per entry shard — Iceberg's
``tbl.manifests``). All three are driver-side O(manifest) metadata
walks turned into DataFrames; no data file is opened.

Operations are STAMPED at publish time (``manifest["operation"]``, a
non-inherited key) by every write verb; pre-stamp manifests (older
tables) fall back to structural inference — the tests cover both.
"""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.manifest import snapshot_metadata_table


@pytest.fixture
def table(spark, tmp_path):
    p = str(tmp_path / "meta_tbl")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(
        2
    ).write.parquet(p)
    M.publish_snapshot(p, ["k"])
    spark.range(100, 150).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.mode("append").parquet(p)
    M.append_snapshot(p, [
        f for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
        and f not in {e["path"] for e in M.load_snapshot(p, 1)["files"]}
    ])
    return p


class TestHistory:
    def test_publish_and_append_stamped(self, spark, table):
        h = {
            r["version"]: r
            for r in snapshot_metadata_table(spark, table, "history").collect()
        }
        assert h[1]["operation"] == "publish"
        assert h[2]["operation"] == "append"
        assert h[1]["data_change"] and h[2]["data_change"]
        assert h[1]["n_rows"] == 100 and h[2]["n_rows"] == 150
        assert h[2]["added_files"] == 1 and h[2]["removed_files"] == 0
        assert h[1]["n_files"] == 2 and h[2]["n_files"] == 3

    def test_rewrite_verbs_stamp_their_op(self, spark, table):
        M.delete_snapshot_rows(
            spark, table, spark.createDataFrame([Row(k=7)]), ["k"]
        )
        M.compact_snapshot(spark, table, target_bytes=1 << 30)
        h = {
            r["version"]: r
            for r in snapshot_metadata_table(spark, table, "history").collect()
        }
        assert h[3]["operation"] == "delete_snapshot_rows"
        assert h[3]["n_rows"] == 149 and h[3]["removed_files"] >= 1
        assert h[4]["operation"] == "compact_snapshot"
        assert h[4]["data_change"] is False
        assert h[4]["n_rows"] == 149

    def test_metadata_verbs_stamp_their_op(self, spark, table):
        M.set_check_constraint(spark, table, "k_nonneg", "k >= 0")
        M.rename_snapshot_column(table, "v", "val")
        M.restore_snapshot(table, 2)
        h = {
            r["version"]: r
            for r in snapshot_metadata_table(spark, table, "history").collect()
        }
        assert h[3]["operation"] == "set_check_constraint"
        assert h[4]["operation"] == "rename_snapshot_column"
        assert h[5]["operation"] == "restore"
        assert not h[3]["data_change"] and not h[4]["data_change"]

    def test_prestamp_manifest_infers_operation(self, spark, table):
        # simulate an old-vintage manifest: strip the stamped key
        for v in M.snapshot_versions(table):
            p = os.path.join(table, f"_manifest-v{v}.json")
            m = json.load(open(p))
            m.pop("operation", None)
            json.dump(m, open(p, "w"))
        h = {
            r["version"]: r["operation"]
            for r in snapshot_metadata_table(spark, table, "history").collect()
        }
        assert h[1] == "publish"  # no parent
        assert h[2] == "append"   # strictly additive file set
        assert h  # inference never raises on old tables

    def test_history_n_rows_is_live_rows_under_dv_delete(self, spark, table):
        """A DV delete changes no file, but the history row for that
        version must show the live count DROP (n_rows matches
        count_snapshot, never the physical footer sum) — otherwise the
        history table misreports what the commit did."""
        M.delete_snapshot_rows_dv(
            spark, table, spark.createDataFrame([Row(k=7), Row(k=9)]), ["k"]
        )
        h = {
            r["version"]: r
            for r in snapshot_metadata_table(spark, table, "history").collect()
        }
        assert h[3]["operation"] == "delete_snapshot_rows_dv"
        assert h[3]["n_rows"] == 148 == M.count_snapshot(table)
        assert h[2]["n_rows"] == 150  # prior version untouched
        p = snapshot_metadata_table(spark, table, "partitions").collect()
        assert sum(r["rows"] for r in p) == 148  # partitions agree

    def test_clone_history_starts_with_clone(self, spark, table, tmp_path):
        dst = str(tmp_path / "meta_clone")
        M.clone_snapshot(table, dst)
        h = snapshot_metadata_table(spark, dst, "history").collect()
        assert len(h) == 1 and h[0]["operation"] == "clone"


class TestFiles:
    def test_one_row_per_live_entry_with_stats(self, spark, table):
        f = snapshot_metadata_table(spark, table, "files")
        rows = f.collect()
        assert len(rows) == 3
        assert {r["file_path"] for r in rows} == {
            e["path"] for e in M.load_snapshot(table)["files"]
        }
        assert all(r["bytes"] > 0 and r["rows"] > 0 for r in rows)
        stats = {r["file_path"]: json.loads(r["stats"]) for r in rows}
        assert all("k" in s for s in stats.values())  # stat col min/max

    def test_dv_state_surfaces(self, spark, table):
        M.delete_snapshot_rows_dv(
            spark, table, spark.createDataFrame([Row(k=7)]), ["k"]
        )
        f = snapshot_metadata_table(spark, table, "files").collect()
        dvd = [r for r in f if r["dv_count"] > 0]
        assert len(dvd) == 1 and dvd[0]["dv_count"] == 1

    def test_version_pins(self, spark, table):
        f1 = snapshot_metadata_table(spark, table, "files", version=1)
        assert f1.count() == 2


class TestManifests:
    def test_inline_manifest_is_one_row(self, spark, table):
        m = snapshot_metadata_table(spark, table, "manifests").collect()
        assert len(m) == 1
        assert m[0]["n_entries"] == 3 and m[0]["inline"]

    def test_sharded_manifest_lists_shards(self, spark, tmp_path, monkeypatch):
        monkeypatch.setattr(M, "INLINE_MAX", 4)
        monkeypatch.setattr(M, "SHARD_TARGET", 4)
        p = str(tmp_path / "sharded_meta")
        spark.range(60).selectExpr("id AS k", "id * 2 AS v").repartition(
            6
        ).write.parquet(p)
        M.publish_snapshot(p, ["k"])
        m = snapshot_metadata_table(spark, p, "manifests").collect()
        assert len(m) == 2  # 6 entries / SHARD_TARGET=4 -> [4, 2]
        assert sorted(r["n_entries"] for r in m) == [2, 4]
        assert not any(r["inline"] for r in m)
        assert all(r["shard_path"].startswith("_mshard-") for r in m)


class TestPartitions:
    def test_unpartitioned_rolls_up_under_null_tuple(self, spark, table):
        p = snapshot_metadata_table(spark, table, "partitions").collect()
        assert len(p) == 1
        assert p[0]["partition"] is None
        assert p[0]["n_files"] == 3 and p[0]["rows"] == 150

    def test_hidden_partitioned_groups_by_tuple(self, spark, tmp_path):
        import json as _json

        from pandas_to_postgres_spark.sources.partition_spec import (
            spec_field,
            write_partitioned_snapshot,
        )

        p = str(tmp_path / "part_meta")
        df = spark.range(40).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS grp", "id * 2 AS v"
        )
        write_partitioned_snapshot(
            spark, df, p, [spec_field("identity", "grp")], stat_cols=["k"]
        )
        parts = snapshot_metadata_table(spark, p, "partitions").collect()
        assert len(parts) == 4
        assert sum(r["rows"] for r in parts) == 40
        vals = sorted(
            list(_json.loads(r["partition"]).values())[0] for r in parts
        )
        assert len(set(vals)) == 4


def test_unknown_kind_refused(spark, table):
    with pytest.raises(ValueError, match="kind"):
        snapshot_metadata_table(spark, table, "refs_table")
