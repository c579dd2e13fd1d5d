"""Shallow CLONE of snapshot tables (Delta's CREATE TABLE ... CLONE):
zero-copy v1 manifest referencing the source's files by relative path,
immediately independent on both sides, with the standard vacuum rule —
physical deletion on the clone never follows a reference outside the
clone's own directory."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.manifest import clone_snapshot


@pytest.fixture
def src(spark, tmp_path):
    p = str(tmp_path / "src_tbl")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").repartition(
        2, F.col("k")
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


class TestShallowClone:
    def test_clone_reads_source_version_bit_exact(self, spark, src, tmp_path):
        dst = str(tmp_path / "clone_tbl")
        side = clone_snapshot(src, dst)
        assert side["cloned_from"]["version"] == 2
        got = sorted(
            (r["k"], r["v"]) for r in M.read_snapshot(spark, dst).collect()
        )
        want = sorted(
            (r["k"], r["v"]) for r in M.read_snapshot(spark, src).collect()
        )
        assert got == want and len(got) == 150
        # zero data bytes under the clone: only metadata
        assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]
        # metadata-only count still works (rows carried in entries)
        assert M.count_snapshot(dst) == 150

    def test_clone_pins_the_version_not_the_head(self, spark, src, tmp_path):
        dst = str(tmp_path / "clone_v1")
        clone_snapshot(src, dst, version=1)
        assert M.read_snapshot(spark, dst).count() == 100

    def test_sides_evolve_independently(self, spark, src, tmp_path):
        dst = str(tmp_path / "clone_ind")
        clone_snapshot(src, dst)
        # append to the CLONE: lands locally, source untouched
        spark.createDataFrame([Row(k=999, v=0)]).coalesce(1).write.mode(
            "append"
        ).parquet(dst)
        new = [
            f for f in os.listdir(dst)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        M.append_snapshot(dst, new)
        assert M.read_snapshot(spark, dst).count() == 151
        assert M.read_snapshot(spark, src).count() == 150
        # append to the SOURCE: clone does not see it
        spark.createDataFrame([Row(k=888, v=0)]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        snew = [
            f for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in {e["path"] for v in M.snapshot_versions(src)
                          for e in M.load_snapshot(src, v)["files"]}
        ]
        M.append_snapshot(src, snew)
        assert M.read_snapshot(spark, dst).count() == 151

    def test_expire_on_clone_never_deletes_source_bytes(
        self, spark, src, tmp_path
    ):
        dst = str(tmp_path / "clone_exp")
        clone_snapshot(src, dst)
        # merge on the clone rewrites the touched (source-referenced)
        # file into a clone-local file; expiring the clone's v1 must
        # skip the ../ references and delete nothing of the source
        src_files_before = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        M.merge_snapshot(
            spark, dst, spark.createDataFrame([Row(k=0, v=12345)]), ["k"]
        )
        out = M.expire_snapshots(dst, keep_latest=1)
        assert sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        ) == src_files_before, "expire on a clone must not touch the source"
        assert not any(d.startswith("..") for d in out["deleted_files"])
        # the merged row reads back; untouched rows still served by source
        got = {r["k"]: r["v"] for r in M.read_snapshot(spark, dst).collect()}
        assert got[0] == 12345 and got[149] == 298
        # source still fully readable
        assert M.read_snapshot(spark, src).count() == 150

    def test_stats_and_constraints_carry(self, spark, src, tmp_path):
        M.set_check_constraint(spark, src, "k_nonneg", "k >= 0")
        dst = str(tmp_path / "clone_cons")
        clone_snapshot(src, dst)
        assert M.load_snapshot(dst)["constraints"] == {"k_nonneg": "k >= 0"}
        # enforcement is live on the clone from version 1
        spark.createDataFrame([Row(k=-1, v=0)]).coalesce(1).write.mode(
            "append"
        ).parquet(dst)
        bad = [
            f for f in os.listdir(dst)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        with pytest.raises(M.ConstraintViolation):
            M.append_snapshot(dst, bad, spark=spark)
        # stats carried: a pruned point read plans < total files
        plan = M.plan_snapshot_scan(dst, "k", 5, 5)
        assert len(plan["keep"]) < plan["total_files"]

    def test_dv_source_refused(self, spark, src, tmp_path):
        keys = spark.createDataFrame([Row(k=7)])
        M.delete_snapshot_rows_dv(spark, src, keys, ["k"])
        with pytest.raises(ValueError, match="deletion vectors"):
            clone_snapshot(src, str(tmp_path / "clone_dv"))

    def test_dv_delete_on_cloned_references_refused(
        self, spark, src, tmp_path
    ):
        dst = str(tmp_path / "clone_dvref")
        clone_snapshot(src, dst)
        keys = spark.createDataFrame([Row(k=7)])
        with pytest.raises(ValueError, match="shallow-clone references"):
            M.delete_snapshot_rows_dv(spark, dst, keys, ["k"])
        # the CoW delete is the supported path on a clone
        M.delete_snapshot_rows(spark, dst, keys, ["k"])
        got = M.read_snapshot(spark, dst)
        assert got.filter(F.col("k") == 7).count() == 0
        assert got.count() == 149
        # and the source keeps its row
        assert M.read_snapshot(spark, src).filter(
            F.col("k") == 7
        ).count() == 1

    def test_clone_onto_existing_table_refused(self, spark, src, tmp_path):
        dst = str(tmp_path / "clone_dup")
        clone_snapshot(src, dst)
        with pytest.raises(ValueError, match="already has snapshots"):
            clone_snapshot(src, dst)

    def test_source_vacuum_after_cow_breaks_clone_loudly(
        self, spark, src, tmp_path
    ):
        """Delta's documented shallow-clone caveat, reproduced on purpose:
        VACUUM on the SOURCE can delete files a clone still references —
        the source's lifecycle verbs only count references from the
        source's own retained versions, never a clone's (a clone is a
        separate table; tracking external borrowers would make vacuum
        unscalable). The failure must be LOUD (the clone read throws on
        the missing file), never a silent wrong answer. Files still
        referenced by the source's retained head survive, so an
        append-only source never dangles a clone — only rewrite + expire
        + vacuum does."""
        dst = str(tmp_path / "clone_dangle")
        clone_snapshot(src, dst)
        # CoW delete on the SOURCE rewrites a referenced file...
        M.delete_snapshot_rows(
            spark, src, spark.createDataFrame([Row(k=7)]), ["k"]
        )
        # ...and expiry + vacuum on the source deletes the original
        M.expire_snapshots(src, keep_latest=1)
        out = M.vacuum_orphans(src, grace_seconds=0)
        assert out["deleted_files"], "vacuum should reap the rewritten file"
        with pytest.raises(Exception):
            M.read_snapshot(spark, dst).count()
        # the source itself remains fully consistent
        assert M.read_snapshot(spark, src).count() == 149
