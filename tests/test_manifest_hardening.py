"""Round-10 manifest hardening — regression tests for the full-module
review findings: constraint preservation through re-publish (logical
overwrite), temporal/decimal stat-column safety (stats round-trip
through JSON as strings; pruning must stay a superset, publish must
never crash), pruned reads under column mapping, constraint-aware
restore no-op detection, the expiry/version-hint hole, and the legacy
zero-file guard."""

import datetime
import json
import os
from decimal import Decimal

import pytest
from pyspark.sql import Row

from pandas_to_postgres_spark.sources import manifest as M
from pandas_to_postgres_spark.sources.manifest import ConstraintViolation


@pytest.fixture
def table(spark, tmp_path):
    p = str(tmp_path / "hard_tbl")
    spark.range(50).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(p)
    M.publish_snapshot(p, ["k"])
    return p


class TestPublishPreservesConstraints:
    def test_republish_without_spark_fails_closed(self, spark, table):
        M.set_check_constraint(spark, table, "v_even", "v % 2 = 0")
        with pytest.raises(ValueError, match="pass spark="):
            M.publish_snapshot(table, ["k"])
        assert M.load_snapshot(table)["version"] == 2  # nothing published

    def test_republish_validates_and_inherits(self, spark, table):
        M.set_check_constraint(spark, table, "v_even", "v % 2 = 0")
        out = M.publish_snapshot(table, ["k"], spark=spark)
        assert out["constraints"] == {"v_even": "v % 2 = 0"}  # never dropped
        assert M.load_snapshot(table)["constraints"] == {
            "v_even": "v % 2 = 0"
        }

    def test_republish_refuses_violating_directory(self, spark, table):
        M.set_check_constraint(spark, table, "v_even", "v % 2 = 0")
        spark.createDataFrame([Row(k=900, v=3)]).coalesce(1).write.mode(
            "append"
        ).parquet(table)  # odd v lands in the DIRECTORY, unpublished
        with pytest.raises(ConstraintViolation, match="v_even"):
            M.publish_snapshot(table, ["k"], spark=spark)
        assert M.load_snapshot(table)["version"] == 2


class TestTemporalAndDecimalStats:
    def test_date_stat_col_prunes_correctly_after_json_roundtrip(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "date_tbl")
        spark.sql(
            "SELECT id AS k, DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) "
            "AS d FROM range(20)"
        ).repartition(4, "k").write.parquet(p)
        M.publish_snapshot(p, ["d"])
        # persisted stats are ISO strings (json default=str)
        raw = json.load(open(os.path.join(p, "_manifest-v1.json")))
        assert any(
            isinstance(e["stats"].get("d", [None])[0], str)
            for e in raw["files"]
            if e["stats"]
        )
        got = sorted(
            r["k"]
            for r in M.read_snapshot_pruned(
                spark, p, "d",
                datetime.date(2024, 1, 3), datetime.date(2024, 1, 8),
            ).collect()
            if datetime.date(2024, 1, 3) <= r["d"] <= datetime.date(2024, 1, 8)
        )
        assert got == list(range(2, 8))  # exact rows survive the prune

    def test_decimal_stat_col_publish_is_conservative_not_a_crash(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "dec_tbl")
        spark.sql(
            "SELECT id AS k, CAST(id * 1.7 AS DECIMAL(10,2)) AS dd "
            "FROM range(20)"
        ).coalesce(2).write.parquet(p)
        M.publish_snapshot(p, ["dd"])  # pyarrow can't extract: must not raise
        raw = json.load(open(os.path.join(p, "_manifest-v1.json")))
        assert all(e["stats"] == {} for e in raw["files"])  # omitted, kept
        n = (
            M.read_snapshot_pruned(spark, p, "dd", Decimal("5.0"), Decimal("12.0"))
            .count()
        )
        assert n == 5  # exact predicate still applies on top

    def test_shard_stats_fold_mixed_vintages(self, tmp_path, monkeypatch):
        # fresh (native date) + reloaded (ISO string) entries in one fold
        ents = [
            {"path": "a", "stats": {"d": [datetime.date(2024, 1, 2),
                                          datetime.date(2024, 1, 5)]}},
            {"path": "b", "stats": {"d": ["2024-01-01", "2024-01-03"]}},
        ]
        out = M._agg_shard_stats(ents, ["d"])
        assert out == {"d": ["2024-01-01", "2024-01-05"]}


class TestPrunedReadsUnderColumnMap:
    def test_pruned_read_returns_logical_schema(self, spark, table, tmp_path):
        M.rename_snapshot_column(table, "v", "val")
        spark.sql(
            "SELECT id AS k, id * 2 AS val FROM range(50, 60)"
        ).coalesce(1).write.mode("append").parquet(table)
        new = [
            f for f in os.listdir(table)
            if f.endswith(".parquet")
            and f not in {e["path"] for e in M.load_snapshot(table, 1)["files"]}
        ]
        M.append_snapshot(table, new)
        out = M.read_snapshot_pruned(spark, table, "k", 45, 55)
        assert out.columns == ["k", "val"]  # logical, both vintages coalesced
        got = sorted((r["k"], r["val"]) for r in out.collect())
        assert got == [(i, 2 * i) for i in range(45, 56)]


class TestRestoreConstraintState:
    def test_restore_reestablishes_a_dropped_constraint(self, spark, table):
        M.set_check_constraint(spark, table, "v_even", "v % 2 = 0")  # v2
        M.drop_check_constraint(table, "v_even")  # v3: same files, no cons
        out = M.restore_snapshot(table, 2)
        assert out["version"] == 4  # NOT a no-op: constraint state differs
        assert M.load_snapshot(table)["constraints"] == {
            "v_even": "v % 2 = 0"
        }


class TestExpiryHintInvariant:
    def test_expire_restamps_hint_past_the_hole(self, spark, table):
        for lo in (50, 60, 70):  # v2, v3, v4
            spark.range(lo, lo + 10).selectExpr(
                "id AS k", "id * 2 AS v"
            ).coalesce(1).write.mode("append").parquet(table)
            published = {
                e["path"] for vv in M.snapshot_versions(table)
                for e in M.load_snapshot(table, vv)["files"]
            }
            M.append_snapshot(table, sorted(
                f for f in os.listdir(table)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
                and f not in published
            ))
        M.tag_snapshot(table, "pin", 1)
        # simulate a lagging hint BELOW the future hole
        with open(os.path.join(table, "_version-hint.text"), "w") as fh:
            fh.write("1")
        out = M.expire_snapshots(table, keep_latest=1)
        assert out["expired_versions"] == [2, 3]  # v1 tag-pinned, v4 head
        # the hint was re-stamped at the TRUE head, so resolve-latest
        # cannot stop at the tag-pinned v1 below the 2..3 hole
        assert M.load_snapshot(table)["version"] == 4


def test_legacy_zero_file_manifest_refused(spark, tmp_path):
    p = str(tmp_path / "empty_tbl")
    os.makedirs(p)
    M.write_manifest(p, ["k"])  # zero part files
    with pytest.raises(ValueError, match="zero files"):
        M.read_pruned(spark, p, "k", 0, 10)
