"""JDBC writer tier — executable evidence (SURVEY.md §2.1 S8-tier-a).

The container has no PostgreSQL JDBC jar (install prohibited), but a public
``org.duckdb:duckdb_jdbc`` artifact is present in the local Maven artifact
cache — and ``sinks/jdbc.write_jdbc`` is driver-generic, so the tier's
actual claims (Spark's built-in JDBC writer carries our options: TRUNCATE
(not DROP) + append full-refresh, ``batchsize``, ``numPartitions``
connection bounding, NULL round-trip) are proven against a REAL JDBC driver
writing a REAL database file, then read back independently with the duckdb
Python module (same 1.0.0 storage format).

The jar must be on the JVM classpath at session creation
(``spark.jars``), so the test runs in its OWN subprocess — the shared
pytest session can't load it. Skips (env-gated) when no jar is cached.

Contract note (matches the reference): the target table PRE-EXISTS and
Spark reflects its schema — the reference never creates tables
(`/root/reference/pandas_to_postgres/hdf_to_postgres.py:94-96`, schema
reflected from the live DB). That is also load-bearing here: Spark's
``tableExists`` probe (``SELECT 1 FROM t WHERE 1=0``) leaks the DuckDB
driver's prepare-time SQLException when the table is missing, so the
create-on-write path is out of this tier's contract either way.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_jdbc_jar() -> str | None:
    pats = [
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc-*.jar"),
        os.path.expanduser("~/.m2/**/duckdb_jdbc-*.jar"),
    ]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[0]
    return None


_DRIVER_SCRIPT = r"""
import json, os, sys, tempfile
jar, repo = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.jars", jar)
    .config("spark.ui.enabled", "false")
    .appName("jdbc-tier-integration")
    .getOrCreate()
)
from pandas_to_postgres_spark.sinks.jdbc import write_jdbc

db = os.path.join(tempfile.mkdtemp(), "tier.duckdb")
url = "jdbc:duckdb:" + db
con = duckdb.connect(db)
con.sql("CREATE TABLE tgt (id BIGINT, s VARCHAR, x DOUBLE)")
con.sql("INSERT INTO tgt VALUES (99, 'stale', 0.0)")  # must vanish on refresh
con.close()

rows = [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)]
df = spark.createDataFrame(rows, "id long, s string, x double")

# full refresh: TRUNCATE (not DROP) + append — the reference's contract
write_jdbc(df, url, "tgt", mode="overwrite", truncate=True,
           driver="org.duckdb.DuckDBDriver", num_partitions=1)
# incremental append, 2 concurrent task connections, small batchsize
write_jdbc(df, url, "tgt", mode="append", truncate=False,
           driver="org.duckdb.DuckDBDriver", num_partitions=2, batchsize=2)
spark.stop()

con = duckdb.connect(db, read_only=True)
got = sorted(
    ([r[0], r[1], r[2]] for r in con.sql("SELECT * FROM tgt").fetchall()),
    key=repr,  # rows contain NULLs — None doesn't order against str/float
)
n_stale = con.sql("SELECT count(*) FROM tgt WHERE id = 99").fetchone()[0]
# TRUNCATE preserved the externally-owned schema (authority stays in the DB)
cols = con.sql(
    "SELECT column_name, data_type FROM information_schema.columns "
    "WHERE table_name = 'tgt' ORDER BY ordinal_position"
).fetchall()
print("RESULT " + json.dumps({
    "got": got, "n_stale": n_stale, "cols": cols,
}))
"""


@pytest.mark.skipif(
    _find_jdbc_jar() is None,
    reason="no JDBC driver jar cached in this container",
)
def test_write_jdbc_full_refresh_and_append_against_real_driver():
    jar = _find_jdbc_jar()
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT, jar, REPO],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    )
    out = json.loads(line[len("RESULT "):])
    assert out["n_stale"] == 0  # TRUNCATE removed the pre-load row
    expect = sorted(
        [[1, "a", 1.5], [2, "b", None], [3, None, 2.5]] * 2,  # refresh+append
        key=repr,
    )
    assert sorted(map(list, out["got"]), key=repr) == expect
    assert [tuple(c) for c in out["cols"]] == [
        ("id", "BIGINT"),
        ("s", "VARCHAR"),
        ("x", "DOUBLE"),
    ]
