"""Full driver-contract verify (the /verify recipe as a script): run every
declared query on a vanilla local[32] session and compare against the
DuckDB oracle at sf0.01, exactly as the external driver does."""

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
print("entry rows:", len(mod.entry(spark).collect()))
sys.path.insert(0, "/root/repo")
from tests.oracle_harness import duck_con, compare  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duck_con(SF)
fails = []
for name, fn in sorted(mod.queries().items()):
    try:
        got = fn(spark, SF).toPandas()
    except Exception as e:  # noqa: BLE001 - the board must keep going
        print(name, "ERROR", repr(e)[:200], flush=True)
        fails.append(name)
        continue
    o = mod.oracle_sql().get(name)
    if o is None:
        print(name, "rows-only", len(got), flush=True)
        continue
    diag = compare(got, con.sql(o).df())
    print(name, "MATCH" if diag is None else f"MISMATCH {diag}", flush=True)
    if diag:
        fails.append(name)
print("FAILURES:", fails or "none")
