"""Multi-table pipeline orchestration — the Spark re-expression of
``hdf_to_postgres`` (`/root/reference/pandas_to_postgres/hdf_to_postgres.py:106-201`).

The reference's lifecycle (SURVEY.md §3.1):
1. resolve table routing (keys × sql_to_hdf intersection)
2. build one copy object per SQL table (pickle-safe, deferred SQL objects)
3. execute serially or via ``multiprocessing.Pool``

Spark replaces every piece of machinery:
- the fork/pickle dance (``defer_sql_objs``, per-worker engine rebuild,
  `hdf_to_postgres.py:49-103`) is obsolete — Spark serializes closures and
  executors own their connections inside ``foreachPartition``;
- ``multiprocessing.Pool`` becomes driver-side threads submitting concurrent
  Spark jobs — the Spark scheduler interleaves their stages across the
  cluster (FAIR scheduling recommended for many small tables);
- the keys×routing filter survives as plain dict logic, WITHOUT the
  reference's ``set(x)``-over-a-string bug (`hdf_to_postgres.py:161` turns
  a key into its character set; intended ``{x}`` — not replicated).

100 TB notes: table-level parallelism multiplies against partition-level
write parallelism — cap the product (threads × partitions-per-table) at what
the target database sustains.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import reduce
from typing import Callable, Mapping, Optional, Sequence

from pyspark.sql import DataFrame


def resolve_routing(
    sql_to_hdf: Mapping[str, set[str]],
    keys: Optional[Sequence[str]] = None,
) -> dict[str, set[str]]:
    """Intersect the requested keys with the catalog routing
    (`hdf_to_postgres.py:147-163`), fixed: an explicit key with no catalog
    entry maps to ``{key}``, not ``set(key)`` (reference bug)."""
    if keys is None:
        routing = {t: set(ks) for t, ks in sql_to_hdf.items() if ks}
    else:
        requested = set(keys)
        routing = {}
        for table, ks in sql_to_hdf.items():
            hit = ks & requested
            if hit:
                routing[table] = hit
        for key in requested - set().union(*sql_to_hdf.values()) if sql_to_hdf else requested:
            routing.setdefault(key.lstrip("/"), set()).add(key)
    if not routing:
        raise ValueError("No tables to copy (empty routing)")
    return routing


def union_sources(dfs: Sequence[DataFrame]) -> DataFrame:
    """Many sources → one table (U1): bag union by column name
    (`utilities.py:36-38`, `copy_hdf.py:98-120`)."""
    if not dfs:
        raise ValueError("union_sources needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def copy_tables(
    tables: Mapping[str, DataFrame],
    sink: Callable[[str, DataFrame], None],
    processes: Optional[int] = None,
) -> dict[str, Optional[Exception]]:
    """Load many tables through ``sink(table_name, df)``.

    ``processes=None`` → serial loop (`hdf_to_postgres.py:173-176`);
    ``processes=N`` → N driver threads submitting concurrent Spark jobs
    (`:178-198`'s Pool, minus the fork). Errors are captured per table and
    re-raised after all complete — matching the reference's
    ``result.get()`` error propagation (`:195-198`) but without abandoning
    sibling tables mid-flight.
    """
    results: dict[str, Optional[Exception]] = {}
    if not processes:
        for name, df in tables.items():
            try:
                sink(name, df)
                results[name] = None
            except Exception as e:  # noqa: BLE001 — reported to caller
                results[name] = e
    else:
        def run(item):
            name, df = item
            try:
                sink(name, df)
                return name, None
            except Exception as e:  # noqa: BLE001
                return name, e

        with ThreadPoolExecutor(max_workers=processes) as pool:
            for name, err in pool.map(run, tables.items()):
                results[name] = err
    errors = {n: e for n, e in results.items() if e is not None}
    if errors:
        raise RuntimeError(f"copy failed for tables {sorted(errors)}: {errors}")
    return results
