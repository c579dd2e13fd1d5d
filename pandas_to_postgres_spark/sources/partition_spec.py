"""Hidden partitioning for the snapshot table — Iceberg partition
transforms on the manifest log.

Hive-style tables force users to filter on a PHYSICAL layout column
(``WHERE dt = '2024-01-03'``); get the transform wrong and the scan goes
full-table. Iceberg's fix is a PARTITION SPEC: each data file records the
TRANSFORMED value of source columns (``day(ts)``, ``bucket(16, id)``,
``truncate(4, code)``, identity) in table metadata, and the planner maps
predicates on the RAW column to predicates on the transform — users never
see, name, or filter on a partition column. This module is that design on
the snapshot manifest:

- :func:`write_partitioned_snapshot` clusters the frame by the transform
  values (one Spark ``partitionBy`` write, so each file holds exactly one
  partition tuple), flattens the staged layout into the snapshot dir, and
  publishes a version whose entries carry ``{"partition": {...}}`` plus a
  manifest-level ``partition_spec``.
- :func:`prune_partition_entries` evaluates raw-column predicates
  (equality / range) against each entry's transformed tuple IN PYTHON at
  planning time — the same transform definitions the writer used, so
  pruning is exact for equality on any transform and for ranges on the
  monotone transforms (day, truncate, identity). Ranges over ``bucket``
  cannot prune (hash destroys order) — entries are conservatively kept,
  the Iceberg rule.
- :func:`read_snapshot_hidden` = prune + scan kept files + re-apply the
  exact predicate (pruning is a superset guarantee, as everywhere else in
  this manifest design).

Scale: the transform evaluation is metadata-only (no data touched until
the pruned scan), composes with snapshot time travel (it prunes any
version's entries), and with the two-level sharded manifests (entries
keep their ``partition`` dict inside shards; pruning materializes the
version's entries first — shard-level partition summaries are a possible
further step, not needed until specs go very wide).

Transforms must evaluate IDENTICALLY in the Spark writer expression and
the Python planner:

- ``identity``: the raw value's string form.
- ``day``: ``date_format(col, 'yyyy-MM-dd')`` — lexicographic order ==
  chronological order, so ranges prune.
- ``truncate(w)``: ints ``v - pmod(v, w)`` (Python ``v - v % w`` — both
  floor toward -inf); strings ``substr(1, w)`` / ``v[:w]``. Monotone →
  ranges prune.
- ``bucket(n)``: ``int(md5(str(v))[:8], 16) % n`` — md5 of the value's
  canonical string, first 32 bits, positive mod (Spark:
  ``pmod(conv(substring(md5(cast(col as string)), 1, 8), 16, 10), n)``).
  md5 rather than xxhash64 because the planner must replay it in Python
  with no Spark round-trip. Equality prunes to one bucket; ranges keep.

Reference parity note: the reference loader has no partitioning concept
(it copies whole tables); this is part of the lakehouse [EXT] surface.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from typing import Any, Mapping, Sequence
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def spec_field(transform: str, col: str, param: int | None = None) -> dict:
    """One partition-spec field. ``transform`` ∈ {identity, day,
    truncate, bucket}; ``param`` is the truncate width / bucket count."""
    if transform in ("truncate", "bucket") and not param:
        raise ValueError(f"{transform} requires a positive param")
    if transform not in ("identity", "day", "truncate", "bucket"):
        raise ValueError(f"unknown transform {transform!r}")
    name = f"__p_{transform}_{col}" + (f"_{param}" if param else "")
    return {"transform": transform, "col": col, "param": param, "name": name}


_INT_TYPES = ("tinyint", "smallint", "int", "bigint", "long")


def _spark_transform(field: Mapping[str, Any], dtype: str) -> F.Column:
    t, c, p = field["transform"], field["col"], field["param"]
    col = F.col(c)
    if t == "identity":
        return col.cast("string")
    if t == "day":
        return F.date_format(col, "yyyy-MM-dd")
    if t == "truncate":
        if dtype in _INT_TYPES:
            # floor to a multiple of w (pmod keeps negatives Iceberg-
            # correct: truncate(10, -1) = -10, matching Python's v - v%w)
            return (
                col.cast("long") - F.pmod(col.cast("long"), F.lit(p))
            ).cast("string")
        return F.substring(col.cast("string"), 1, p)
    if t == "bucket":
        return F.pmod(
            F.conv(
                F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(p),
        ).cast("string")
    raise ValueError(f"unknown transform {t!r}")


def _py_transform(field: Mapping[str, Any], v: Any) -> str | None:
    """The planner's replay of the writer transform on a PREDICATE value."""
    if v is None:
        return None
    t, p = field["transform"], field["param"]
    if t == "identity":
        return str(v)
    if t == "day":
        # accepts datetime/date or an ISO string; normalize to yyyy-MM-dd
        s = str(v)
        return s[:10]
    if t == "truncate":
        if isinstance(v, int):
            return str(v - v % p)
        return str(v)[:p]
    if t == "bucket":
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        return str(h % p)
    raise ValueError(f"unknown transform {t!r}")


def stage_partitioned_files(
    df: DataFrame,
    path: str,
    spec: Sequence[Mapping[str, Any]],
    stat_cols: Sequence[str] = (),
    prefix: str = "part-p-",
) -> tuple[list[str], list[dict]]:
    """Write ``df`` clustered by the spec's transform values (one Spark
    ``partitionBy`` write — each staged file holds exactly one partition
    tuple), flatten the hive layout into ``path`` under ``prefix``-named
    files, and return (names, manifest entries carrying the tuple).
    Shared by the batch writer (:func:`write_partitioned_snapshot`) and
    the streaming epoch writer (``streaming/sink``), which differ only
    in naming and publish semantics."""
    from pandas_to_postgres_spark.sources.manifest import _entry

    pnames = [f["name"] for f in spec]
    clash = set(pnames) & set(df.columns)
    if clash:
        raise ValueError(f"partition names clash with data columns: {clash}")
    dtypes = dict(df.dtypes)
    staged = df.select(
        "*",
        *[
            _spark_transform(f, dtypes.get(f["col"], "string")).alias(
                f["name"]
            )
            for f in spec
        ],
    ).repartition(*[F.col(n) for n in pnames])
    stage = tempfile.mkdtemp(prefix="hidden-part-stage-")
    os.makedirs(path, exist_ok=True)
    names: list[str] = []
    entries: list[dict] = []
    try:
        staged.write.partitionBy(*pnames).mode("overwrite").parquet(stage)
        i = 0
        for dirpath, _dirs, files in sorted(os.walk(stage)):
            parts = [
                seg.split("=", 1)
                for seg in os.path.relpath(dirpath, stage).split(os.sep)
                if "=" in seg
            ]
            if len(parts) != len(spec):
                continue  # not a leaf partition dir
            tuple_vals = {
                k: (None if unquote(v) == _NULL_DIR else unquote(v))
                for k, v in parts
            }
            for fname in sorted(files):
                if not fname.endswith(".parquet") or fname.startswith(
                    (".", "_")
                ):
                    continue
                name = f"{prefix}{i:05d}.parquet"
                i += 1
                shutil.move(
                    os.path.join(dirpath, fname), os.path.join(path, name)
                )
                e = _entry(path, name, stat_cols)
                e["partition"] = tuple_vals
                entries.append(e)
                names.append(name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return names, entries


def _canon_spec(spec: Sequence[Mapping[str, Any]]) -> tuple:
    return tuple(
        (f["transform"], f["col"], f.get("param")) for f in spec
    )


def _head_specs(path: str) -> tuple[dict[str, list], str | None]:
    """The table's spec registry: {spec_id: fields} plus the default
    spec id — back-compat: a pre-evolution manifest carrying only
    ``partition_spec`` registers it as spec "0"."""
    from pandas_to_postgres_spark.sources.manifest import (
        load_snapshot,
        snapshot_versions,
    )

    if not os.path.isdir(path) or not snapshot_versions(path):
        return {}, None
    head = load_snapshot(path)
    specs = dict(head.get("partition_specs") or {})
    if not specs and head.get("partition_spec"):
        specs = {"0": head["partition_spec"]}
    return specs, str(head.get("default_spec_id", "0")) if specs else None


def write_partitioned_snapshot(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    spec: Sequence[Mapping[str, Any]],
    stat_cols: Sequence[str] = (),
) -> dict:
    """Write ``df`` as a hidden-partitioned snapshot version: one
    ``partitionBy`` write clusters rows so each file holds exactly one
    partition tuple, the staged hive layout flattens into the snapshot
    dir (partition values move from DIRECTORY NAMES into manifest entry
    metadata — the layout stops being load-bearing, which is the whole
    "hidden" point), and the publish records the spec.

    SPEC EVOLUTION (Iceberg spec-id-per-file): writing with a spec the
    table has not seen registers it in the manifest's
    ``partition_specs`` registry under a fresh id and makes it the
    default — NO existing file rewrites. Each entry carries the
    ``spec_id`` it was written under (absent = the table's first spec),
    and the planner prunes every file against ITS OWN spec, so a table
    can re-partition (day(ts) → hour(ts), bucket(8) → bucket(16))
    mid-life and old files keep pruning by their old layout while new
    files prune by the new one."""
    import uuid

    from pandas_to_postgres_spark.sources.manifest import publish_snapshot

    specs, _default = _head_specs(path)
    canon = _canon_spec(spec)
    sid = next(
        (i for i, s in specs.items() if _canon_spec(s) == canon), None
    )
    if sid is None:
        sid = str(max((int(i) for i in specs), default=-1) + 1)
        specs = dict(specs)
        specs[sid] = [dict(f) for f in spec]
    # job-unique part names: a second partitioned write must never clobber
    # files an earlier snapshot references (time travel would silently
    # read the new rows)
    names, entries = stage_partitioned_files(
        df, path, spec, stat_cols, prefix=f"part-p{uuid.uuid4().hex[:8]}-"
    )
    for e in entries:
        e["spec_id"] = sid
    return publish_snapshot(
        path,
        stat_cols,
        files=names,
        known_entries=entries,
        extra={
            "partition_spec": [dict(f) for f in spec],
            "partition_specs": specs,
            "default_spec_id": sid,
        },
    )


def append_partitioned_snapshot(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    spec: Sequence[Mapping[str, Any]],
    stat_cols: Sequence[str] | None = None,
) -> dict:
    """APPEND a new vintage to a hidden-partitioned table, evolving the
    partition spec if ``spec`` differs from any the table has seen —
    the Iceberg re-partition move: NO existing file is rewritten, the
    new spec is registered under a fresh ``spec_id`` and becomes the
    default, new entries are stamped with it, and the planner prunes
    every file against the spec it was written under. Re-partitioning
    a 100 TB table is therefore a metadata operation plus the new data
    only."""
    import uuid

    from pandas_to_postgres_spark.sources.manifest import append_snapshot

    specs, _default = _head_specs(path)
    canon = _canon_spec(spec)
    sid = next(
        (i for i, s in specs.items() if _canon_spec(s) == canon), None
    )
    if sid is None:
        sid = str(max((int(i) for i in specs), default=-1) + 1)
        specs = dict(specs)
        specs[sid] = [dict(f) for f in spec]
    names, entries = stage_partitioned_files(
        df,
        path,
        spec,
        stat_cols or (),
        prefix=f"part-p{uuid.uuid4().hex[:8]}-",
    )
    for e in entries:
        e["spec_id"] = sid
    return append_snapshot(
        path,
        names,
        stat_cols=stat_cols,
        known_entries=entries,
        spark=spark,
        extra={
            "partition_spec": [dict(f) for f in spec],
            "partition_specs": specs,
            "default_spec_id": sid,
        },
    )


def _entry_may_match(
    entry: dict,
    spec: Sequence[Mapping[str, Any]],
    predicates: Mapping[str, tuple],
) -> bool:
    """Conservative partition-tuple test: False only when some predicate
    PROVABLY excludes this entry's transformed value."""
    part = entry.get("partition", {})
    for f in spec:
        pred = predicates.get(f["col"])
        if pred is None:
            continue
        pv = part.get(f["name"])
        if pv is None:
            continue  # null partition (or pre-spec entry): keep
        op = pred[0]
        if op == "=":
            tv = _py_transform(f, pred[1])
            if tv is not None and pv != tv:
                return False
        elif op == "between":
            lo, hi = pred[1], pred[2]
            if f["transform"] == "bucket":
                continue  # hash destroys order: cannot prune a range
            tlo, thi = _py_transform(f, lo), _py_transform(f, hi)
            if tlo is None or thi is None:
                continue
            if f["transform"] == "truncate" and isinstance(lo, int):
                if not (int(tlo) <= int(pv) <= int(thi)):
                    return False
            elif f["transform"] == "identity" and isinstance(lo, int):
                if not (int(tlo) <= int(pv) <= int(thi)):
                    return False
            else:  # day / string truncate / string identity: lexicographic
                if not (tlo <= pv <= thi):
                    return False
        else:
            raise ValueError(f"unknown predicate op {op!r}")
    return True


def _shard_may_match(
    ref: Mapping[str, Any],
    specs: Mapping[str, Sequence[Mapping[str, Any]]],
    first_sid: str,
    predicates: Mapping[str, tuple],
) -> bool:
    """Shard-reference partition test (the Iceberg manifest-list skip):
    a shard whose ``partitions`` summary PROVABLY excludes a predicate
    is skipped without opening — metadata I/O stays O(matching shards)
    at 10^6 files. Shards without a summary (mixed specs, capped
    cardinality, pre-summary vintage) are conservatively opened."""
    psum = ref.get("partitions")
    if not psum:
        return True
    spec = specs.get(str(ref.get("spec_id", first_sid)))
    if spec is None:
        return True
    for f in spec:
        pred = predicates.get(f["col"])
        vals = psum.get(f["name"])
        if pred is None or vals is None:
            continue
        op = pred[0]
        if op == "=":
            tv = _py_transform(f, pred[1])
            if tv is not None and tv not in vals:
                return False
        elif op == "between":
            if f["transform"] == "bucket":
                continue  # hash destroys order
            tlo = _py_transform(f, pred[1])
            thi = _py_transform(f, pred[2])
            if tlo is None or thi is None:
                continue
            if f["transform"] in ("truncate", "identity") and isinstance(
                pred[1], int
            ):
                if not any(int(tlo) <= int(v) <= int(thi) for v in vals):
                    return False
            elif not any(tlo <= v <= thi for v in vals):
                return False
    return True


def plan_hidden_scan(
    path: str,
    predicates: Mapping[str, tuple],
    version: int | None = None,
) -> dict:
    """Planning-time partition pruning: evaluate raw-column predicates
    against every entry's transformed tuple — each entry against the
    spec it was WRITTEN under (``spec_id``, Iceberg's evolution rule),
    so after a re-partition old files keep pruning by their old
    transforms and new files by the new ones; a same-named field whose
    transform changed between specs (bucket(8)→bucket(16)) can never be
    tested against the wrong hash.

    On a SHARDED manifest the pruning is TWO-level: shard references
    are tested against their ``partitions`` summaries first, and only
    surviving shards are opened (the stats twin of
    ``manifest.plan_snapshot_scan``). Returns {"keep": entries,
    "total_files": int, "spec": [...], "shards_total", "shards_read"}
    (spec = the current default)."""
    from pandas_to_postgres_spark.sources.manifest import (
        _load_shard_entries,
        load_snapshot,
    )

    snap = load_snapshot(path, version, materialize=False)
    spec = snap.get("partition_spec")
    if not spec:
        raise ValueError(f"{path} has no partition_spec in its manifest")
    specs = dict(snap.get("partition_specs") or {})
    if not specs:
        specs = {"0": spec}
    first_sid = str(min(int(i) for i in specs))

    shards_total = shards_read = 0
    if "shards" in snap and "files" not in snap:
        refs = snap["shards"]
        shards_total = len(refs)
        live = [
            r
            for r in refs
            if _shard_may_match(r, specs, first_sid, predicates)
        ]
        shards_read = len(live)
        entries = [
            e for r in live for e in _load_shard_entries(path, r)
        ]
        total = sum(int(r["n"]) for r in refs)
    else:
        entries = snap["files"]
        total = len(entries)
    keep = []
    for e in entries:
        e_spec = specs.get(str(e.get("spec_id", first_sid)), spec)
        if _entry_may_match(e, e_spec, predicates):
            keep.append(e)
    return {
        "keep": keep,
        "total_files": total,
        "spec": spec,
        "shards_total": shards_total,
        "shards_read": shards_read,
    }


def read_snapshot_hidden(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
    version: int | None = None,
) -> DataFrame:
    """Hidden-partition read: predicates are on RAW columns
    (``{"ts": ("between", lo, hi), "user_id": ("=", 7)}``) — the planner
    maps them through the spec's transforms to prune files, then the
    EXACT predicate re-applies on the scan (superset guarantee). Users
    never reference a partition column; changing the spec later never
    changes this call.

    Surviving entries read through :func:`manifest._read_entries`
    (deletion-vector anti-join) and project through the snapshot's
    column map — hidden-partition reads must not resurrect DV-deleted
    rows or leak physical column names."""
    from pandas_to_postgres_spark.sources.manifest import (
        _apply_column_map,
        _read_entries,
        load_snapshot,
    )

    snap = load_snapshot(path, version)
    plan = plan_hidden_scan(path, predicates, version)
    entries = plan["keep"]
    if not entries:
        # all files pruned: one file still scans for the schema, with the
        # predicate forced false below — typed empty result
        entries = snap["files"][:1]
    cmap = snap.get("column_map")
    merge = bool(cmap and cmap.get("renames"))
    df = _apply_column_map(_read_entries(spark, path, entries, merge), cmap)
    pred = F.lit(True)
    for col, p in predicates.items():
        if p[0] == "=":
            pred = pred & (F.col(col) == F.lit(p[1]))
        elif p[0] == "between":
            pred = pred & F.col(col).between(F.lit(p[1]), F.lit(p[2]))
    if not plan["keep"]:
        pred = pred & F.lit(False)
    return df.filter(pred)
