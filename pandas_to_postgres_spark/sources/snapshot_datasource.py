"""``format("snapshot")`` — Spark 4 Python DataSource over the manifest
snapshot table (``sources/manifest``): time travel through the standard
reader API plus PLANNING-TIME file pruning from manifest statistics.

    spark.dataSource.register(SnapshotDataSource)
    df = (spark.read.format("snapshot")
          .option("path", table_dir)
          .option("version", 3)          # omit for latest
          .load())

Why a DataSource and not ``read_snapshot``: the function form hands Spark
an explicit file list, which is right for programmatic pipelines; the
DataSource form gives every SQL/DataFrame consumer the same table by name
AND lets predicate pushdown prune files the way a table format would —
``pushFilters`` records numeric range constraints and ``partitions()``
keeps only the files whose manifest [min, max] envelope overlaps, so the
executors never open the losing files. Pruning is a SUPERSET guarantee:
every filter is yielded back to Spark un-consumed and re-applied exactly,
so a file with missing stats (or any non-numeric / non-range predicate)
degrades to "read it", never to a wrong result — the same contract as
``read_snapshot_pruned`` and parquet partition pruning.

Pushdown gating (the pg_datasource lesson): merely DEFINING ``pushFilters``
raises [DATA_SOURCE_PUSHDOWN_DISABLED] at plan time when
``spark.sql.python.filterPushdown.enabled`` is false, and the planning
worker has no SparkSession to probe the conf — so the pushdown-capable
reader class is opted into with ``option("pushdown", "true")``.

Rows cross to Spark as Arrow RecordBatches straight from the parquet
reader (column-pruned to the projected schema) — never Python row tuples.

At 100 TB: one InputPartition per surviving manifest file; listing cost is
one JSON read at planning time instead of a filesystem walk, and a
selective range scan schedules O(matching files) tasks. Concurrent
publishers (batch writer, stream ingest, compaction) arbitrate through
the manifest module's atomic version claim + optimistic retry.
"""

from __future__ import annotations

import os
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)


#: column appended by a multi-version read (``option("versions", "1,2")``)
#: carrying each row's source snapshot version
_VERSION_COL = "_snapshot_version"


def _versions_list(options) -> list[int] | None:
    """``versions`` option ("1,2,5") → [1, 2, 5], or None when unset.
    One read spanning several versions pays ONE planning-worker spawn per
    planning call instead of one per version — the Iceberg
    incremental-scan shape; rows carry ``_snapshot_version``."""
    raw = options.get("versions")
    if raw is None:
        return None
    vs = [int(x) for x in str(raw).split(",") if str(x).strip()]
    if not vs:
        raise ValueError("option 'versions' must list at least one version")
    return vs


def _resolve_version(options) -> int | None:
    """``version`` / ``timestampAsOf`` / ``ref`` option → concrete
    version (or None = latest). Mutually exclusive, like Delta's
    versionAsOf / timestampAsOf; ``ref`` resolves a named tag or branch
    (``option("ref", "main")`` = the write-audit-publish gated view).
    ``versions`` (plural, the multi-version read) excludes all three."""
    from pandas_to_postgres_spark.sources.manifest import (
        resolve_ref,
        snapshot_as_of,
    )

    v = options.get("version")
    ts = options.get("timestampasof", options.get("timestampAsOf"))
    ref = options.get("ref")
    if sum(x is not None for x in (v, ts, ref)) > 1:
        raise ValueError("pass at most one of version / timestampAsOf / ref")
    if options.get("versions") is not None and any(
        x is not None for x in (v, ts, ref)
    ):
        raise ValueError(
            "option 'versions' excludes version / timestampAsOf / ref"
        )
    if ts is not None:
        return snapshot_as_of(options["path"], float(ts))
    if ref is not None:
        return resolve_ref(options["path"], ref)
    if v is None:
        vs = _versions_list(options)
        if vs is not None:
            return vs[0]  # schema/column-map basis for the multi-read
    return int(v) if v is not None else None


def _map_columns(st, cmap):
    """Project an inferred physical schema to the LOGICAL one: renamed
    columns appear under their logical name (type taken from whichever
    physical alias the sampled file carries), dropped columns and
    superseded aliases disappear."""
    if not cmap:
        return st
    from pyspark.sql import types as T

    renames = cmap.get("renames", {})
    dropped = set(cmap.get("dropped", []))
    alias_of = {a: lg for lg, als in renames.items() for a in als}
    fields, seen = [], set()
    for f in st.fields:
        name = alias_of.get(f.name, f.name)
        if f.name in dropped or name in dropped or name in seen:
            continue
        seen.add(name)
        fields.append(T.StructField(name, f.dataType, True, f.metadata))
    return T.StructType(fields)


def _load(options, materialize: bool = True) -> dict:
    from pandas_to_postgres_spark.sources.manifest import load_snapshot

    return load_snapshot(
        options["path"], _resolve_version(options), materialize=materialize
    )


class SnapshotReaderNoPushdown(DataSourceReader):
    """Reader WITHOUT pushFilters (default): every snapshot file becomes
    one InputPartition; Spark applies all predicates. ``spark_schema``
    carries the resolved (possibly unified) schema so evolved reads can
    null-fill columns a pre-evolution file lacks."""

    def __init__(self, options, schema):
        self.options = dict(options)
        if hasattr(schema, "fieldNames"):  # StructType (the API path)
            self.spark_schema = schema
            self.columns = list(schema.fieldNames())
        else:  # bare column-name list (direct construction in tests):
            # projection works, evolution null-fill needs the typed schema
            self.spark_schema = None
            self.columns = list(schema)
        #: col -> [lo, hi] numeric bounds accumulated by pushFilters
        #: (always empty in this class)
        self.ranges: dict[str, list] = {}
        #: raw-valued predicate capture for HIDDEN-PARTITION pruning
        #: (types preserved: bucket transforms hash the value's exact
        #: string form, so int 7 must stay 7, never 7.0)
        self.part_eq: dict[str, object] = {}
        self.part_lo: dict[str, object] = {}
        self.part_hi: dict[str, object] = {}
        #: col -> True (IS NULL) / False (IS NOT NULL): pruned against
        #: the per-file footer null counts the manifest records
        self.null_preds: dict[str, bool] = {}
        #: col -> set of IN-list values (stats + partition pruning)
        self.in_sets: dict[str, set] = {}
        #: logical -> physical alias chain from the manifest column_map
        #: (captured at plan time; executors project per-file through it)
        try:
            cm = _load(self.options, materialize=False).get("column_map") or {}
        except Exception:
            cm = {}
        self.renames: dict[str, list] = dict(cm.get("renames", {}))

    def _partition_predicates(self) -> dict:
        preds: dict[str, tuple] = {}
        for col, v in self.part_eq.items():
            preds[col] = ("=", v)
        for col in set(self.part_lo) & set(self.part_hi):
            if col not in preds:
                preds[col] = ("between", self.part_lo[col], self.part_hi[col])
        return preds

    def _keep(self, entry: dict) -> bool:
        rows = entry.get("rows")
        for col, want_null in self.null_preds.items():
            nulls = entry.get("nulls", {}).get(col)
            if nulls is None or rows is None:
                continue  # no null stats -> conservatively keep
            # physical counts stay valid under deletion vectors: zero
            # physical nulls means zero live nulls, all-null means every
            # live row is null — both prunes remain supersets
            if want_null and nulls == 0:
                return False
            if not want_null and nulls == rows:
                return False
        for col, (lo, hi) in self.ranges.items():
            st = entry.get("stats", {}).get(col)
            if st is None:
                continue  # no stats -> conservatively keep
            try:
                fmin, fmax = float(st[0]), float(st[1])
            except (TypeError, ValueError):
                continue
            if (hi is not None and hi < fmin) or (lo is not None and lo > fmax):
                return False
        for col, values in self.in_sets.items():
            st = entry.get("stats", {}).get(col)
            if st is None:
                continue
            try:
                fmin, fmax = float(st[0]), float(st[1])
                if not any(fmin <= float(v) <= fmax for v in values):
                    return False
            except (TypeError, ValueError):
                continue
        return True

    def partitions(self) -> List[InputPartition]:
        path = self.options["path"]
        vs = _versions_list(self.options)
        if vs is not None:
            # multi-version read: one partition per (surviving file,
            # version) pair — ONE planning pass spans every listed
            # version, and each row will carry _VERSION_COL
            from pandas_to_postgres_spark.sources.manifest import (
                load_snapshot,
            )

            keep = [
                InputPartition(
                    (
                        os.path.join(path, e["path"]),
                        tuple(e.get("dv") or ()),
                        v,
                    )
                )
                for v in vs
                for e in self._plan_entries(
                    load_snapshot(path, v, materialize=False), path
                )
            ]
            return keep or [InputPartition(None)]
        man = _load(self.options, materialize=False)
        keep = [
            InputPartition(
                (os.path.join(path, e["path"]), tuple(e.get("dv") or ()))
            )
            for e in self._plan_entries(man, path)
        ]
        # an all-pruned (or empty) snapshot still needs one partition so
        # read() can yield nothing of the right shape
        return keep or [InputPartition(None)]

    def _plan_entries(self, man: dict, path: str) -> list:
        """Manifest → entries surviving stats/partition pruning (shared
        by the single- and multi-version planning paths)."""
        from pandas_to_postgres_spark.sources.manifest import (
            _load_shard_entries,
        )

        if "shards" in man and "files" not in man:
            # two-level skip: shard refs carry the same {col: [min, max]}
            # shape as entries, so the pushed ranges prune whole shards
            # before any shard content is read (manifest-list planning)
            entries = [
                e
                for r in man["shards"]
                if self._keep(r)
                for e in _load_shard_entries(path, r)
            ]
        else:
            entries = man["files"]
        spec = man.get("partition_spec")
        preds = self._partition_predicates() if spec else {}
        if spec and preds:
            # hidden-partition pruning: map the pushed raw-column
            # predicates through the spec's transforms (equality on any
            # transform, two-sided ranges on the monotone ones) — each
            # entry against the spec it was WRITTEN under (spec_id;
            # evolution keeps old files pruning by their old layout)
            from pandas_to_postgres_spark.sources.partition_spec import (
                _entry_may_match,
            )

            specs = dict(man.get("partition_specs") or {}) or {"0": spec}
            first_sid = str(min(int(i) for i in specs))
            entries = [
                e
                for e in entries
                if _entry_may_match(
                    e,
                    specs.get(str(e.get("spec_id", first_sid)), spec),
                    preds,
                )
            ]
        return [e for e in entries if self._keep(e)]

    def read(self, partition: InputPartition) -> Iterator:
        if partition.value is None:
            return
        if len(partition.value) == 3:  # multi-version read
            import pyarrow as pa

            fpath, dv, ver = partition.value
            cols = [c for c in self.columns if c != _VERSION_COL]
            schema = self.spark_schema
            if schema is not None and _VERSION_COL in schema.fieldNames():
                from pyspark.sql import types as T

                schema = T.StructType(
                    [f for f in schema.fields if f.name != _VERSION_COL]
                )
            for b in _read_file_projected(
                fpath, cols, schema, dv, self.renames
            ):
                t = pa.Table.from_batches([b]).append_column(
                    _VERSION_COL, pa.array([ver] * b.num_rows, pa.int64())
                )
                yield from t.to_batches()
            return
        fpath, dv = partition.value
        yield from _read_file_projected(
            fpath, self.columns, self.spark_schema, dv, self.renames
        )


def _read_file_projected(
    file_path, columns, spark_schema, dv=(), renames=None
) -> Iterator:
    """One parquet file → Arrow batches projected to ``columns``.
    Schema evolution: columns the file predates are null-filled at the
    projected type and column order restored, so every partition's
    batches line up regardless of when its file was written. ``dv`` is
    the file's deletion vector (dead row ordinals from the manifest —
    merge-on-read DELETE); those rows are masked out before yielding."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    def _apply_dv(t: "pa.Table") -> "pa.Table":
        if not dv:
            return t
        mask = np.ones(t.num_rows, dtype=bool)
        mask[list(dv)] = False
        return t.filter(pa.array(mask))

    def _us_timestamps(t: "pa.Table") -> "pa.Table":
        # Spark writes INT96 timestamps that arrow surfaces as NANOSECOND,
        # which the Python DataSource bridge rejects (UNSUPPORTED_ARROWTYPE)
        # — cast to microseconds, Spark's native precision
        fields = []
        changed = False
        for f in t.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(pa.field(f.name, pa.timestamp("us", f.type.tz)))
                changed = True
            else:
                fields.append(f)
        return t.cast(pa.schema(fields)) if changed else t

    if spark_schema is None:  # bare-list construction: no evolution
        yield from _apply_dv(
            _us_timestamps(pq.read_table(file_path, columns=columns))
        ).to_batches()
        return
    have = set(pq.read_schema(file_path).names)
    # column mapping: a LOGICAL column absent from this file vintage may
    # exist under a physical alias (metadata-only renames) — read the
    # alias and surface it under the logical name
    src = {}
    for c in columns:
        if c in have:
            src[c] = c
        else:
            for a in (renames or {}).get(c, ()):  # alias chain, newest first
                if a in have:
                    src[c] = a
                    break
    present = [c for c in columns if c in src]
    tbl = _apply_dv(
        _us_timestamps(
            pq.read_table(file_path, columns=[src[c] for c in present])
        )
    ).rename_columns(present)
    missing = [c for c in columns if c not in src]
    if missing:
        target = to_arrow_schema(spark_schema)
        for c in missing:
            tbl = tbl.append_column(
                c, pa.nulls(tbl.num_rows, target.field(c).type)
            )
        tbl = tbl.select(columns)
    yield from tbl.to_batches()


class SnapshotReader(SnapshotReaderNoPushdown):
    """Pushdown-capable reader: numeric range predicates tighten the
    per-column [lo, hi] window used for file pruning. Every filter is
    yielded back un-consumed — Spark re-applies the exact predicate, so
    pruning can only ever drop files that cannot match."""

    def pushFilters(self, filters):  # noqa: N802 - API name
        for f in filters:
            v = getattr(f, "value", None)
            attr = getattr(f, "attribute", ())
            if isinstance(f, (IsNull, IsNotNull)) and len(attr) == 1 \
                    and attr[0] in self.columns:
                self.null_preds[attr[0]] = isinstance(f, IsNull)
                yield f
                continue
            if isinstance(f, In) and len(attr) == 1 \
                    and attr[0] in self.columns:
                vals = getattr(f, "value", None) or ()
                if vals and all(v is not None for v in vals):
                    self.in_sets[attr[0]] = set(vals)
                yield f
                continue
            # raw-valued capture for hidden-partition pruning (any type:
            # bucket hashes exact string forms, day takes datetimes)
            if v is not None and len(attr) == 1 and attr[0] in self.columns:
                col = attr[0]
                try:
                    if isinstance(f, EqualTo):
                        self.part_eq[col] = v
                    elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        cur = self.part_lo.get(col)
                        self.part_lo[col] = v if cur is None else max(cur, v)
                    elif isinstance(f, (LessThan, LessThanOrEqual)):
                        cur = self.part_hi.get(col)
                        self.part_hi[col] = v if cur is None else min(cur, v)
                except TypeError:
                    pass  # incomparable bound types: skip, stay superset
            numeric = isinstance(v, (int, float)) and not isinstance(v, bool)
            if numeric and len(attr) == 1 and attr[0] in self.columns:
                col = attr[0]
                lo, hi = self.ranges.get(col, [None, None])
                fv = float(v)
                if isinstance(f, EqualTo):
                    lo = fv if lo is None else max(lo, fv)
                    hi = fv if hi is None else min(hi, fv)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = fv if lo is None else max(lo, fv)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    hi = fv if hi is None else min(hi, fv)
                else:
                    yield f
                    continue
                self.ranges[col] = [lo, hi]
            yield f  # never consumed: pruning is a superset guarantee


class SnapshotDataSource(DataSource):
    """``format("snapshot")`` — options: path (snapshot table directory),
    version (optional, default latest), versions ("1,2" = ONE read
    spanning several versions, rows tagged with a trailing
    ``_snapshot_version`` long column — one planning-worker spawn per
    planning call instead of one whole read per version; excludes
    version/timestampAsOf/ref), pushdown ("true" to enable the
    pushFilters reader; requires spark.sql.python.filterPushdown.enabled),
    mergeSchema ("true" = ADD-COLUMN schema evolution: the schema is the
    UNION of the per-file schemas and pre-evolution files null-fill the
    added columns — default reads the first file's schema)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from pandas_to_postgres_spark.sources.manifest import (
            _load_shard_entries,
        )

        man = _load(self.options, materialize=False)
        root = self.options["path"]
        if "shards" in man and "files" not in man:
            # default schema needs ONE file: open only the first shard
            # (mergeSchema unions every file's footer, so it loads all)
            refs = man["shards"]
            merging = str(self.options.get("mergeschema",
                                           self.options.get("mergeSchema",
                                                            "false"))
                          ).lower() == "true"
            man["files"] = [
                e
                for r in (refs if merging else refs[:1])
                for e in _load_shard_entries(root, r)
            ]
        if not man["files"]:
            raise ValueError("snapshot has no files to infer a schema from")

        def _all_nullable(st):
            # Spark writes non-null columns as parquet REQUIRED; inferring
            # the table schema from such a file would mark the column
            # non-nullable and Spark then constant-folds `col IS NULL` to
            # empty — wrong the moment ANOTHER file carries nulls. An
            # external table's columns are always nullable (the
            # Iceberg/Delta rule).
            from pyspark.sql import types as T

            return T.StructType(
                [
                    T.StructField(f.name, f.dataType, True, f.metadata)
                    for f in st.fields
                ]
            )

        def _with_version_col(st):
            # multi-version read: rows carry their source snapshot
            # version in a trailing long column
            if _versions_list(self.options) is None:
                return st
            from pyspark.sql import types as T

            return T.StructType(
                list(st.fields) + [T.StructField(_VERSION_COL, T.LongType())]
            )

        if str(self.options.get("mergeschema",
                                self.options.get("mergeSchema", "false"))
               ).lower() == "true":
            # ADD-COLUMN schema evolution: union the per-file schemas
            # (missing columns null-fill at read); one footer read per
            # manifest file, planning-time only
            return _with_version_col(_map_columns(
                _all_nullable(
                    from_arrow_schema(
                        pa.unify_schemas(
                            [
                                pq.read_schema(os.path.join(root, e["path"]))
                                for e in man["files"]
                            ]
                        )
                    )
                ),
                _load(self.options, materialize=False).get("column_map"),
            ))
        first = os.path.join(root, man["files"][0]["path"])
        return _with_version_col(_map_columns(
            _all_nullable(from_arrow_schema(pq.read_schema(first))),
            _load(self.options, materialize=False).get("column_map"),
        ))

    def reader(self, schema) -> SnapshotReaderNoPushdown:
        enabled = str(self.options.get("pushdown", "false")).lower() == "true"
        cls = SnapshotReader if enabled else SnapshotReaderNoPushdown
        return cls(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "SnapshotArrowWriter":
        return SnapshotArrowWriter(self.options, overwrite)

    def streamReader(self, schema) -> "SnapshotStreamReader":
        return SnapshotStreamReader(self.options, schema)


class SnapshotWriteCommit(WriterCommitMessage):
    """Per-task commit message: the staged file name (empty = no rows)."""

    def __init__(self, tmp: str, rows: int):
        self.tmp = tmp
        self.rows = rows


class SnapshotArrowWriter(DataSourceArrowWriter):
    """``df.write.format("snapshot")`` — the WRITE half, API-symmetric
    with the reader. Maps Spark's batch commit protocol onto the snapshot
    contract:

    - ``write`` (per task): stage the partition's Arrow batches as ONE
      dot-prefixed ``.tmp-<job>-<uuid>.parquet`` (invisible to the
      manifest's directory listing and to plain parquet readers); the
      attempt-unique name makes retried/speculative attempts collision-
      free, and the commit message carries it.
    - ``commit`` (driver, once): rename every staged file to
      ``part-w<job>-NNNNN.parquet``, then publish ONE snapshot version.
      ``mode("append")`` publishes the previous latest version's file
      list PLUS the new files (never the raw directory listing, so a
      crashed writer's orphans cannot leak into a snapshot);
      ``mode("overwrite")`` publishes ONLY the new files — a LOGICAL
      overwrite: prior versions keep their files on disk and keep
      time-traveling; ``expire_snapshots`` reclaims them later.
    - ``abort``: unlink the job's staged files; no manifest was written,
      so readers never saw anything.

    ``option("statCols", "a,b")`` selects the manifest stat columns for
    the published version; when absent the head snapshot's stat columns
    carry over (a fresh table defaults to none — readable, no file
    pruning). Appends reuse the head's manifest entries, so a commit
    costs O(new files) footer reads, not O(table), and concurrent
    publishers arbitrate via the manifest version claim.
    """

    def __init__(self, options, overwrite: bool):
        import uuid

        self.options = dict(options)
        self.path = options["path"]
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:8]

    def write(self, iterator) -> SnapshotWriteCommit:
        import uuid

        import pyarrow.parquet as pq

        # stream batches into the file as they arrive (one row group per
        # Arrow batch) — buffering the whole partition into one in-memory
        # table OOMs the Python worker on large inputs (ADVICE r6)
        writer = None
        tmp = f".tmp-{self.job_id}-{uuid.uuid4().hex[:12]}.parquet"
        rows = 0
        try:
            for b in iterator:
                if not b.num_rows:
                    continue
                if writer is None:
                    os.makedirs(self.path, exist_ok=True)
                    writer = pq.ParquetWriter(
                        os.path.join(self.path, tmp), b.schema
                    )
                writer.write_batch(b)
                rows += b.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return SnapshotWriteCommit(tmp="", rows=0)
        return SnapshotWriteCommit(tmp=tmp, rows=rows)

    def _stat_cols(self):
        """None = option absent → inherit the head snapshot's stat
        columns (an un-optioned append must not silently degrade all
        future file pruning to full scans — ADVICE r6)."""
        raw = self.options.get("statcols", self.options.get("statCols"))
        if raw is None:
            return None
        return [c.strip() for c in raw.split(",") if c.strip()]

    def commit(self, messages) -> None:
        from pandas_to_postgres_spark.sources.manifest import (
            append_snapshot,
            publish_snapshot,
        )

        new = []
        i = 0
        for m in messages:
            if m is None or not m.tmp:
                continue
            name = f"part-w{self.job_id}-{i:05d}.parquet"
            os.rename(
                os.path.join(self.path, m.tmp),
                os.path.join(self.path, name),
            )
            new.append(name)
            i += 1
        sc = self._stat_cols()
        if self.overwrite:
            # logical overwrite: ONLY the new files; stat basis carries
            # over from the head unless explicitly re-optioned
            if sc is None:
                from pandas_to_postgres_spark.sources.manifest import (
                    load_snapshot,
                    snapshot_versions,
                )

                sc = (
                    load_snapshot(self.path).get("stat_cols", [])
                    if snapshot_versions(self.path)
                    else []
                )
            publish_snapshot(self.path, sc, files=new)
        else:
            # head-merged, claim-retried, entry-reusing append
            append_snapshot(self.path, new, stat_cols=sc)

    def abort(self, messages) -> None:
        import glob

        for stale in glob.glob(
            os.path.join(self.path, f".tmp-{self.job_id}-*.parquet")
        ):
            try:
                os.unlink(stale)
            except FileNotFoundError:
                pass


class SnapshotStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("snapshot")`` — the snapshot table as an
    APPEND-ONLY CHANGE FEED: offsets are snapshot VERSION numbers, and a
    micro-batch (start, end] yields the rows of files that versions
    start+1..end added (files in end's list absent from start's). Because
    manifests are immutable and versions only grow, offsets are trivially
    monotonic, a replayed range plans byte-identical files, and the
    offset is ONE integer regardless of table age — no file-listing state
    (contrast the HDF5 landing-dir source, which must watermark mtimes;
    here the manifest IS the log).

    DML semantics (Delta's CDF contract, now that the table supports
    merge/delete/compaction): versions are walked one by one —
    compaction versions carry ``data_change: false`` and emit NOTHING
    (rows were only reorganized); a version that REMOVED files (merge /
    delete / logical overwrite) FAILS FAST by default, because emitting
    its rewritten files would replay every surviving row and silently
    drop deletions — ``option("ignoreChanges", "true")`` accepts the
    re-emitted rewrites (downstream must dedup by key), exactly Delta's
    option of the same name. Versions expired between polls fold into
    the next retained version's diff."""

    def __init__(self, options, schema):
        self.options = dict(options)
        self.path = options["path"]
        self.spark_schema = schema
        self.columns = list(schema.fieldNames())
        #: committed-offset floor for maxVersionsPerTrigger (None until
        #: the first commit of this session — see latestOffset)
        self._last_committed: int | None = None

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        """Head version — bounded by two options:

        - ``ref``: follow a NAMED BRANCH instead of raw latest (audited
          streaming: the feed only advances when the write-audit-publish
          gate moves the branch — unaudited versions are never even
          offered as an offset);
        - ``maxVersionsPerTrigger``: advance at most N versions per
          micro-batch (the file-source ``maxFilesPerTrigger`` rate-limit
          shape — a stream catching up on a long version backlog drains
          it in bounded bites instead of one giant batch).
        """
        from pandas_to_postgres_spark.sources.manifest import (
            resolve_ref,
            snapshot_versions,
        )

        ref = self.options.get("ref")
        if ref is not None:
            head = resolve_ref(self.path, ref)
        else:
            vs = snapshot_versions(self.path)
            head = vs[-1] if vs else 0
        cap = self.options.get(
            "maxversionspertrigger",
            self.options.get("maxVersionsPerTrigger"),
        )
        if cap is not None and self._last_committed is not None:
            # cap only once this session has a committed floor — on a
            # fresh reader (restart) the checkpointed start is unknown
            # here, and capping below it would regress the offset; the
            # first batch therefore drains uncapped, every later one is
            # bounded (same spirit as availableNow's full first drain)
            head = min(head, self._last_committed + max(1, int(cap)))
        return {"version": head}

    def _snap(self, version: int) -> dict:
        if version <= 0:
            return {"files": []}
        from pandas_to_postgres_spark.sources.manifest import load_snapshot

        return load_snapshot(self.path, version)

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return [InputPartition(None)]
        ignore_changes = str(
            self.options.get(
                "ignorechanges", self.options.get("ignoreChanges", "false")
            )
        ).lower() == "true"
        # Per-VERSION walk (not files(v1) - files(v0)): a file added at
        # v0+1 and merged away by v1 still gets its rows emitted, and
        # each version's change class is judged on its own manifest.
        emit: set = set()
        prev = {e["path"] for e in self._snap(v0)["files"]}
        for v in range(v0 + 1, v1 + 1):
            try:
                snap = self._snap(v)
            except ValueError:
                # version expired between polls: fold its delta into the
                # next retained version's diff (prev carries across the
                # gap, so net additions/removals are still seen)
                continue
            cur = {e["path"] for e in snap["files"]}
            if snap.get("data_change") is False:
                # compaction: rows only reorganized — nothing to emit
                prev = cur
                continue
            if snap.get("dml") == "delete_dv" and not ignore_changes:
                raise ValueError(
                    f"snapshot change feed: version {v} of {self.path} is "
                    "a deletion-vector DELETE (rows died in place, no "
                    "files added). An append-only feed cannot express it "
                    "— set .option('ignoreChanges', 'true') to skip DML "
                    "versions (downstream must reconcile deletes), or "
                    "stream only append-only tables."
                )
            if (prev - cur) and not ignore_changes:
                raise ValueError(
                    f"snapshot change feed: version {v} of {self.path} "
                    "REMOVED files (a merge/delete/overwrite, not an "
                    "append). Streaming it would re-emit every surviving "
                    "row of the rewritten files and silently drop "
                    "deletions — the Delta CDF failure mode. Set "
                    ".option('ignoreChanges', 'true') to accept "
                    "re-emitted rewritten rows (downstream must dedup by "
                    "key), or stream only append-only tables."
                )
            emit.update(cur - prev)
            prev = cur
        return [
            InputPartition(os.path.join(self.path, f)) for f in sorted(emit)
        ] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator:
        if partition.value is None:
            return
        yield from _read_file_projected(
            partition.value, self.columns, self.spark_schema
        )

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; manifests are immutable —
        # we only remember the floor for maxVersionsPerTrigger
        self._last_committed = int(end["version"])
