"""Postgres COPY fast-path sink with constraint management (SURVEY.md §2.1
S8–S12, §4) — the Spark re-expression of the reference's core machinery.

Reference behavior being reproduced (all `/root/reference/pandas_to_postgres/`):
- ``COPY {table} ({cols}) FROM STDIN WITH CSV`` via psycopg2 ``copy_expert``
  from an in-memory CSV buffer (`_base_copy.py:130-144`, `utilities.py:76-92`)
- PK/FK drop before load, recreate after (`_base_copy.py:67-114`)
- TRUNCATE before, ANALYZE after (`_base_copy.py:116-128`)
- ``SET maintenance_work_mem`` for index rebuild (`hdf_to_postgres.py:88-91`)
- ``FREEZE`` requires COPY in the same transaction as TRUNCATE
  (comment `copy_hdf.py:70`)

Spark-first design:
- the *data plane* is ``df.foreachPartition``: each executor task opens its
  own psycopg2 connection and streams its partition as CSV chunks — N
  partitions load in parallel (the reference's table-level
  ``multiprocessing.Pool`` becomes partition-level parallelism).
- the *control plane* (DDL: constraints, truncate, analyze) runs on the
  driver, before/after the Spark job — Spark has no constraint hooks, same
  as the reference's copy() bracket.
- FREEZE vs parallelism (SURVEY.md §4 hard part #1): FREEZE demands one
  transaction containing both TRUNCATE and every COPY — impossible across
  parallel writers. ``freeze=True`` therefore coalesces to a single
  partition and does TRUNCATE+COPY FREEZE in one transaction (the
  reference's exact behavior); ``freeze=False`` (default) truncates on the
  driver and COPYies partitions concurrently — at scale the parallel
  non-FREEZE path wins by a wide margin.

The pure helpers (DDL builders, CSV serialization) have no psycopg2
dependency and are unit-tested; the network paths import psycopg2 lazily and
raise a clear error when it is absent (as in this container).

100 TB notes: cap write parallelism with ``num_partitions`` (the database is
the bottleneck); each partition streams CSV in bounded ``csv_chunk_rows``
batches so executor memory is flat; constraint rebuild cost is server-side
and amortized once per table, not per partition.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Iterable, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame


# --------------------------------------------------------------- descriptors

@dataclass(frozen=True)
class ForeignKey:
    """One FK constraint of the target table (name + its DDL body)."""

    name: str
    definition: str  # e.g. "FOREIGN KEY (o_custkey) REFERENCES customer(c_custkey)"


@dataclass(frozen=True)
class TargetTable:
    """Driver-side descriptor of the external target table.

    The reference reflects this via SQLAlchemy (`hdf_to_postgres.py:81-96`);
    here it is either constructed explicitly or reflected with
    :func:`reflect_target_table`. The target schema stays authoritative —
    the engine never creates tables.
    """

    schema: str
    name: str
    columns: Sequence[str]
    primary_key: Optional[Sequence[str]] = None
    pk_name: Optional[str] = None
    foreign_keys: Sequence[ForeignKey] = field(default_factory=tuple)

    @property
    def qualified(self) -> str:
        return f'"{self.schema}"."{self.name}"'


# ------------------------------------------------------- pure SQL builders

def truncate_sql(t: TargetTable) -> str:
    """`_base_copy.py:116-121`."""
    return f"TRUNCATE TABLE {t.qualified};"


def analyze_sql(t: TargetTable) -> str:
    """`_base_copy.py:123-128`."""
    return f"ANALYZE {t.qualified};"


def drop_pk_sql(t: TargetTable) -> str:
    """`_base_copy.py:67-80` (DROP ... CASCADE, tolerate absence upstream)."""
    pk = t.pk_name or f"{t.name}_pkey"
    return f'ALTER TABLE {t.qualified} DROP CONSTRAINT IF EXISTS "{pk}" CASCADE;'


def create_pk_sql(t: TargetTable) -> str:
    """`_base_copy.py:82-92` (note: the reference's error message there
    says "foreign key" for the PK path — bug, not replicated)."""
    if not t.primary_key:
        raise ValueError(f"{t.name} has no primary key")
    pk = t.pk_name or f"{t.name}_pkey"
    cols = ", ".join(f'"{c}"' for c in t.primary_key)
    return f'ALTER TABLE {t.qualified} ADD CONSTRAINT "{pk}" PRIMARY KEY ({cols});'


def drop_fk_sql(t: TargetTable, fk: ForeignKey) -> str:
    """`_base_copy.py:94-103`."""
    return f'ALTER TABLE {t.qualified} DROP CONSTRAINT IF EXISTS "{fk.name}";'


def create_fk_sql(t: TargetTable, fk: ForeignKey) -> str:
    """`_base_copy.py:105-114`."""
    return f'ALTER TABLE {t.qualified} ADD CONSTRAINT "{fk.name}" {fk.definition};'


def copy_sql(t: TargetTable) -> str:
    """`_base_copy.py:140-143` — explicit column list (the reference reads
    it from the CSV header; here it is explicit and the CSV carries no
    header)."""
    cols = ", ".join(f'"{c}"' for c in t.columns)
    return f"COPY {t.qualified} ({cols}) FROM STDIN WITH CSV"


def copy_freeze_sql(t: TargetTable) -> str:
    return copy_sql(t) + " FREEZE"


# ------------------------------------------------- pure CSV serialization

def csv_chunks(
    rows: Iterable, columns: Sequence[str], chunk_rows: int = 10**6
) -> Iterator[io.StringIO]:
    """Serialize an iterator of Spark Rows into bounded in-memory CSV
    buffers — the per-partition analog of the reference's ``df_generator`` +
    ``create_file_object`` (`utilities.py:76-116`): no intermediate files,
    NULL → empty field, no header.
    """
    buf: list = []
    for row in rows:
        buf.append(row)
        if len(buf) >= chunk_rows:
            yield _to_csv(buf, columns)
            buf = []
    if buf:
        yield _to_csv(buf, columns)


def _to_csv(rows: list, columns: Sequence[str]) -> io.StringIO:
    pdf = pd.DataFrame.from_records([tuple(r) for r in rows], columns=list(columns))
    out = io.StringIO()
    # na_rep="" → empty CSV field → SQL NULL (`utilities.py:90`)
    pdf.to_csv(out, index=False, header=False, na_rep="")
    out.seek(0)
    return out


class _ArrowCsvStream:
    """File-like view over an iterator of Arrow record batches, serialized
    to CSV on demand with pyarrow's C++ CSV writer — one streaming COPY per
    partition with bounded memory (one batch in flight). ``read`` is the
    only method COPY clients call (psycopg2 ``copy_expert`` and pgwire both
    pull with ``read(size)``). Nulls become empty fields (SQL NULL,
    `utilities.py:90`); timestamps print as ISO, which COPY parses.

    Measured at sf0.1 lineitem (600k rows × 11 cols): pandas ``to_csv``
    serializes at ~197k rows/s — slower than the Postgres server ingests
    (~448k rows/s single-connection) — while ``pyarrow.csv.write_csv``
    does ~1.7M rows/s, moving the bottleneck back to the server where it
    belongs."""

    def __init__(self, batch_iter: Iterator):
        self._iter = batch_iter
        self._buf = bytearray()
        self.rows = 0

    def read(self, size: int = -1) -> bytes:
        import pyarrow.csv as pcsv  # noqa: PLC0415

        while size < 0 or len(self._buf) < size:
            batch = next(self._iter, None)
            if batch is None:
                break
            self.rows += batch.num_rows
            sink = io.BytesIO()
            pcsv.write_csv(batch, sink, pcsv.WriteOptions(include_header=False))
            self._buf += sink.getvalue()
        if size < 0 or len(self._buf) <= size:
            out, self._buf = bytes(self._buf), bytearray()
        else:
            out, self._buf = bytes(self._buf[:size]), self._buf[size:]
        return out


# ------------------------------------------------------------ network paths

def _psycopg2():
    """The Postgres client: psycopg2 when installed, else the bundled
    pure-Python wire-protocol client (sinks/pgwire.py — same connect/
    cursor/copy_expert surface, trust auth only). The fallback is what
    lets this container run real end-to-end COPY integration tests with
    no client library installed."""
    try:
        import psycopg2  # noqa: PLC0415

        return psycopg2
    except ImportError:  # pragma: no cover - environment dependent
        from pandas_to_postgres_spark.sinks import pgwire  # noqa: PLC0415

        return pgwire


def reflect_target_table(conn_params: dict, schema: str, name: str) -> TargetTable:
    """Reflect columns/PK/FKs from information_schema + pg_catalog —
    the psycopg2 re-expression of the reference's SQLAlchemy
    ``MetaData.reflect()`` (`hdf_to_postgres.py:81-96`)."""
    psycopg2 = _psycopg2()
    with psycopg2.connect(**conn_params) as conn, conn.cursor() as cur:
        cur.execute(
            """SELECT column_name FROM information_schema.columns
               WHERE table_schema = %s AND table_name = %s
               ORDER BY ordinal_position""",
            (schema, name),
        )
        columns = [r[0] for r in cur.fetchall()]
        if not columns:
            # same contract as `hdf_to_postgres.py:94-96`
            raise ValueError(f"Table {schema}.{name} does not exist.")
        cur.execute(
            """SELECT c.conname, pg_get_constraintdef(c.oid), c.contype
               FROM pg_constraint c
               JOIN pg_class t ON c.conrelid = t.oid
               JOIN pg_namespace n ON t.relnamespace = n.oid
               WHERE n.nspname = %s AND t.relname = %s
                 AND c.contype IN ('p', 'f')""",
            (schema, name),
        )
        pk_name, pk_cols, fks = None, None, []
        for conname, condef, contype in cur.fetchall():
            if contype == "p":
                pk_name = conname
                inside = condef[condef.index("(") + 1 : condef.rindex(")")]
                pk_cols = [c.strip().strip('"') for c in inside.split(",")]
            else:
                fks.append(ForeignKey(name=conname, definition=condef))
    return TargetTable(
        schema=schema,
        name=name,
        columns=columns,
        primary_key=pk_cols,
        pk_name=pk_name,
        foreign_keys=tuple(fks),
    )


def parallel_copy(
    df: DataFrame,
    conn_params: dict,
    sql: Optional[str] = None,
    task_plan=None,
) -> int:
    """The parallel COPY data plane: one streaming ``COPY ... FROM STDIN``
    per Spark partition, rows travelling JVM→Python as Arrow record
    batches. Returns the total row count copied.

    ``sql`` is the COPY statement every task runs; alternatively
    ``task_plan(partition_id) -> (setup_sqls, copy_sql)`` lets each task
    run per-partition DDL and COPY into its own table IN ONE TRANSACTION
    (the exactly-once stager uses this — see
    :func:`load_batch_exactly_once`). Exactly one of the two must be
    given.

    Executor-side each task opens its own connection (the reference's
    "engine contains process specific stuff" rebuild, `hdf_to_postgres.py:
    58-61`, becomes per-task connections) and serializes via pyarrow's C++
    CSV writer (see :class:`_ArrowCsvStream`) — measured ~3x the
    row-iterator foreachPartition formulation end-to-end. Memory is
    bounded by the Arrow batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch)."""
    if (sql is None) == (task_plan is None):
        raise ValueError("pass exactly one of sql / task_plan")
    params = dict(conn_params)

    def _copy_batches(batches: Iterator) -> Iterator:
        import itertools  # noqa: PLC0415

        import pyarrow as pa  # noqa: PLC0415
        from pyspark import TaskContext  # noqa: PLC0415

        try:
            import psycopg2 as pg  # noqa: PLC0415
        except ImportError:
            from pandas_to_postgres_spark.sinks import pgwire as pg  # noqa: PLC0415

        first = next(batches, None)
        n = 0
        if first is not None:  # empty partition: never open a connection
            if task_plan is not None:
                pid = TaskContext.get().partitionId()
                setup_sqls, copy_stmt = task_plan(pid)
            else:
                setup_sqls, copy_stmt = [], sql
            stream = _ArrowCsvStream(itertools.chain([first], batches))
            conn = pg.connect(**params)
            try:
                # setup + COPY share one transaction: a retried or
                # speculative task attempt serializes on its DDL locks
                # and REPLACES its previous attempt's work
                with conn, conn.cursor() as cur:
                    for s in setup_sqls:
                        cur.execute(s)
                    cur.copy_expert(copy_stmt, stream)
            finally:
                conn.close()
            n = stream.rows
        yield pa.RecordBatch.from_pydict({"rows": pa.array([n], pa.int64())})

    out = df.mapInArrow(_copy_batches, "rows long").agg({"rows": "sum"}).collect()
    return int(out[0][0] or 0)


def append_to_postgres(
    df: DataFrame,
    conn_params: dict,
    target: TargetTable,
    num_partitions: Optional[int] = None,
) -> int:
    """Append-only parallel COPY: no TRUNCATE, no constraint bracket —
    the data plane for incremental/micro-batch loads where the table keeps
    serving reads while batches land. Returns rows copied."""
    cols = [c for c in target.columns if c in df.columns]
    df = df.select(*cols)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    load_target = TargetTable(schema=target.schema, name=target.name, columns=cols)
    return parallel_copy(df, conn_params, copy_sql(load_target))


def load_batch_exactly_once(
    batch_df: DataFrame,
    conn_params: dict,
    target: TargetTable,
    batch_id: int,
    epoch_table: str = "stream_epochs",
    num_partitions: Optional[int] = None,
    run_id: str = "",
) -> int:
    """Idempotent micro-batch load: stage → atomically publish + record the
    epoch. Structured Streaming re-delivers a failed micro-batch with the
    SAME ``batch_id``; this loader turns that at-least-once contract into
    exactly-once tables:

    1. replay check: if ``(table, batch_id)`` is already in the epoch
       ledger, the batch was fully published — skip (returns 0).
    2. stage: each Spark task COPYs its partition into its OWN stage
       table ``<target>__stage_<batch>_p<partition>``, and the task's
       DROP-IF-EXISTS + CREATE + COPY run in ONE transaction. This is
       what makes staging idempotent under Spark TASK retries and
       speculative execution: a re-run (or concurrent speculative)
       attempt of the same partition serializes on the DROP's table lock
       and replaces the previous attempt's table instead of appending to
       a shared stage — with a single shared stage table, a task that
       died after its COPY committed would double its partition.
    3. publish: ONE transaction moves every per-partition stage's rows
       into the target, inserts the ledger row, and drops the stages. A
       crash before commit leaves only orphan stage tables (replaced on
       replay); a crash after commit is caught by the replay check. The
       target never exposes a partial batch.

    ``run_id`` namespaces the ledger per STREAMING QUERY: a new query
    with a fresh checkpoint restarts batch_ids at 0, so without it the
    old run's ledger rows would match and silently drop every epoch.
    Pass a stable identity derived from the checkpoint location
    (`streaming/sink.stream_to_postgres_exactly_once` does this
    automatically); restarts of the SAME checkpoint must reuse it so
    replays are still recognized.

    Returns the number of rows published (0 on replay)."""
    psycopg2 = _psycopg2()
    ledger = f'"{target.schema}"."{epoch_table}"'
    stage_prefix = f"{target.name}__stage_{int(batch_id)}_p"

    ctl = psycopg2.connect(**conn_params)
    ctl.autocommit = True
    try:
        with ctl.cursor() as cur:
            _ensure_ledger(cur, ledger)
            cur.execute(
                f"SELECT 1 FROM {ledger} WHERE table_name = %s"
                f" AND run_id = %s AND batch_id = %s",
                (target.name, run_id, int(batch_id)),
            )
            if cur.fetchall():
                return 0  # replayed epoch: already published atomically
            # drop stage tables from prior crashed attempts OF THIS BATCH
            # ONLY: a retry may run with fewer partitions, and publish
            # discovers stages by prefix — a stale higher-numbered
            # partition table would otherwise be published alongside.
            # Other batches' stages are untouched: concurrent loaders for
            # other batch_ids of the same target must not lose in-flight
            # work. The regex (not just LIKE) keeps user tables that merely
            # share the naming shape (e.g. '<t>__stage_7_preview') safe.
            for st in _this_batch_stages(cur, target, stage_prefix):
                cur.execute(f'DROP TABLE "{target.schema}"."{st}"')
    finally:
        ctl.close()

    cols = [c for c in target.columns if c in batch_df.columns]
    df = batch_df.select(*cols)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    schema, tgt_qualified = target.schema, target.qualified
    col_list = ", ".join(f'"{c}"' for c in cols)

    def _task_plan(pid: int):
        stage_q = f'"{schema}"."{stage_prefix}{pid}"'
        return (
            [
                f"DROP TABLE IF EXISTS {stage_q}",
                f"CREATE TABLE {stage_q} (LIKE {tgt_qualified} INCLUDING DEFAULTS)",
            ],
            f"COPY {stage_q} ({col_list}) FROM STDIN WITH CSV",
        )

    n = parallel_copy(df, conn_params, task_plan=_task_plan)

    pub = psycopg2.connect(**conn_params)
    try:
        with pub, pub.cursor() as cur:  # ONE transaction: all-or-nothing
            stages = _this_batch_stages(cur, target, stage_prefix)
            for st in stages:
                cur.execute(
                    f'INSERT INTO {tgt_qualified} ({col_list}) '
                    f'SELECT {col_list} FROM "{target.schema}"."{st}"'
                )
            cur.execute(
                f"INSERT INTO {ledger} (table_name, run_id, batch_id, n_rows)"
                f" VALUES (%s, %s, %s, %s)",
                (target.name, run_id, int(batch_id), n),
            )
            for st in stages:
                cur.execute(f'DROP TABLE "{target.schema}"."{st}"')
    except Exception as e:
        if not _is_unique_violation(e):
            raise
        # A concurrent publisher won the ledger race for this
        # (table, run, batch): our transaction rolled back whole — the
        # target saw nothing — so this is a replay, not a failure
        # (crash-looping here was the ADVICE r6 ledger bug's symptom).
        # Clean this attempt's now-orphaned stages and report 0.
        cln = psycopg2.connect(**conn_params)
        cln.autocommit = True
        try:
            with cln.cursor() as cur:
                for st in _this_batch_stages(cur, target, stage_prefix):
                    cur.execute(f'DROP TABLE "{target.schema}"."{st}"')
        finally:
            cln.close()
        return 0
    finally:
        pub.close()
    return n


def _ensure_ledger(cur, ledger: str) -> None:
    """Create or MIGRATE the epoch ledger to the 3-column identity.

    Legacy-ledger migration (ADVICE r5 + r6): a ``stream_epochs`` table
    that predates ``run_id`` keeps its old shape through CREATE IF NOT
    EXISTS. Adding the column (old rows get ``''`` — exactly the run_id
    the legacy path used, so their replay protection carries over) is not
    enough: the legacy PRIMARY KEY is still (table_name, batch_id), so a
    NEW run — fresh checkpoint ⇒ new run_id, batch_ids restarting at 0 —
    passes the 3-column replay SELECT and then dies on the legacy PK at
    its ledger INSERT, crash-looping forever. The PK must migrate to
    (table_name, run_id, batch_id) in the same breath."""
    cur.execute(
        f"""CREATE TABLE IF NOT EXISTS {ledger} (
                table_name TEXT NOT NULL,
                run_id TEXT NOT NULL DEFAULT '',
                batch_id BIGINT NOT NULL,
                n_rows BIGINT NOT NULL,
                PRIMARY KEY (table_name, run_id, batch_id))"""
    )
    cur.execute(
        f"ALTER TABLE {ledger} ADD COLUMN IF NOT EXISTS"
        " run_id TEXT NOT NULL DEFAULT ''"
    )
    cur.execute(
        "SELECT c.conname, a.attname"
        " FROM pg_constraint c"
        " JOIN LATERAL unnest(c.conkey) AS k(attnum) ON TRUE"
        " JOIN pg_attribute a"
        "   ON a.attrelid = c.conrelid AND a.attnum = k.attnum"
        f" WHERE c.conrelid = '{ledger}'::regclass AND c.contype = 'p'"
    )
    rows = cur.fetchall()
    if rows and not any(r[1] == "run_id" for r in rows):
        conname = str(rows[0][0]).replace('"', '""')
        cur.execute(f'ALTER TABLE {ledger} DROP CONSTRAINT "{conname}"')
        cur.execute(
            f"ALTER TABLE {ledger}"
            " ADD PRIMARY KEY (table_name, run_id, batch_id)"
        )


def _is_unique_violation(exc: Exception) -> bool:
    """True for a PK/unique violation from either client (psycopg2 sets
    ``pgcode``; the pgwire fallback flattens SQLSTATE into the text)."""
    return getattr(exc, "pgcode", None) == "23505" or "23505" in str(exc)


def _this_batch_stages(cur, target: TargetTable, stage_prefix: str) -> list:
    """Stage tables of THIS batch only: prefix LIKE narrowed by an exact
    ``<prefix><digits>`` regex, so neither other batches' in-flight stages
    nor user tables that happen to share the prefix shape are touched."""
    import re  # noqa: PLC0415

    cur.execute(
        "SELECT tablename FROM pg_tables "
        "WHERE schemaname = %s AND tablename LIKE %s",
        (target.schema, stage_prefix.replace("_", r"\_") + "%"),
    )
    pat = re.compile(re.escape(stage_prefix) + r"\d+$")
    return sorted(r[0] for r in cur.fetchall() if pat.fullmatch(r[0]))


def staged_full_refresh(
    df: DataFrame, conn_params: dict, target: TargetTable
) -> int:
    """Task-retry-safe, ATOMIC full refresh: per-partition stage tables
    (the same idempotent DROP+CREATE+COPY-in-one-transaction trick as
    ``load_batch_exactly_once``), then ONE publish transaction that
    TRUNCATEs the target, inserts every stage, and drops the stages.

    Two upgrades over the direct TRUNCATE → parallel-COPY path:

    - a Spark TASK RETRY (or speculative attempt) REPLACES its
      partition's stage instead of appending into the target — the
      direct path double-loads a partition if a task dies after its COPY
      transaction committed but before reporting success to the driver
      (rare locally; a real failure mode across a 1000-executor run);
    - readers never observe the truncated-but-half-loaded table: old
      rows vanish and new rows appear in the same commit (TRUNCATE is
      transactional in Postgres).

    The trade: rows are written twice server-side (stage + publish) —
    the cost profile the exactly-once streaming sink already accepts.
    Returns the number of rows published.
    """
    psycopg2 = _psycopg2()
    stage_prefix = f"{target.name}__fullstage_p"
    cols = list(target.columns)
    schema, tgt_q = target.schema, target.qualified
    col_list = ", ".join(f'"{c}"' for c in cols)
    ctl = psycopg2.connect(**conn_params)
    ctl.autocommit = True
    try:
        with ctl.cursor() as cur:
            # stale stages from a crashed prior refresh: replaced anyway
            # per-partition, but a retry with FEWER partitions must not
            # publish a dead higher-numbered stage
            for st in _this_batch_stages(cur, target, stage_prefix):
                cur.execute(f'DROP TABLE "{schema}"."{st}"')
    finally:
        ctl.close()

    def _task_plan(pid: int):
        stage_q = f'"{schema}"."{stage_prefix}{pid}"'
        return (
            [
                f"DROP TABLE IF EXISTS {stage_q}",
                f"CREATE TABLE {stage_q} (LIKE {tgt_q} INCLUDING DEFAULTS)",
            ],
            f"COPY {stage_q} ({col_list}) FROM STDIN WITH CSV",
        )

    n = parallel_copy(df, conn_params, task_plan=_task_plan)
    pub = psycopg2.connect(**conn_params)
    try:
        with pub, pub.cursor() as cur:  # ONE txn: all-or-nothing swap
            stages = _this_batch_stages(cur, target, stage_prefix)
            cur.execute(truncate_sql(target))
            for st in stages:
                cur.execute(
                    f"INSERT INTO {tgt_q} ({col_list}) "
                    f'SELECT {col_list} FROM "{schema}"."{st}"'
                )
            for st in stages:
                cur.execute(f'DROP TABLE "{schema}"."{st}"')
    finally:
        pub.close()
    return n


def copy_to_postgres(
    df: DataFrame,
    conn_params: dict,
    target: TargetTable,
    csv_chunk_rows: int = 10**6,
    num_partitions: Optional[int] = None,
    freeze: bool = False,
    maintenance_work_mem: Optional[str] = None,
    analyze: bool = True,
    staged: bool = False,
) -> None:
    """Full-refresh bulk load: constraint drop → TRUNCATE → parallel
    per-partition COPY → constraint recreate → ANALYZE.

    The end-to-end shape of ``BaseCopy.copy()``
    (`copy_hdf.py:55-80`) with the chunk loop replaced by Spark partitions.

    ``staged=True`` routes the data plane through
    :func:`staged_full_refresh` — task-retry-safe and atomic for readers
    at the cost of a second server-side write; the default direct path
    keeps the reference's TRUNCATE-then-COPY semantics and single write.
    """
    psycopg2 = _psycopg2()
    cols = [c for c in target.columns if c in df.columns]
    df = df.select(*cols)
    load_target = TargetTable(
        schema=target.schema,
        name=target.name,
        columns=cols,
        primary_key=target.primary_key,
        pk_name=target.pk_name,
        foreign_keys=target.foreign_keys,
    )
    if num_partitions is not None:
        df = df.repartition(num_partitions)

    ddl = psycopg2.connect(**conn_params)
    ddl.autocommit = True
    with ddl.cursor() as cur:
        if maintenance_work_mem:
            cur.execute(f"SET maintenance_work_mem TO '{maintenance_work_mem}';")
        for fk in load_target.foreign_keys:
            cur.execute(drop_fk_sql(load_target, fk))
        if load_target.primary_key:
            cur.execute(drop_pk_sql(load_target))

    if freeze:
        # single transaction: TRUNCATE + COPY FREEZE (reference semantics,
        # `copy_hdf.py:70-71`) — single writer by construction
        sql = copy_freeze_sql(load_target)
        rows = df.coalesce(1).toLocalIterator()
        with psycopg2.connect(**conn_params) as conn, conn.cursor() as cur:
            cur.execute(truncate_sql(load_target))
            for chunk in csv_chunks(rows, cols, csv_chunk_rows):
                cur.copy_expert(sql, chunk)
    elif staged:
        staged_full_refresh(df, conn_params, load_target)
    else:
        with ddl.cursor() as cur:
            cur.execute(truncate_sql(load_target))
        parallel_copy(df, conn_params, copy_sql(load_target))

    with ddl.cursor() as cur:
        if load_target.primary_key:
            cur.execute(create_pk_sql(load_target))
        for fk in load_target.foreign_keys:
            cur.execute(create_fk_sql(load_target, fk))
        if analyze:
            cur.execute(analyze_sql(load_target))
    ddl.close()


def upsert_to_postgres(
    df: DataFrame,
    conn_params: dict,
    target: TargetTable,
    key_cols: Sequence[str],
    num_partitions: Optional[int] = None,
) -> int:
    """Incremental MERGE (SCD1 upsert) into Postgres: stage the batch via
    the parallel COPY data plane, then ONE transaction applies
    ``INSERT ... SELECT ... ON CONFLICT (keys) DO UPDATE`` and drops the
    stage — new keys insert, existing keys take the batch's values, and
    readers never see a half-applied batch.

    The reference only full-refreshes (TRUNCATE + COPY); this is the
    incremental twin a CDC pipeline needs (`operators/cdc.upsert` is the
    Spark-side equivalent for parquet-held state). The target must carry a
    unique constraint/index on ``key_cols`` (ON CONFLICT's arbiter).
    Duplicate keys WITHIN the batch would make ON CONFLICT fire twice in
    one command (a Postgres error), so the stage is deduplicated to the
    last row per key by ctid order — pre-deduplicate upstream with
    `operators/cdc.upsert` semantics when "last" must mean event order.

    Scale: the data plane is the same N-writer COPY as every other load;
    the merge itself is one set-based SQL statement on the server.
    Returns the number of batch rows applied."""
    cols = [c for c in target.columns if c in df.columns]
    df = df.select(*cols)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    psycopg2 = _psycopg2()
    stage = TargetTable(
        schema=target.schema, name=f"{target.name}__upsert_stage", columns=cols
    )
    ctl = psycopg2.connect(**conn_params)
    ctl.autocommit = True
    try:
        with ctl.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {stage.qualified}")
            cur.execute(
                f"CREATE TABLE {stage.qualified} "
                f"(LIKE {target.qualified} INCLUDING DEFAULTS)"
            )
    finally:
        ctl.close()

    n = parallel_copy(df, conn_params, copy_sql(stage))

    col_list = ", ".join(f'"{c}"' for c in cols)
    keys = ", ".join(f'"{c}"' for c in key_cols)
    sets = ", ".join(
        f'"{c}" = EXCLUDED."{c}"' for c in cols if c not in key_cols
    )
    key_eq = " AND ".join(f's."{c}" = d."{c}"' for c in key_cols)
    pub = psycopg2.connect(**conn_params)
    try:
        with pub, pub.cursor() as cur:  # ONE transaction
            cur.execute(
                # last physical row per key wins within the batch
                f"DELETE FROM {stage.qualified} s WHERE EXISTS ("
                f"SELECT 1 FROM {stage.qualified} d "
                f"WHERE {key_eq} AND d.ctid > s.ctid)"
            )
            cur.execute(
                f"INSERT INTO {target.qualified} ({col_list}) "
                f"SELECT {col_list} FROM {stage.qualified} "
                f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
            )
            cur.execute(f"DROP TABLE {stage.qualified}")
    finally:
        pub.close()
    return n


def apply_changes_to_postgres(
    df: DataFrame,
    conn_params: dict,
    target: TargetTable,
    key_cols: Sequence[str],
    op_col: str = "op",
    seq_col: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> int:
    """Apply a CDC change feed (insert/update/delete) to Postgres in ONE
    atomic publish — the sink-side completion of `operators/cdc`: rows
    carry ``op_col`` ∈ {'I','U','D'} (case-insensitive) plus the data
    columns; the batch stages through the same parallel COPY data plane
    as every loader here, is collapsed to the LAST change per key
    (ordered by ``seq_col`` when given — event order — else physical
    arrival), and one transaction then DELETEs keys whose final op is D
    and upserts the rest via ``INSERT ... ON CONFLICT DO UPDATE``.
    Readers never observe a half-applied feed; a retried publish is
    idempotent because the stage is recreated per call.

    The reference can only TRUNCATE + reload; `upsert_to_postgres` added
    keyed SCD1 merges; this adds the delete half, which no COPY/refresh
    path can express. Target must carry a unique constraint/index on
    ``key_cols`` (the ON CONFLICT arbiter).

    Scale: data plane = N-writer COPY (unchanged); the collapse and both
    apply statements are set-based server-side SQL over the stage —
    bounded by batch size, never by target size. Returns the staged row
    count (pre-collapse)."""
    # op_col / seq_col may themselves be target columns (CDC feeds
    # commonly persist the sequence in the target): reuse the target's
    # column in the stage — and persist its value — instead of appending
    # a duplicate NULL column, which would make the stage DDL fail with
    # 'column specified more than once'.
    data_cols = [c for c in target.columns if c in df.columns]
    extras = [
        (c, typ)
        for c, typ in ([(op_col, "text")] if op_col else [])
        + ([(seq_col, "bigint")] if seq_col else [])
        if c not in data_cols
    ]
    sel = data_cols + [c for c, _ in extras]
    df = df.select(*sel)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    psycopg2 = _psycopg2()
    stage = TargetTable(
        schema=target.schema, name=f"{target.name}__cdc_stage", columns=sel
    )
    ctl = psycopg2.connect(**conn_params)
    ctl.autocommit = True
    try:
        with ctl.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {stage.qualified}")
            # stage = target's column types + op (text) + optional seq
            # (appended only when NOT already target columns): COPY names
            # its columns explicitly, so extra target columns simply stay
            # NULL in the stage and are never read back
            cur.execute(
                f"CREATE TABLE {stage.qualified} AS SELECT *"
                + "".join(
                    f', NULL::{typ} AS "{c}"' for c, typ in extras
                )
                + f" FROM {target.qualified} WITH NO DATA"
            )
    finally:
        ctl.close()

    n = parallel_copy(df, conn_params, copy_sql(stage))

    keys = ", ".join(f'"{c}"' for c in key_cols)
    key_eq = " AND ".join(f's."{c}" = d."{c}"' for c in key_cols)
    order = f'd."{seq_col}" > s."{seq_col}"' if seq_col else "d.ctid > s.ctid"
    tie = (
        f' OR (d."{seq_col}" = s."{seq_col}" AND d.ctid > s.ctid)'
        if seq_col
        else ""
    )
    col_list = ", ".join(f'"{c}"' for c in data_cols)
    sets = ", ".join(
        f'"{c}" = EXCLUDED."{c}"' for c in data_cols if c not in key_cols
    )
    tkey_eq = " AND ".join(f't."{c}" = s."{c}"' for c in key_cols)
    pub = psycopg2.connect(**conn_params)
    try:
        with pub, pub.cursor() as cur:  # ONE transaction: atomic apply
            cur.execute(
                f"DELETE FROM {stage.qualified} s WHERE EXISTS ("
                f"SELECT 1 FROM {stage.qualified} d "
                f"WHERE {key_eq} AND ({order}{tie}))"
            )
            cur.execute(
                f"DELETE FROM {target.qualified} t WHERE EXISTS ("
                f"SELECT 1 FROM {stage.qualified} s "
                f"WHERE {tkey_eq} AND upper(s.\"{op_col}\") = 'D')"
            )
            cur.execute(
                f"INSERT INTO {target.qualified} ({col_list}) "
                f"SELECT {col_list} FROM {stage.qualified} "
                f"WHERE upper(\"{op_col}\") <> 'D' "
                f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
            )
            cur.execute(f"DROP TABLE {stage.qualified}")
    finally:
        pub.close()
    return n
