"""Pure-logic unit tests (no SparkSession): SQL builders, CSV
serialization, range planning, routing — the testable cores of the sink,
HDF source, and orchestration."""

import io

import pytest

from pandas_to_postgres_spark.orchestration import resolve_routing
from pandas_to_postgres_spark.sinks.postgres_copy import (
    ForeignKey,
    TargetTable,
    analyze_sql,
    copy_freeze_sql,
    copy_sql,
    create_fk_sql,
    create_pk_sql,
    csv_chunks,
    drop_fk_sql,
    drop_pk_sql,
    truncate_sql,
)
from pandas_to_postgres_spark.sources.hdf import plan_ranges

T = TargetTable(
    schema="public",
    name="orders",
    columns=("o_orderkey", "o_custkey"),
    primary_key=("o_orderkey",),
    pk_name="orders_pkey",
    foreign_keys=(
        ForeignKey("orders_cust_fk", "FOREIGN KEY (o_custkey) REFERENCES customer(c_custkey)"),
    ),
)


class TestSqlBuilders:
    def test_truncate(self):
        assert truncate_sql(T) == 'TRUNCATE TABLE "public"."orders";'

    def test_analyze(self):
        assert analyze_sql(T) == 'ANALYZE "public"."orders";'

    def test_pk_roundtrip(self):
        assert (
            drop_pk_sql(T)
            == 'ALTER TABLE "public"."orders" DROP CONSTRAINT IF EXISTS "orders_pkey" CASCADE;'
        )
        assert (
            create_pk_sql(T)
            == 'ALTER TABLE "public"."orders" ADD CONSTRAINT "orders_pkey" PRIMARY KEY ("o_orderkey");'
        )

    def test_pk_required(self):
        no_pk = TargetTable("public", "t", ("a",))
        with pytest.raises(ValueError):
            create_pk_sql(no_pk)

    def test_fk_roundtrip(self):
        fk = T.foreign_keys[0]
        assert "DROP CONSTRAINT IF EXISTS" in drop_fk_sql(T, fk)
        assert create_fk_sql(T, fk).endswith(
            'ADD CONSTRAINT "orders_cust_fk" FOREIGN KEY (o_custkey) REFERENCES customer(c_custkey);'
        )

    def test_copy_column_list(self):
        assert (
            copy_sql(T)
            == 'COPY "public"."orders" ("o_orderkey", "o_custkey") FROM STDIN WITH CSV'
        )
        assert copy_freeze_sql(T).endswith("FREEZE")


class TestCsvChunks:
    def test_null_becomes_empty_field(self):
        # the cast_pandas obligation: NULL → empty CSV field → SQL NULL
        chunks = list(csv_chunks([(1, None), (2, "x")], ["a", "b"]))
        assert len(chunks) == 1
        assert chunks[0].getvalue() == "1,\n2,x\n"

    def test_chunk_boundaries(self):
        # reference `df_generator`: exact multiples → no trailing empty chunk
        rows = [(i,) for i in range(20)]
        chunks = list(csv_chunks(rows, ["a"], chunk_rows=10))
        assert len(chunks) == 2
        assert all(c.getvalue().count("\n") == 10 for c in chunks)

    def test_empty_input_yields_nothing(self):
        assert list(csv_chunks([], ["a"], chunk_rows=10)) == []

    def test_no_header(self):
        (chunk,) = csv_chunks([(1, 2)], ["a", "b"])
        assert isinstance(chunk, io.StringIO)
        assert "a" not in chunk.getvalue()


class TestPlanRanges:
    def test_exact_multiple_no_trailing_empty(self):
        assert plan_ranges(20, 10) == [(0, 10), (10, 20)]

    def test_remainder(self):
        assert plan_ranges(25, 10) == [(0, 10), (10, 20), (20, 25)]

    def test_empty_input_is_one_empty_range(self):
        # `utilities.py:107-108`: empty input is valid, one empty chunk
        assert plan_ranges(0, 10) == [(0, 0)]

    def test_single_row(self):
        assert plan_ranges(1, 10) == [(0, 1)]

    def test_bad_chunk(self):
        with pytest.raises(ValueError):
            plan_ranges(10, 0)


class TestRouting:
    def test_catalog_only(self):
        r = resolve_routing({"t1": {"/a", "/b"}, "t2": {"/c"}})
        assert r == {"t1": {"/a", "/b"}, "t2": {"/c"}}

    def test_keys_filter(self):
        r = resolve_routing({"t1": {"/a", "/b"}, "t2": {"/c"}}, keys=["/a"])
        assert r == {"t1": {"/a"}}

    def test_unknown_key_maps_to_itself_not_charset(self):
        # the reference's `set(x)` bug (`hdf_to_postgres.py:161`) would
        # yield the *characters* of the key; fixed behavior maps the key
        r = resolve_routing({}, keys=["/mytable"])
        assert r == {"mytable": {"/mytable"}}

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            resolve_routing({}, keys=[])


class TestReferenceUtilityParity:
    """Same-name drop-ins for the reference's pandas utilities
    (`/root/reference/pandas_to_postgres/utilities.py:76-167`)."""

    def test_cast_pandas_int_bool_nulls(self):
        import numpy as np
        import pandas as pd

        from pandas_to_postgres_spark import cast_pandas

        class Col:
            def __init__(self, name, t):
                self.name, self.type = name, t

        df = pd.DataFrame({"i": [1.0, np.nan], "b": [0.0, np.nan]})
        out = cast_pandas(df, columns=[Col("i", "BIGINT"), Col("b", "BOOLEAN")])
        assert str(out["i"].dtype) == "Int64"
        assert out["i"].iloc[1] is pd.NA
        assert out["b"].tolist() == [False, None]

    def test_cast_pandas_missing_column_skipped(self):
        import pandas as pd

        from pandas_to_postgres_spark import cast_pandas

        class Col:
            def __init__(self, name, t):
                self.name, self.type = name, t

        df = pd.DataFrame({"x": [1]})
        out = cast_pandas(df, columns=[Col("nope", "INTEGER")])
        assert out["x"].tolist() == [1]

    def test_df_generator_chunks_and_empty(self):
        import pandas as pd

        from pandas_to_postgres_spark import df_generator

        chunks = list(df_generator(pd.DataFrame({"x": range(5)}), chunksize=2))
        assert [len(c) for c in chunks] == [2, 2, 1]
        empties = list(df_generator(pd.DataFrame({"x": []}), chunksize=2))
        assert len(empties) == 1 and len(empties[0]) == 0  # empty input valid

    def test_create_file_object_header_and_nulls(self):
        import numpy as np
        import pandas as pd

        from pandas_to_postgres_spark import create_file_object

        fo = create_file_object(pd.DataFrame({"a": [1.0, np.nan], "s": ["x", "y"]}))
        lines = fo.read().splitlines()
        assert lines[0] == "a,s"          # header row = COPY column list
        assert lines[2].startswith(",")   # NaN → empty field → SQL NULL

    def test_copy_worker_invokes_copy(self):
        from pandas_to_postgres_spark import copy_worker

        class FakeCopy:
            rows = 0

            def copy(self):
                self.rows = 7

        assert copy_worker(FakeCopy()) == 7


class TestFormatterKwargs:
    """The reference hook contract `f(df, copy_obj=self, **kwargs)`
    (`_base_copy.py:152-156`) with per-table metadata constants injected on
    the HDF path (`copy_hdf.py:44-46,105`)."""

    def test_df_only_formatter_unchanged(self):
        from pandas_to_postgres_spark.functions.normalize import apply_formatters

        seen = []
        out = apply_formatters("df0", [lambda df: (seen.append(df), "df1")[1]],
                               hdf_table="/t1", levels=3)
        assert out == "df1" and seen == ["df0"]

    def test_kwargs_formatter_receives_constants(self):
        from pandas_to_postgres_spark.functions.normalize import apply_formatters

        got = {}

        def hook(df, **kwargs):
            got.update(kwargs)
            return df

        apply_formatters("df0", [hook], copy_obj="CO", hdf_table="/t1", levels=3)
        assert got == {"copy_obj": "CO", "hdf_table": "/t1", "levels": 3}

    def test_named_param_formatter_gets_only_its_params(self):
        from pandas_to_postgres_spark.functions.normalize import apply_formatters

        got = {}

        def hook(df, levels=None):
            got["levels"] = levels
            return df

        apply_formatters("df0", [hook], hdf_table="/t1", levels=3)
        assert got == {"levels": 3}

    def test_hdf_copy_threads_per_key_metadata(self, monkeypatch):
        """A metadata-driven formatter sees its OWN key's constant for each
        of the keys feeding one SQL table (the reference's one:many routing)."""
        import pandas_to_postgres_spark.compat as compat
        from pandas_to_postgres_spark.compat import HDFTableCopy

        class FakeDF:
            def __init__(self, tag):
                self.tag = tag

            def unionByName(self, other):
                return FakeDF(self.tag + "+" + other.tag)

            def count(self):
                return 1

        monkeypatch.setattr(
            compat, "load_hdf_small", lambda spark, f, k: FakeDF(k)
        )
        seen = []

        def hook(df, hdf_table=None, levels=None, **kwargs):
            seen.append((df.tag, hdf_table, levels))
            return df

        sunk = []
        c = HDFTableCopy(
            "f.h5", ["/a", "/b"], spark=None,
            sink=lambda name, df: sunk.append((name, df.tag)),
            table_name="t", formatters=[hook],
            metadata_vars={"levels": {"/a": 2, "/b": 5}},
        )
        c.copy()
        assert seen == [("/a", "/a", 2), ("/b", "/b", 5)]
        assert sunk == [("t", "/a+/b")]
        assert c.rows == 1


class TestResyncAndFrameSampling:
    def test_resync_skips_stuffed_ff00_before_rst(self):
        """An encoder that byte-aligns with 1-bits emits a stuffed
        FF 00 pad immediately before the RST marker; _resync must skip
        it (and FF fill-byte runs) and consume the marker, not stop at
        the stuffed FF and feed the marker bytes back as entropy data."""
        from pandas_to_postgres_spark.operators.jpeg_codec import (
            BitReader,
            _resync,
        )

        # stuffed pad -> RST0 -> payload
        rd = BitReader(b"\xff\x00\xff\xd0\xab")
        assert _resync(rd, 3) == [0, 0, 0]
        assert rd.pos == 4 and rd.nbits == 0

        # fill-byte run folded into the marker (T.81 B.1.1.2)
        rd = BitReader(b"\x12\xff\xff\xff\xd1\xcd")
        _resync(rd, 0)
        assert rd.pos == 5

        # non-RST marker: left unconsumed for the caller
        rd = BitReader(b"\xff\x00\xff\xd9")
        _resync(rd, 0)
        assert rd.pos == 2 and rd.data[rd.pos : rd.pos + 2] == b"\xff\xd9"

    def test_video_sample_indices_bounded_for_every_count(self):
        from pandas_to_postgres_spark.operators.media_codecs import (
            sample_indices,
        )

        for n in range(0, 64):
            idx = list(sample_indices(n))
            assert len(idx) <= 4, n
            assert all(0 <= i < n for i in idx)
            if n:
                assert idx[0] == 0  # always include the first frame
        assert list(sample_indices(5)) == [0, 2, 4]  # was 5 decodes
        assert list(sample_indices(7)) == [0, 2, 4, 6]
        assert list(sample_indices(8)) == [0, 2, 4, 6]
        assert list(sample_indices(100)) == [0, 25, 50, 75]


class TestBpeMergeSemantics:
    """Hand-computed golden vocabulary for the BPE merge loop.

    The registered queries' DuckDB oracles replay the SAME relational
    merge logic, so an oracle match cannot catch a semantics bug shared
    by both sides. This pins the Sennrich conventions independently:
    non-greedy pair COUNTING ('aaaa' contributes 3 to (a,a)), greedy
    LEFT-TO-RIGHT non-overlapping MERGING ('aaaa' -> aa|aa, 'aaa' ->
    aa|a), (count DESC, left, right) binary-collation tie-breaks, and
    merged symbols feeding later iterations."""

    def test_hand_computed_merges_and_final_syms(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.plans.llm import _bpe_merge_loop

        words = spark.createDataFrame(
            [("aaaa", 3), ("ab", 5)], "word string, freq long"
        )
        merges, syms = _bpe_merge_loop(words, n_iter=4)
        got = [
            tuple(r)
            for r in merges.orderBy("iteration")
            .select("iteration", "left_sym", "right_sym", "pair_freq")
            .collect()
        ]
        # iter 1: (a,a) = 3 occurrences/word * freq 3 = 9 (non-greedy
        #         count) beats (a,b)=5 and (b,</w>)=5
        # iter 2: 'aaaa' is now aa|aa|</w> so (aa,aa)=3; the cnt-5 tie
        #         (a,b) vs (b,</w>) breaks on left: 'a' < 'b'
        # iter 3: 'ab' is now ab|</w>; (ab,</w>)=5 is the max
        # iter 4: cnt-3 tie (aa,aa) vs (aa,</w>) breaks on right:
        #         '</w>' < 'aa' in binary collation ('<' = 0x3C < 'a')
        assert got == [
            (1, "a", "a", 9),
            (2, "a", "b", 5),
            (3, "ab", "</w>", 5),
            (4, "aa", "</w>", 3),
        ]
        final = {
            r["word"]: r["toks"]
            for r in syms.groupBy("word")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "sym"))).alias("s"))
            .select("word", F.col("s.sym").alias("toks"))
            .collect()
        }
        assert final == {"aaaa": ["aa", "aa</w>"], "ab": ["ab</w>"]}

    def test_odd_run_merges_left_to_right(self, spark):
        from pandas_to_postgres_spark.plans.llm import _bpe_merge_loop

        words = spark.createDataFrame([("aaa", 1)], "word string, freq long")
        _, syms = _bpe_merge_loop(words, n_iter=1)
        toks = [
            r["sym"] for r in syms.orderBy("pos").collect()
        ]
        # greedy left-to-right: aa|a|</w>, never a|aa|</w>
        assert toks == ["aa", "a", "</w>"]


class TestAdpcmIma:
    """IMA ADPCM (WAV 0x11): golden nibble steps hand-computed from the
    spec's reference decoder, round-trip SNR, and container parsing."""

    def test_golden_nibble_steps(self):
        from pandas_to_postgres_spark.operators.media_codecs import (
            _ima_decode_nibble,
        )

        # step ladder index 0 -> step=7: nib 0b0111 adds 0+1+3+7=11
        assert _ima_decode_nibble(0b0111, 0, 0) == (11, 8)
        # index 10 -> step=19: nib 0b1111 subtracts 2+4+9+19=34
        assert _ima_decode_nibble(0b1111, 100, 10) == (66, 18)
        # index adjustment clamps at [0, 88]
        assert _ima_decode_nibble(0b0000, 0, 0)[1] == 0
        assert _ima_decode_nibble(0b0111, 0, 88)[1] == 88
        # predictor clamps at int16 bounds
        p, _ = _ima_decode_nibble(0b0111, 32760, 88)
        assert p == 32767

    def test_round_trip_snr_and_ratio(self):
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_adpcm_ima,
            encode_adpcm_ima,
        )

        t = np.arange(8000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        wav = encode_adpcm_ima(x, 8000)
        y, rate = decode_adpcm_ima(wav)
        assert rate == 8000 and len(y) == len(x)
        err = np.sqrt(np.mean((x - y) ** 2))
        snr = 20 * np.log10(np.sqrt(np.mean(x**2)) / err)
        assert snr > 20, f"IMA ADPCM sine SNR too low: {snr:.1f} dB"
        # 4 bits/sample vs 16-bit PCM: ~4:1 plus headers
        assert len(wav) < 0.30 * (len(x) * 2)

    def test_container_fields_and_gates(self):
        import struct

        import numpy as np
        import pytest

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_adpcm_ima,
            encode_adpcm_ima,
        )

        wav = encode_adpcm_ima(np.zeros(100), rate=16000)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        i = wav.index(b"fmt ")
        tag, ch, rate = struct.unpack_from("<HHI", wav, i + 8)
        assert (tag, ch, rate) == (0x11, 1, 16000)
        y, r = decode_adpcm_ima(wav)
        assert r == 16000 and len(y) == 100
        assert float(np.abs(y).max()) == 0.0
        with pytest.raises(ValueError):
            decode_adpcm_ima(b"nope")

    def test_featurize_real_dispatches_adpcm(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            encode_adpcm_ima,
            extract_features_real,
        )

        t = np.arange(4000) / 8000.0
        payload = encode_adpcm_ima(np.sin(2 * np.pi * 220 * t), 8000)
        df = spark.createDataFrame(
            [(1, bytearray(payload), "audio/adpcm")],
            "doc_id long, payload binary, mime string",
        )
        row = extract_features_real(df).first()
        assert row["mime"] == "audio/adpcm"
        assert abs(row["feature"][0] - 0.5) < 0.01  # duration s
        assert 0.6 < row["feature"][1] < 0.8  # sine RMS ~ 0.707


class TestStreamWidth:
    """r10/r11: the scale-adaptive microbatch widening for file-stream
    drains (streaming/events.py::_stream_width) — widen only when the
    source has fewer files than the pool AND carries enough rows (parquet
    footer metadata) that the extra tasks at least double the file-granted
    parallelism; never at multi-file scale, never on a tiny batch."""

    @staticmethod
    def _write_pq(path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"x": list(range(rows))}), str(path))

    def test_large_single_file_widens_by_volume(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        f = tmp_path / "events.parquet"
        self._write_pq(f, 5000)
        # 5000 rows / 1000-row target = 5 tasks >= 2x the 1 file
        assert _stream_width(spark, str(f), target_rows=1000) == min(
            spark.sparkContext.defaultParallelism, 5
        )

    def test_tiny_single_file_stays_narrow(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        f = tmp_path / "events.parquet"
        self._write_pq(f, 100)
        # 100 rows / 1000-row target -> width 1 < 2x files: no exchange
        assert _stream_width(spark, str(f), target_rows=1000) == 0

    def test_marginal_gain_stays_narrow(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        d = tmp_path / "events.parquet"
        d.mkdir()
        for i in range(4):
            self._write_pq(d / f"part-{i:05d}.parquet", 1500)
        # 6000 rows / 1000 = 6 tasks < 2x the 4 files: not worth a shuffle
        assert _stream_width(spark, str(d), target_rows=1000) == 0

    def test_unreadable_footers_fall_back_to_pool(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        f = tmp_path / "events.parquet"
        f.write_bytes(b"x")  # not parquet: no volume signal -> r10 gate
        assert (
            _stream_width(spark, str(f))
            == spark.sparkContext.defaultParallelism
        )

    def test_pool_width_files_disable_the_repartition(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        d = tmp_path / "events.parquet"
        d.mkdir()
        for i in range(spark.sparkContext.defaultParallelism):
            (d / f"part-{i:05d}.parquet").write_bytes(b"x")
        assert _stream_width(spark, str(d)) == 0

    def test_missing_path_is_a_noop(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import _stream_width

        assert _stream_width(spark, str(tmp_path / "nope.parquet")) == 0

    def test_nonpositive_target_disables_widening(self, spark, tmp_path):
        # stream-stream join opt-out: its first operator is the stateful
        # join exchange, so a pre-shuffle widening is pure cost
        from pandas_to_postgres_spark.streaming.events import _stream_width

        f = tmp_path / "events.parquet"
        self._write_pq(f, 5000)
        assert _stream_width(spark, str(f), target_rows=0) == 0


class TestScaledStatePartitions:
    """r11: stateful drains scale their state-store partition count
    (pinned from spark.sql.shuffle.partitions at query start) to the
    batch volume — min(conf, ceil(rows/target)) — and restore the conf;
    no-op when the volume is unknown or already fills the conf width."""

    def test_small_source_narrows_and_restores(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pandas_to_postgres_spark.streaming.events import (
            _scaled_state_partitions,
        )

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table({"x": list(range(1000))}), str(sf / "events.parquet")
        )
        before = spark.conf.get("spark.sql.shuffle.partitions")
        with _scaled_state_partitions(spark, str(sf)):
            # 1000 rows / 16384 target -> 1 state partition
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before

    def test_large_source_is_a_noop(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pandas_to_postgres_spark.streaming.events import (
            _scaled_state_partitions,
        )

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table({"x": list(range(100))}), str(sf / "events.parquet")
        )
        before = spark.conf.get("spark.sql.shuffle.partitions")
        # a 1-row/partition target would need >= conf partitions: no-op
        spark.conf.set("spark.graft.stream.targetRowsPerStatePartition", "1")
        try:
            with _scaled_state_partitions(spark, str(sf)):
                assert (
                    spark.conf.get("spark.sql.shuffle.partitions") == before
                )
        finally:
            spark.conf.unset("spark.graft.stream.targetRowsPerStatePartition")

    def test_missing_source_is_a_noop(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.events import (
            _scaled_state_partitions,
        )

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with _scaled_state_partitions(spark, str(tmp_path / "nope")):
            assert spark.conf.get("spark.sql.shuffle.partitions") == before
