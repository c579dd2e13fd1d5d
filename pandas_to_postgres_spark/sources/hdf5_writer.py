"""Minimal pure-Python HDF5 *writer* for PyTables-style frame tables.

Purpose: (a) generate the on-disk fixtures that prove the pure-Python
reader (`sources/hdf5_reader`) against real HDF5 byte layouts in an
environment with no PyTables/h5py, and (b) give `to_hdf`-less users an
export path for modest frames. It emits the same structural dialect
``pandas.DataFrame.to_hdf(format="table", data_columns=True)`` produces
through libhdf5 — the layout the reference ingests
(`/root/reference/pandas_to_postgres/copy_hdf.py`):

- superblock v0, 8-byte offsets/lengths
- old-style groups (local heap + B-tree v1 + SNOD symbol nodes)
- one ``table`` dataset per key: rank-1 COMPOUND records
  (``index`` + one field per column), chunked layout v3 indexed by a
  B-tree v1, optional shuffle+deflate filter pipeline
- v1 object headers and v1 attribute messages, including PyTables'
  pickled-attribute convention (``non_index_axes`` etc.)

Column dtypes supported: int64/int32, float64/float32, bool (stored as
uint8 + ``<col>_dtype`` attr, PyTables-style), str/object (fixed-size
UTF-8 bytes). Everything here follows the public HDF5 File Format
Specification; no HDF library is involved.
"""

from __future__ import annotations

import pickle
import struct
from typing import Dict, Optional, Tuple
import zlib

import numpy as np
import pandas as pd

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"
_SUPERBLOCK_SIZE = 96  # v0 with 8/8 offset/length sizes


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# ------------------------------------------------------------ datatypes

def _dt_int(size: int, signed: bool = True) -> bytes:
    head = struct.pack(
        "<B3sI", 0x10, (b"\x08" if signed else b"\x00") + b"\x00\x00", size
    )
    return head + struct.pack("<HH", 0, size * 8)


_FLOAT_PROPS = {
    8: (0, 64, 52, 11, 0, 52, 1023, 63),
    4: (0, 32, 23, 8, 0, 23, 127, 31),
}


def _dt_float(size: int) -> bytes:
    off, prec, eloc, esz, mloc, msz, bias, sign = _FLOAT_PROPS[size]
    bits = bytes([0x20, sign, 0])  # LE, implied-msb mantissa norm, sign pos
    return struct.pack("<B3sI", 0x11, bits, size) + struct.pack(
        "<HHBBBBI", off, prec, eloc, esz, mloc, msz, bias
    )


def _dt_string(size: int) -> bytes:
    return struct.pack("<B3sI", 0x13, b"\x00\x00\x00", size)


def _member_dt(np_dt: np.dtype) -> bytes:
    if np_dt.kind == "i":
        return _dt_int(np_dt.itemsize, True)
    if np_dt.kind == "u":
        return _dt_int(np_dt.itemsize, False)
    if np_dt.kind == "f":
        return _dt_float(np_dt.itemsize)
    if np_dt.kind == "S":
        return _dt_string(np_dt.itemsize)
    raise TypeError(f"unsupported member dtype {np_dt}")


def _dt_compound(dtype: np.dtype) -> bytes:
    """Compound datatype message body, v1 members (the libhdf5-earliest
    encoding PyTables files carry)."""
    members = b""
    for name in dtype.names:
        sub, offset = dtype.fields[name]
        shape: Tuple[int, ...] = ()
        if sub.subdtype is not None:
            sub, shape = sub.subdtype
        dims = list(shape) + [0] * (4 - len(shape))
        members += (
            _pad8(name.encode("utf-8") + b"\x00")
            + struct.pack("<IB3xI4x4I", offset, len(shape), 0, *dims)
            + _member_dt(sub)
        )
    n = len(dtype.names)
    return struct.pack("<B3sI", 0x16, struct.pack("<I", n)[:3], dtype.itemsize) + members


# ------------------------------------------------- dataspace / messages

def _dataspace(dims: Tuple[int, ...]) -> bytes:
    return struct.pack("<BBB5x", 1, len(dims), 0) + struct.pack(
        f"<{len(dims)}Q", *dims
    )


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _attr_msg(name: str, value) -> bytes:
    """v1 attribute message. Scalars only (the PyTables convention:
    ints → int64, floats → float64, str/bytes → fixed string, any other
    Python object → pickled fixed string)."""
    if isinstance(value, bool):
        value = int(value)
    if isinstance(value, (int, np.integer)):
        dt, ds, data = _dt_int(8), _dataspace(()), struct.pack("<q", int(value))
    elif isinstance(value, (float, np.floating)):
        dt, ds, data = _dt_float(8), _dataspace(()), struct.pack("<d", float(value))
    else:
        if isinstance(value, str):
            raw = value.encode("utf-8")
        elif isinstance(value, bytes):
            raw = value
        else:
            raw = pickle.dumps(value, protocol=2)
        raw = raw or b"\x00"
        dt, ds, data = _dt_string(len(raw)), _dataspace(()), raw
    nm = name.encode("utf-8") + b"\x00"
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    body += _pad8(nm) + _pad8(dt) + _pad8(ds) + data
    return _msg(0x0C, body)


def _object_header(messages: list) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


# ---------------------------------------------------------- file writer

class _FileBuilder:
    def __init__(self):
        self.buf = bytearray(b"\x00" * _SUPERBLOCK_SIZE)

    def alloc(self, data: bytes) -> int:
        # 8-byte aligned allocations keep every structure self-aligned
        if len(self.buf) % 8:
            self.buf += b"\x00" * (-len(self.buf) % 8)
        addr = len(self.buf)
        self.buf += data
        return addr

    # ------------------------------------------------ chunked dataset
    def write_table(
        self,
        records: np.ndarray,
        attrs: Dict[str, object],
        chunk_rows: int,
        complevel: int,
    ) -> int:
        """Write one rank-1 compound dataset; returns its header addr."""
        n = len(records)
        itemsize = records.dtype.itemsize
        chunk_rows = max(1, min(chunk_rows, max(n, 1)))
        chunks = []  # (first_row, addr, nbytes)
        for first in range(0, max(n, 1), chunk_rows):
            part = records[first : first + chunk_rows]
            if len(part) < chunk_rows:  # HDF5 chunks are always full-size
                full = np.zeros(chunk_rows, dtype=records.dtype)
                full[: len(part)] = part
                part = full
            raw = part.tobytes()
            if complevel:
                raw = _shuffle(raw, itemsize)
                raw = zlib.compress(raw, complevel)
            chunks.append((first, self.alloc(raw), len(raw)))
            if n == 0:
                break

        btree = self._chunk_btree(chunks, chunk_rows, itemsize, n)
        msgs = [
            _msg(0x01, _dataspace((n,))),
            _msg(0x03, _dt_compound(records.dtype)),
        ]
        if complevel:
            msgs.append(_msg(0x0B, _filter_pipeline(itemsize, complevel)))
        layout = struct.pack("<BBBQ2I", 3, 2, 2, btree, chunk_rows, itemsize)
        msgs.append(_msg(0x08, layout))
        msgs.extend(_attr_msg(k, v) for k, v in attrs.items())
        return self.alloc(_object_header(msgs))

    def _chunk_btree(self, chunks, chunk_rows, itemsize, nrows) -> int:
        """Single-level chunk B-tree; splits into sibling leaves > 32
        entries (each pointed at by a level-1 node)."""
        def leaf(entries, next_first):
            body = b""
            for first, addr, nbytes in entries:
                body += struct.pack("<IIQQQ", nbytes, 0, first, 0, addr)
            body += struct.pack("<IIQQ", 0, 0, next_first, 0)  # final key
            head = struct.pack(
                "<4sBBHQQ", b"TREE", 1, 0, len(entries), UNDEF, UNDEF
            )
            return head + body

        if len(chunks) <= 32:
            return self.alloc(leaf(chunks, nrows))
        # level-1 root over sibling leaves
        groups = [chunks[i : i + 32] for i in range(0, len(chunks), 32)]
        addrs = []
        for gi, g in enumerate(groups):
            nxt = groups[gi + 1][0][0] if gi + 1 < len(groups) else nrows
            addrs.append((g[0][0], self.alloc(leaf(g, nxt)), g))
        body = b""
        for gi, (first, addr, g) in enumerate(addrs):
            body += struct.pack("<IIQQQ", 0, 0, first, 0, addr)
        body += struct.pack("<IIQQ", 0, 0, nrows, 0)
        head = struct.pack("<4sBBHQQ", b"TREE", 1, 1, len(addrs), UNDEF, UNDEF)
        return self.alloc(head + body)

    # --------------------------------------------------------- groups
    def write_group(self, links: Dict[str, int], attrs: Dict[str, object]) -> int:
        """Old-style group from name → child header addr; returns the
        group's object header address."""
        names = sorted(links)
        heap_data = bytearray(b"\x00" * 8)  # offset 0 = the empty string
        offsets = {}
        for name in names:
            offsets[name] = len(heap_data)
            heap_data += _pad8(name.encode("utf-8") + b"\x00")
        heap_data_addr = self.alloc(bytes(heap_data))
        heap = struct.pack(
            "<4sB3xQQQ", b"HEAP", 0, len(heap_data), UNDEF, heap_data_addr
        )
        heap_addr = self.alloc(heap)

        snod = struct.pack("<4sBxH", b"SNOD", 1, len(names))
        for name in names:
            snod += struct.pack("<QQII16x", offsets[name], links[name], 0, 0)
        snod_addr = self.alloc(snod)

        last_key = offsets[names[-1]] if names else 0
        btree = struct.pack(
            "<4sBBHQQQQQ", b"TREE", 0, 0, 1, UNDEF, UNDEF, 0, snod_addr, last_key
        )
        btree_addr = self.alloc(btree)

        msgs = [_msg(0x11, struct.pack("<QQ", btree_addr, heap_addr))]
        msgs.extend(_attr_msg(k, v) for k, v in attrs.items())
        return self.alloc(_object_header(msgs))

    def finish(self, root_addr: int) -> bytes:
        sb = _SIG + struct.pack(
            "<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, 4, 16, 0
        )
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol table entry: name offset 0, header addr, no cache
        sb += struct.pack("<QQII16x", 0, root_addr, 0, 0)
        assert len(sb) <= _SUPERBLOCK_SIZE
        self.buf[: len(sb)] = sb
        return bytes(self.buf)


def _shuffle(data: bytes, itemsize: int) -> bytes:
    n = len(data) // itemsize
    arr = np.frombuffer(data, dtype=np.uint8).reshape(n, itemsize)
    return arr.T.tobytes()


def _filter_pipeline(itemsize: int, complevel: int) -> bytes:
    # applied in order: shuffle, then deflate
    body = struct.pack("<BB2x4x", 1, 2)
    # v1 entries pad to 8 bytes when nvals is odd (format spec, layout v1)
    body += struct.pack("<HHHHI4x", 2, 0, 1, 1, itemsize)  # shuffle (optional)
    body += struct.pack("<HHHHI4x", 1, 0, 0, 1, complevel)  # deflate
    return body


# ---------------------------------------------------------- pandas layer

def _records_from_frame(df: pd.DataFrame):
    """(structured records, table attrs) in the PyTables frame_table
    dialect: ``index`` + one field per column, data_columns style."""
    names, arrays, kinds = ["index"], [], {}
    idx = df.index.to_numpy()
    if idx.dtype.kind not in "iu":
        idx = np.arange(len(df), dtype=np.int64)
    arrays.append(idx.astype(np.int64))
    for col in df.columns:
        s = df[col]
        k = s.dtype.kind
        if k == "b":
            arrays.append(s.to_numpy().astype(np.uint8))
            kinds[str(col)] = "bool"
        elif k in "iu":
            arrays.append(s.to_numpy().astype(np.int64))
        elif k == "f":
            arrays.append(s.to_numpy().astype(s.dtype))
        elif k in "OU":
            enc = [("" if v is None else str(v)).encode("utf-8") for v in s]
            width = max([len(e) for e in enc] + [1])
            arrays.append(np.array(enc, dtype=f"S{width}"))
            kinds[str(col)] = "string"
        else:
            raise TypeError(f"unsupported column dtype {s.dtype} ({col})")
        names.append(str(col))
    rec_dt = np.dtype(
        [(nm, arr.dtype) for nm, arr in zip(names, arrays)]
    )
    records = np.zeros(len(df), dtype=rec_dt)
    for nm, arr in zip(names, arrays):
        records[nm] = arr
    attrs: Dict[str, object] = {
        "CLASS": "TABLE",
        "VERSION": "2.7",
        "TITLE": "",
        "NROWS": len(df),
        "index_kind": "integer",
        "encoding": "UTF-8",
        "errors": "strict",
        "non_index_axes": [(1, [str(c) for c in df.columns])],  # pickled
    }
    for i, nm in enumerate(names):
        attrs[f"FIELD_{i}_NAME"] = nm
    for nm, kind in kinds.items():
        attrs[f"{nm}_dtype"] = kind
    return records, attrs


def write_frame_table(
    path: str,
    frames: Dict[str, pd.DataFrame],
    chunk_rows: int = 1000,
    complevel: int = 0,
    group_meta: Optional[Dict[str, Dict[str, object]]] = None,
) -> None:
    """Write ``{key: DataFrame}`` to ``path`` as a PyTables-style HDF5
    file (one ``/key/table`` compound dataset per frame). ``group_meta``
    attaches extra pickled attributes to a key's group — the slot the
    reference reads per-table metadata from
    (`/root/reference/pandas_to_postgres/utilities.py:17-73`)."""
    b = _FileBuilder()
    root_links: Dict[str, int] = {}
    # nested keys ("a/b") hang sub-trees off the root
    tree: Dict[str, object] = {}
    for key, df in frames.items():
        parts = [p for p in key.strip("/").split("/") if p]
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})  # type: ignore[assignment]
        node[parts[-1]] = df  # type: ignore[index]

    def build(node: Dict[str, object], prefix: str) -> int:
        links: Dict[str, int] = {}
        for name, child in node.items():
            full = f"{prefix}/{name}".strip("/")
            if isinstance(child, dict):
                links[name] = build(child, full)
            else:
                records, tattrs = _records_from_frame(child)
                taddr = b.write_table(records, tattrs, chunk_rows, complevel)
                gattrs: Dict[str, object] = {
                    "CLASS": "GROUP",
                    "TITLE": "",
                    "VERSION": "1.0",
                    "pandas_type": "frame_table",
                    "pandas_version": "0.15.2",
                    "table_type": "appendable_frame",
                }
                for k, v in (group_meta or {}).get(full, {}).items():
                    gattrs[k] = v
                links[name] = b.write_group({"table": taddr}, gattrs)
        return b.write_group(
            links, {"CLASS": "GROUP", "TITLE": "", "VERSION": "1.0"}
        )

    root = build(tree, "")
    data = b.finish(root)
    with open(path, "wb") as fh:
        fh.write(data)
