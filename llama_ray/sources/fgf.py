"""FGF binary container — reader (and test writer) for the reference's
``.fgf`` property-graph files.

Format (reverse-engineered from the reference loader's *behavior*,
`/root/reference/llama/include/llama/loaders/ll_load_fgf.h:469-830`;
primitive readers :1305-1357, block framing :401-431):

- raw big-endian header: ``"FGF"`` magic, one version byte (``'1'``),
  u64 header size, then (if present) u64 initial vertex id and u64
  initial edge id, rest of header skipped;
- ``"CNTS"``: u64 #property-types, u64 #vertex-types + per type
  (u16-len string name, u64 count), u64 #edge-types + per type
  (name, count);
- ``"ATTR"``: per property type (name, u16 type code — 0x01 string,
  0x12 int32; codes from ``ll_common.h:182-188``);
- data sections are Java ObjectOutputStream block streams (4-byte
  stream header ``AC ED 00 05``; payload framed as ``0x77`` + u8 len
  or ``0x7A`` + u32 len blocks):
  - one stream for ALL vertex types: per type ``"NODE"`` magic +
    name string, then per vertex a compressed-word property count and
    (compressed-word type index, value) pairs — compressed word =
    one byte, or ``0xFF`` + u64 (:390-393);
  - one NEW stream per edge type: ``"EDGE"`` magic + name, then per
    edge u64 head, u64 tail (edge directed tail → head,
    :779-781) and the same property encoding.

The reader parses the (inherently sequential) container on the
driver and returns Arrow-backed Datasets — src/dst int64 edges with
edge-property columns, plus a node-property table. The parquet
re-encoding (``sources/property_graph.py``) remains the scale path;
this loader exists so real ``.fgf`` files can enter the engine at
all (they then convert once).
"""

from __future__ import annotations

import struct

import pyarrow as pa
import ray.data as rd

# full FGF-compatible type-code set (ll_common.h:182-188); values are
# big-endian via the primitive readers (ll_load_fgf.h:1305-1357):
# boolean one byte, int16/int32/int64 signed BE, float/double IEEE BE
_T_STRING = 0x01
_T_BOOLEAN = 0x10
_T_INT16 = 0x11
_T_INT32 = 0x12
_T_INT64 = 0x13
_T_FLOAT = 0x20
_T_DOUBLE = 0x21

_ARROW_OF = {
    _T_STRING: pa.string(),
    _T_BOOLEAN: pa.bool_(),
    _T_INT16: pa.int16(),
    _T_INT32: pa.int32(),
    _T_INT64: pa.int64(),
    _T_FLOAT: pa.float32(),
    _T_DOUBLE: pa.float64(),
}

_NAME_OF_CODE = {
    "string": _T_STRING,
    "boolean": _T_BOOLEAN,
    "int16": _T_INT16,
    "int32": _T_INT32,
    "int64": _T_INT64,
    "float": _T_FLOAT,
    "double": _T_DOUBLE,
}


class _JavaBlockReader:
    """Java ObjectOutputStream block-data framing."""

    def __init__(self, f):
        hdr = f.read(4)  # stream magic+version (0xACED0005) — skipped
        if len(hdr) != 4:
            raise ValueError("truncated FGF data stream header")
        self._f = f
        self._buf = b""
        self._pos = 0

    def _fill(self):
        magic = self._f.read(1)
        if magic == b"\x77":
            size = self._f.read(1)[0]
        elif magic == b"\x7a":
            size = struct.unpack(">I", self._f.read(4))[0]
        else:
            raise ValueError(f"bad FGF block magic {magic!r}")
        self._buf = self._f.read(size)
        self._pos = 0
        if len(self._buf) != size:
            raise ValueError("truncated FGF block")

    def read(self, n: int) -> bytes:
        parts = []
        while n > 0:
            if self._pos == len(self._buf):
                self._fill()
            take = min(n, len(self._buf) - self._pos)
            parts.append(self._buf[self._pos : self._pos + take])
            self._pos += take
            n -= take
        return b"".join(parts)

    def byte(self) -> int:
        return self.read(1)[0]

    def short(self) -> int:
        return struct.unpack(">H", self.read(2))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def long(self) -> int:
        return struct.unpack(">q", self.read(8))[0]

    def int16(self) -> int:
        return struct.unpack(">h", self.read(2))[0]

    def float32(self) -> float:
        return struct.unpack(">f", self.read(4))[0]

    def float64(self) -> float:
        return struct.unpack(">d", self.read(8))[0]

    def string(self) -> str:
        return self.read(self.short()).decode("utf-8")

    def compressed(self) -> int:
        b = self.byte()
        return b if b < 0xFF else struct.unpack(">Q", self.read(8))[0]

    def magic(self, expect: bytes) -> None:
        got = self.read(len(expect))
        if got != expect:
            raise ValueError(f"bad FGF magic: expected {expect!r}, got {got!r}")


def _read_props(r: _JavaBlockReader, prop_types):
    out = {}
    for _ in range(r.compressed()):
        ti = r.compressed()
        name, code = prop_types[ti]
        if code == _T_STRING:
            out[name] = r.string()
        elif code == _T_BOOLEAN:
            out[name] = r.byte() != 0
        elif code == _T_INT16:
            out[name] = r.int16()
        elif code == _T_INT32:
            out[name] = r.int32()
        elif code == _T_INT64:
            out[name] = r.long()
        elif code == _T_FLOAT:
            out[name] = r.float32()
        elif code == _T_DOUBLE:
            out[name] = r.float64()
        else:  # unreachable: codes validated at ATTR parse
            raise ValueError(f"unsupported FGF property type 0x{code:x}")
    return out


def read_fgf(path: str):
    """Parse a ``.fgf`` file → dict with:

    - ``edges``: Dataset (src, dst, kind, <edge property columns>)
      — src = tail, dst = head (reference edge direction);
    - ``nodes``: Dataset (node, kind, <node property columns>);
    - ``meta``: counts / type names / initial ids.
    """
    with open(path, "rb") as f:
        if f.read(3) != b"FGF":
            raise ValueError(f"{path}: not an FGF file")
        version = f.read(1)[0] - ord("0")
        if version != 1:
            raise ValueError(f"{path}: unsupported FGF version {version}")

        def word():
            return struct.unpack(">Q", f.read(8))[0]

        def string():
            (ln,) = struct.unpack(">H", f.read(2))
            return f.read(ln).decode("utf-8")

        header_size = word()
        left = header_size
        initial_vertex_id = initial_edge_id = 0
        if left >= 8:
            initial_vertex_id = word()
            left -= 8
        if left >= 8:
            initial_edge_id = word()
            left -= 8
        if left > 0:
            f.seek(left, 1)

        if f.read(4) != b"CNTS":
            raise ValueError("expected CNTS")
        num_prop_types = word()
        vertex_types = []
        for _ in range(word()):
            vertex_types.append((string(), word()))
        edge_types = []
        for _ in range(word()):
            edge_types.append((string(), word()))

        if f.read(4) != b"ATTR":
            raise ValueError("expected ATTR")
        prop_types = []
        for _ in range(num_prop_types):
            name = string()
            (code,) = struct.unpack(">H", f.read(2))
            if code not in _ARROW_OF:
                raise ValueError(f"unsupported FGF property type 0x{code:x}")
            prop_types.append((name, code))

        # ---- vertex section: one OOS stream for all vertex types ----
        node_rows = []
        nr = _JavaBlockReader(f)
        v = initial_vertex_id
        for vt_name, vt_count in vertex_types:
            nr.magic(b"NODE")
            nr.string()
            for _ in range(vt_count):
                props = _read_props(nr, prop_types)
                node_rows.append((v, vt_name, props))
                v += 1

        # ---- edge sections: one fresh OOS stream per edge type ------
        edge_rows = []
        for et_name, et_count in edge_types:
            er = _JavaBlockReader(f)
            er.magic(b"EDGE")
            er.string()
            for _ in range(et_count):
                head = er.long()
                tail = er.long()
                props = _read_props(er, prop_types)
                edge_rows.append((tail, head, et_name, props))

    prop_names = [p[0] for p in prop_types]

    def table(rows, base_cols):
        cols = {k: [] for k in base_cols}
        for name, code in prop_types:
            cols[name] = []
        for row in rows:
            *base, props = row
            for k, val in zip(base_cols, base):
                cols[k].append(val)
            for name, code in prop_types:
                cols[name].append(props.get(name))
        arrays = {}
        for k, vals in cols.items():
            if k in base_cols and k != "kind":
                arrays[k] = pa.array(vals, pa.int64())
            elif k == "kind":
                arrays[k] = pa.array(vals, pa.string())
            else:
                arrays[k] = pa.array(vals, _ARROW_OF[dict(prop_types)[k]])
        return pa.table(arrays)

    nodes_t = table(node_rows, ["node", "kind"])
    edges_t = table(edge_rows, ["src", "dst", "kind"])
    return {
        "edges": rd.from_arrow(edges_t),
        "nodes": rd.from_arrow(nodes_t),
        "meta": {
            "initial_vertex_id": initial_vertex_id,
            "initial_edge_id": initial_edge_id,
            "vertex_types": vertex_types,
            "edge_types": edge_types,
            "property_types": prop_types,
        },
    }


def read_fgf_edges(path: str) -> rd.Dataset:
    """Registry entry point: just the (src, dst) edge Dataset."""
    return read_fgf(path)["edges"].select_columns(["src", "dst"])


# -------------------------------------------------------------- writer


class _JavaBlockWriter:
    def __init__(self, f):
        self._f = f
        f.write(b"\xac\xed\x00\x05")
        self._buf = bytearray()

    def write(self, b: bytes):
        self._buf += b

    def byte(self, v):
        self.write(bytes([v]))

    def short(self, v):
        self.write(struct.pack(">H", v))

    def int32(self, v):
        self.write(struct.pack(">i", v))

    def long(self, v):
        self.write(struct.pack(">q", v))

    def int16(self, v):
        self.write(struct.pack(">h", v))

    def float32(self, v):
        self.write(struct.pack(">f", v))

    def float64(self, v):
        self.write(struct.pack(">d", v))

    def string(self, s: str):
        b = s.encode("utf-8")
        self.short(len(b))
        self.write(b)

    def compressed(self, v: int):
        if v < 0xFF:
            self.byte(v)
        else:
            self.byte(0xFF)
            self.write(struct.pack(">Q", v))

    def flush(self):
        # emit as 0x77/0x7A framed blocks (split at 255 to exercise
        # both forms only when large)
        data = bytes(self._buf)
        if len(data) <= 0xFE:
            self._f.write(b"\x77" + bytes([len(data)]) + data)
        else:
            self._f.write(b"\x7a" + struct.pack(">I", len(data)) + data)
        self._buf = bytearray()


def write_fgf(
    path: str,
    *,
    num_vertices: int,
    edges,  # list of (src=tail, dst=head, {prop: value})
    vertex_props=None,  # list of dicts, len == num_vertices
    prop_types=None,  # [(name, 'string'|'int32')]
    vertex_type: str = "node",
    edge_type: str = "edge",
) -> None:
    """Minimal conformant FGF v1 writer (round-trip tests; also handy
    to hand data back to reference tooling). ``prop_types`` maps
    names to any of the 7 FGF type names: string, boolean, int16,
    int32, int64, float, double."""
    prop_types = prop_types or []
    codes = [(n, _NAME_OF_CODE[t]) for n, t in prop_types]
    idx = {n: i for i, (n, _) in enumerate(codes)}
    vertex_props = vertex_props or [{} for _ in range(num_vertices)]

    with open(path, "wb") as f:
        f.write(b"FGF")
        f.write(b"1")
        f.write(struct.pack(">Q", 16))  # header: initial vertex + edge id
        f.write(struct.pack(">Q", 0))
        f.write(struct.pack(">Q", 0))
        f.write(b"CNTS")
        f.write(struct.pack(">Q", len(codes)))
        f.write(struct.pack(">Q", 1))  # one vertex type
        name = vertex_type.encode()
        f.write(struct.pack(">H", len(name)) + name)
        f.write(struct.pack(">Q", num_vertices))
        f.write(struct.pack(">Q", 1))  # one edge type
        name = edge_type.encode()
        f.write(struct.pack(">H", len(name)) + name)
        f.write(struct.pack(">Q", len(edges)))
        f.write(b"ATTR")
        for n, c in codes:
            nb = n.encode()
            f.write(struct.pack(">H", len(nb)) + nb)
            f.write(struct.pack(">H", c))

        def emit_props(w, props):
            w.compressed(len(props))
            for k, val in props.items():
                w.compressed(idx[k])
                code = codes[idx[k]][1]
                if code == _T_STRING:
                    w.string(str(val))
                elif code == _T_BOOLEAN:
                    w.byte(1 if val else 0)
                elif code == _T_INT16:
                    w.int16(int(val))
                elif code == _T_INT32:
                    w.int32(int(val))
                elif code == _T_INT64:
                    w.long(int(val))
                elif code == _T_FLOAT:
                    w.float32(float(val))
                else:
                    w.float64(float(val))

        w = _JavaBlockWriter(f)
        w.write(b"NODE")
        w.string(vertex_type)
        for props in vertex_props:
            emit_props(w, props)
        w.flush()

        w = _JavaBlockWriter(f)
        w.write(b"EDGE")
        w.string(edge_type)
        for src, dst, props in edges:
            w.long(dst)  # head first (reference :779-781)
            w.long(src)
            emit_props(w, props)
        w.flush()
