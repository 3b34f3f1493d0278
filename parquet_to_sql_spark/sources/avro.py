"""Avro source — pure-stdlib Object Container File reader behind the
Spark 4 Python DataSource API (format name ``pyavro``).

Why it exists: the container ships neither the ``spark-avro`` module
jar nor any Python avro package (both verified absent across rounds),
yet Avro is a staple interchange format a complete engine must read.
The Avro specification is public and small
(https://avro.apache.org/docs/current/specification/): an Object
Container File is a header (magic ``Obj\\x01``, metadata map carrying
the writer schema JSON and codec, 16-byte sync marker) followed by
blocks of (row count, byte length, payload, sync), where the payload
is the binary encoding — zigzag-varint ints/longs, little-endian IEEE
float/double, length-prefixed bytes/strings, fields in declaration
order, union values prefixed by their branch index.  ``null`` and
``deflate`` (raw zlib) codecs are supported, which is what the Java
writer emits by default.

Scale shape: one input partition per ``.avro`` file (the natural
split — blocks inside a file share one sync stream), so a directory
of N files reads N-way parallel.  This is the modest-scale honest
path: a JVM reader (spark-avro) beats it per-byte; the point is that
the FORMAT is covered, distributed, and schema-faithful (records ->
structs, [null, T] unions -> nullable T, enums -> strings, date /
timestamp-millis / timestamp-micros logical types -> DATE/TIMESTAMP).

A matching minimal writer (`write_avro`) exists so tests can
round-trip files hermetically; it is test infrastructure, not a sink.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MAGIC = b"Obj\x01"


# --- binary decoding -------------------------------------------------------


def _read_long(buf: io.BufferedIOBase) -> int:
    """Zigzag varint (the int/long wire form)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BufferedIOBase) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _decoder_for(schema: Any) -> Callable[[io.BufferedIOBase], Any]:
    """Compile a schema (parsed JSON) into a value decoder."""
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):  # union
        branches = [_decoder_for(s) for s in schema]

        def du(buf, branches=branches):
            return branches[_read_long(buf)](buf)

        return du
    t = schema["type"]
    logical = schema.get("logicalType")
    if t == "null":
        return lambda buf: None
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t in ("int", "long"):
        if logical == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            return lambda buf: epoch + datetime.timedelta(days=_read_long(buf))
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime

            div = 1_000 if logical == "timestamp-millis" else 1_000_000
            epoch = datetime.datetime(1970, 1, 1)

            def dts(buf, div=div, epoch=epoch):
                return epoch + datetime.timedelta(
                    microseconds=_read_long(buf) * (1_000_000 // div)
                )

            return dts
        return _read_long
    if t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return lambda buf: _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        size = int(schema["size"])
        return lambda buf, size=size: buf.read(size)
    if t == "enum":
        symbols = list(schema["symbols"])
        return lambda buf, symbols=symbols: symbols[_read_long(buf)]
    if t == "record":
        field_decoders = [_decoder_for(f["type"]) for f in schema["fields"]]

        def drec(buf, fds=field_decoders):
            return tuple(fd(buf) for fd in fds)

        return drec
    if t == "array":
        item = _decoder_for(schema["items"])

        def darr(buf, item=item):
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block size prefix follows a negative count
                    _read_long(buf)
                    n = -n
                out.extend(item(buf) for _ in range(n))

        return darr
    if t == "map":
        val = _decoder_for(schema["values"])

        def dmap(buf, val=val):
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    # key must decode before the value (dict assignment
                    # evaluates its right-hand side first)
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = val(buf)

        return dmap
    raise ValueError(f"unsupported Avro type: {schema!r}")


def read_avro_file(path: str) -> tuple[dict, Iterator[Any]]:
    """Parse one container file; returns (writer schema, row iterator).
    The iterator streams block by block — O(block) memory."""
    f = open(path, "rb")
    if f.read(4) != _MAGIC:
        f.close()
        raise ValueError(f"{path}: not an Avro object container file")
    meta_dec = _decoder_for({"type": "map", "values": "bytes"})
    meta = meta_dec(f)  # keys decode to str, values stay bytes
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        f.close()
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = f.read(16)
    row_dec = _decoder_for(schema)

    def rows() -> Iterator[Any]:
        try:
            while True:
                head = f.read(1)
                if not head:
                    return
                f.seek(-1, 1)
                n = _read_long(f)
                nbytes = _read_long(f)
                payload = f.read(nbytes)
                if codec == "deflate":
                    payload = zlib.decompress(payload, -15)
                buf = io.BytesIO(payload)
                for _ in range(n):
                    yield row_dec(buf)
                if f.read(16) != sync:
                    raise ValueError("sync marker mismatch (corrupt file)")
        finally:
            f.close()

    return schema, rows()


# --- schema mapping --------------------------------------------------------


def avro_to_spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):
        non_null = [s for s in schema if (s if isinstance(s, str) else s.get("type")) != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only [null, T] unions supported, got {schema!r}")
        return avro_to_spark_type(non_null[0])
    t, logical = schema["type"], schema.get("logicalType")
    if logical == "date":
        return T.DateType()
    if logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampNTZType()
    simple = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "bytes": T.BinaryType(),
        "string": T.StringType(), "fixed": T.BinaryType(),
        "enum": T.StringType(), "null": T.NullType(),
    }
    if t in simple:
        return simple[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), True)
    raise ValueError(f"unsupported Avro type: {schema!r}")


def avro_to_spark_schema(schema: dict) -> T.StructType:
    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    st = avro_to_spark_type(schema)
    assert isinstance(st, T.StructType)
    return st


# --- Spark DataSource ------------------------------------------------------


def _avro_paths(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.avro")))
    return sorted(glob.glob(path)) or [path]


class AvroDataSource(DataSource):
    """spark.read.format("pyavro").load(path) — path may be a file, a
    directory of ``*.avro``, or a glob; one partition per file."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self):
        paths = _avro_paths(self._path())
        if not paths:
            raise ValueError(f"no Avro files found under {self._path()!r}")
        schema, rows_iter = read_avro_file(paths[0])
        next(rows_iter, None)  # enter the generator so close() runs its finally
        rows_iter.close()
        return avro_to_spark_schema(schema)

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro needs a path: .load(<path>)")
        return path

    def reader(self, schema) -> "AvroReader":
        return AvroReader(self._path(), [f.name for f in schema.fields])


class AvroReader(DataSourceReader):
    def __init__(self, path: str, field_names: list[str]):
        self.paths = _avro_paths(path)
        self.field_names = list(field_names)

    def partitions(self):
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition):
        # decode with THIS file's writer schema, then project by NAME
        # into the DataSource's declared field order — a directory
        # whose files reordered or added fields (routine Avro schema
        # evolution) must not land values in the wrong columns
        wschema, rows = read_avro_file(partition.value)
        wnames = [f["name"] for f in wschema["fields"]]
        if wnames == self.field_names:
            yield from rows
            return
        idx = {n: i for i, n in enumerate(wnames)}
        sel = [idx.get(n) for n in self.field_names]
        for r in rows:
            yield tuple(r[i] if i is not None else None for i in sel)


# --- minimal writer (test infrastructure) ---------------------------------


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _encoder_for(schema: Any) -> Callable[[io.BytesIO, Any], None]:
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):
        branches = [
            (s if isinstance(s, str) else s["type"], _encoder_for(s)) for s in schema
        ]

        def _matches(t: str, v) -> bool:
            if t == "null":
                return v is None
            if t == "boolean":
                return isinstance(v, bool)
            if t in ("int", "long"):
                return isinstance(v, int) and not isinstance(v, bool)
            if t in ("float", "double"):
                return isinstance(v, float)
            if t == "string":
                return isinstance(v, str)
            if t == "bytes":
                return isinstance(v, (bytes, bytearray))
            return v is not None  # records/arrays/maps/logical types

        def eu(out, v, branches=branches):
            for i, (t, enc) in enumerate(branches):
                if _matches(t, v):
                    _write_long(out, i)
                    enc(out, v)
                    return
            raise ValueError(
                f"value {v!r} matches no union branch {[t for t, _ in branches]}"
            )

        return eu
    t = schema["type"]
    if t == "null":
        return lambda out, v: None
    if t == "boolean":
        return lambda out, v: out.write(b"\x01" if v else b"\x00")
    if t in ("int", "long"):
        return _write_long
    if t == "float":
        return lambda out, v: out.write(struct.pack("<f", v))
    if t == "double":
        return lambda out, v: out.write(struct.pack("<d", v))
    if t in ("bytes", "string"):
        def eb(out, v):
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            _write_long(out, len(b))
            out.write(b)

        return eb
    if t == "enum":
        symbols = list(schema["symbols"])
        return lambda out, v, s=symbols: _write_long(out, s.index(v))
    if t == "record":
        encs = [_encoder_for(f["type"]) for f in schema["fields"]]
        names = [f["name"] for f in schema["fields"]]

        def erec(out, v, encs=encs, names=names):
            vals = [v[n] for n in names] if isinstance(v, dict) else list(v)
            for enc, val in zip(encs, vals):
                enc(out, val)

        return erec
    if t == "array":
        item = _encoder_for(schema["items"])

        def earr(out, v, item=item):
            if v:
                _write_long(out, len(v))
                for x in v:
                    item(out, x)
            _write_long(out, 0)

        return earr
    if t == "map":
        val = _encoder_for(schema["values"])

        def emap(out, v, val=val):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out.write(kb)
                    val(out, x)
            _write_long(out, 0)

        return emap
    raise ValueError(f"unsupported Avro type for writing: {schema!r}")


def write_avro(
    path: str, schema: dict, rows: list, codec: str = "null",
    rows_per_block: int = 1000,
) -> None:
    """Minimal container-file writer (null/deflate codecs) so tests can
    round-trip the reader hermetically."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null or deflate")
    enc = _encoder_for(schema)
    sync = bytes(range(16))
    with open(path, "wb") as f:
        f.write(_MAGIC)
        meta = io.BytesIO()
        _write_long(meta, 2)
        for k, v in (
            ("avro.schema", json.dumps(schema).encode()),
            ("avro.codec", codec.encode()),
        ):
            kb = k.encode()
            _write_long(meta, len(kb))
            meta.write(kb)
            _write_long(meta, len(v))
            meta.write(v)
        _write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)
        for i in range(0, len(rows), rows_per_block):
            block_rows = rows[i : i + rows_per_block]
            payload = io.BytesIO()
            for r in block_rows:
                enc(payload, r)
            data = payload.getvalue()
            if codec == "deflate":
                data = zlib.compress(data)[2:-4]  # raw deflate
            head = io.BytesIO()
            _write_long(head, len(block_rows))
            _write_long(head, len(data))
            f.write(head.getvalue())
            f.write(data)
            f.write(sync)
