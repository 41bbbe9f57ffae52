"""Avro OCF ingest without the spark-avro DataSource module.

The image ships avro CORE jars only (no ``format("avro")`` source — the
DataSource module is absent and there is no network to fetch it), yet
Avro object-container files are a first-class harvest format (SURVEY.md
§2.1). This module closes the gap Spark-first:

- **Scan**: ``spark.read.format("binaryFile")`` — one task per file,
  the driver never touches payloads — then an Arrow-batched
  ``mapInPandas`` decodes each file's records with the pure-Python OCF
  decoder below. Parallelism == file count, exactly like every other
  non-splittable harvest input (the scan_csv_gzip lesson): at 100 TB,
  receive many medium .avro files and convert to parquet in the first
  pass.
- **Decoder**: a complete implementation of the OCF spec's core —
  zigzag-varint longs, all eight primitive types, record / enum /
  fixed / array / map / union, ``null`` and ``deflate`` codecs (the
  two the spec requires; others raise with the codec named). Logical
  types decode as their base type — cast downstream.
- **Independence**: the decoder/encoder dialect is pinned by
  tests/test_avro.py's BIDIRECTIONAL validation against the JVM
  avro-core library (org.apache.avro via the driver's py4j bridge — a
  wholly independent implementation): JVM-written files decode here,
  and bytes from ``encode_ocf`` read back identically through the JVM
  reader. The ``scan_avro`` gate fixture itself is rendered with
  ``encode_ocf`` (one-pass, fast); its independence rests on those
  cross-tests, not on the fixture writer.

No column projection reaches the decoder (an OCF block is
record-sequential; skipping a field still walks its bytes), so select
AFTER the scan — pruning saves Arrow transfer, not decode work. That
is inherent to row-major Avro, not this reader.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

# Zero-width values (null, empty record, size-0 fixed — and arrays of
# them) consume no bytes, so a corrupt/hostile count can't be bounded
# by remaining input — NOR can any size-proportional budget separate a
# crafted file from a legitimate degenerate one (a block of N empty
# records costs ~20 bytes either way). The contract is therefore an
# absolute per-FILE materialization cap, bounded-by-default (~6 MB of
# appended empties worst case) and explicitly raisable per call
# (``zero_width_cap=``) for corpora that legitimately carry more —
# the same default-safe/escape-hatch shape as the fuzzy join's
# suffix_share_guard. A crafted count=2^62 header raises instead of
# hanging the executor regardless of the cap chosen.
_ZERO_WIDTH_CAP = 100_000

# Deflate's theoretical max expansion is ~1032:1; a block past
# ratio×max(compressed_size, floor) is a decompression bomb, not data.
_INFLATE_MAX_RATIO = 1100
_INFLATE_FLOOR = 1 << 20


class AvroDecodeError(ValueError):
    """Malformed or unsupported Avro object-container bytes."""


class _Cursor:
    __slots__ = ("buf", "pos", "zw", "zw_cap")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        #: zero-width decode counter — carried ACROSS blocks by
        #: _decode_ocf so the cap is a per-FILE budget (a per-block/
        #: per-array cap would be bypassable by a crafted file
        #: repeating many just-under-cap blocks, each ~20 input bytes
        #: for ~6 MB of appended empties)
        self.zw = 0
        self.zw_cap = _ZERO_WIDTH_CAP

    def read(self, n: int) -> bytes:
        if n < 0:
            # a negative length is always corruption; without this
            # guard the cursor would move BACKWARDS and loop forever
            raise AvroDecodeError(f"negative length {n} at {self.pos}")
        if self.pos + n > len(self.buf):
            raise AvroDecodeError(
                f"truncated: need {n} bytes at offset {self.pos}, "
                f"have {len(self.buf) - self.pos}")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _read_long(c: _Cursor) -> int:
    """Zigzag varint (the wire form of both int and long)."""
    shift, acc = 0, 0
    while True:
        b = c.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroDecodeError("varint longer than 10 bytes")
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(c: _Cursor) -> bytes:
    n = _read_long(c)
    if n < 0:
        raise AvroDecodeError(f"negative bytes length {n}")
    return c.read(n)


def _decoder_of(schema) -> Callable[[_Cursor], object]:
    """Compile a schema (parsed JSON: str | dict | list) into a decode
    function. Named-type REFERENCES are not resolved (the fixture
    surface doesn't recurse); a reference to an unknown name raises."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):  # union: branch index then value
        branches = [_decoder_of(s) for s in schema]

        def dec_union(c: _Cursor):
            i = _read_long(c)
            if not 0 <= i < len(branches):
                raise AvroDecodeError(f"union branch {i} of {len(branches)}")
            return branches[i](c)
        return dec_union
    else:
        raise AvroDecodeError(f"unsupported schema node {schema!r}")

    if t == "null":
        return lambda c: None
    if t == "boolean":
        return lambda c: c.read(1) != b"\x00"
    if t in ("int", "long"):
        return _read_long
    if t == "float":
        return lambda c: struct.unpack("<f", c.read(4))[0]
    if t == "double":
        return lambda c: struct.unpack("<d", c.read(8))[0]
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return lambda c: _read_bytes(c).decode("utf-8")
    if t == "record":
        fields = [(f["name"], _decoder_of(f["type"]))
                  for f in schema["fields"]]

        def dec_record(c: _Cursor):
            return {name: dec(c) for name, dec in fields}
        return dec_record
    if t == "enum":
        symbols = schema["symbols"]

        def dec_enum(c: _Cursor):
            i = _read_long(c)
            if not 0 <= i < len(symbols):
                raise AvroDecodeError(f"enum index {i} of {len(symbols)}")
            return symbols[i]
        return dec_enum
    if t == "fixed":
        size = schema["size"]
        return lambda c: c.read(size)
    if t == "array":
        item = _decoder_of(schema["items"])

        def dec_array(c: _Cursor):
            out = []
            while True:
                n = _read_long(c)
                if n == 0:
                    return out
                if n < 0:  # negative count: byte size follows (skippable
                    n = -n  # form) — we decode anyway, so just consume it
                    _read_long(c)
                for _ in range(n):
                    before = c.pos
                    out.append(item(c))
                    if c.pos == before:
                        # zero-width items (null / empty record): the
                        # count is unfalsifiable from remaining bytes,
                        # so a crafted huge count would loop to OOM —
                        # charge the cursor's per-FILE budget and raise
                        # past the cap (map entries always advance ≥1
                        # byte via the key, unions via the branch
                        # index; only arrays + block records need this)
                        c.zw += 1
                        if c.zw > c.zw_cap:
                            raise AvroDecodeError(
                                f"{c.zw} zero-width values accumulated "
                                f"across this file (latest: an array "
                                f"chunk claiming {n}) — past the "
                                f"{c.zw_cap} per-file cap; raise "
                                "zero_width_cap if this degenerate "
                                "shape is legitimate data")
        return dec_array
    if t == "map":
        val = _decoder_of(schema["values"])

        def dec_map(c: _Cursor):
            out = {}
            while True:
                n = _read_long(c)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(c)
                for _ in range(n):
                    k = _read_bytes(c).decode("utf-8")
                    out[k] = val(c)
        return dec_map
    raise AvroDecodeError(f"unsupported avro type {t!r} "
                          "(named-type references are not resolved)")


def _inflate_capped(raw: bytes, declared_size: int) -> bytes:
    """Raw-deflate inflate with a decompression-bomb cap. Deflate's
    theoretical max ratio is ~1032:1, so a legitimate block never
    expands past ~1032× its compressed size; allow _INFLATE_MAX_RATIO×
    with an _INFLATE_FLOOR byte floor and raise beyond that instead of handing an
    unbounded zlib.decompress a crafted block (landing-zone posture:
    corrupt/hostile input must raise, never exhaust the executor)."""
    cap = max(declared_size, _INFLATE_FLOOR) * _INFLATE_MAX_RATIO
    d = zlib.decompressobj(-15)
    chunks: list[bytes] = []
    total, data = 0, raw
    while True:
        piece = d.decompress(data, 1 << 20)
        chunks.append(piece)
        total += len(piece)
        if total > cap:
            raise AvroDecodeError(
                f"deflate block expands past {cap} bytes "
                f"(compressed {declared_size}) — decompression-bomb guard")
        data = d.unconsumed_tail
        if d.eof or (not data and len(piece) < (1 << 20)):
            break
    if not d.eof:
        # the replaced zlib.decompress raised Error -5 here; a stream
        # with no end-of-stream marker must stay a decode ERROR, not a
        # silently-accepted partial block (trailing bytes AFTER eof are
        # ignored, also matching zlib.decompress)
        raise AvroDecodeError(
            "truncated deflate stream in block (no end-of-stream marker)")
    tail = d.flush()
    total += len(tail)
    if total > cap:
        raise AvroDecodeError(
            f"deflate block expands past {cap} bytes "
            f"(compressed {declared_size}) — decompression-bomb guard")
    chunks.append(tail)
    return b"".join(chunks)


def decode_ocf(buf: bytes,
               zero_width_cap: int = _ZERO_WIDTH_CAP) -> tuple[dict, list[dict]]:
    """Decode one Avro object-container file; returns
    ``(writer_schema_json, records)`` where each record is a plain
    dict. Codecs: null, deflate (raw zlib per the spec); anything else
    raises AvroDecodeError naming the codec. EVERY corruption mode
    surfaces as AvroDecodeError — the exception the reader's
    DROPMALFORMED contract keys on — including the ones that natively
    raise zlib.error (bit-flipped deflate block), JSONDecodeError
    (corrupt schema header), UnicodeDecodeError (non-UTF-8 strings)
    or KeyError/struct.error (schema shape).

    ``zero_width_cap`` bounds how many ZERO-WIDTH values (null / empty
    record / size-0 fixed, incl. array elements) one file may
    materialize — no byte count can falsify a crafted count for those,
    so past the cap the reader raises instead of allocating without
    bound (see _ZERO_WIDTH_CAP). A corpus that legitimately carries
    more (e.g. >100k-element null arrays per file — encode_ocf will
    happily WRITE such files) must raise the cap explicitly; the
    default is the landing-zone posture."""
    try:
        c = _Cursor(buf)
        c.zw_cap = zero_width_cap
        return _decode_ocf(c)
    except AvroDecodeError:
        raise
    except (zlib.error, json.JSONDecodeError, UnicodeDecodeError,
            KeyError, IndexError, struct.error, OverflowError,
            TypeError) as e:
        raise AvroDecodeError(
            f"malformed avro container: {type(e).__name__}: {e}") from e


def _decode_ocf(c: _Cursor) -> tuple[dict, list[dict]]:
    if c.read(4) != MAGIC:
        raise AvroDecodeError("bad magic: not an Avro object-container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(c)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(c)
        for _ in range(n):
            k = _read_bytes(c).decode("utf-8")
            meta[k] = _read_bytes(c)
    sync = c.read(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroDecodeError(
            f"unsupported avro codec {codec!r} (null/deflate implemented; "
            "snappy/zstandard need their python codecs)")
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except KeyError:
        raise AvroDecodeError("header missing avro.schema") from None
    dec = _decoder_of(schema)
    records: list[dict] = []
    zw = 0  # per-file zero-width budget, threaded through block cursors
    while not c.at_end():
        count = _read_long(c)
        size = _read_long(c)
        if count < 0 or size < 0:
            # negative count would silently drop records; negative size
            # is caught by the cursor too, but fail with the block
            # header context here
            raise AvroDecodeError(
                f"corrupt block header: count={count} size={size}")
        block = c.read(size)
        if codec == "deflate":
            block = _inflate_capped(block, size)
        bc = _Cursor(block)
        bc.zw = zw  # zero-width budget is per FILE, not per block
        bc.zw_cap = c.zw_cap
        for _ in range(count):
            before = bc.pos
            records.append(dec(bc))
            if bc.pos == before:
                # zero-width records (schema with no decodable bytes):
                # a crafted count can't be checked against block bytes,
                # so budget it per file — raise, don't loop to OOM (the
                # reader's DROPMALFORMED contract: every corruption
                # RAISES). Per-file, not per-block: many small blocks
                # each claiming a just-under-cap count must trip too.
                bc.zw += 1
                if bc.zw > bc.zw_cap:
                    raise AvroDecodeError(
                        f"{bc.zw} zero-width records accumulated across "
                        f"this file (current block claims {count}) — "
                        f"past the {bc.zw_cap} per-file cap; raise "
                        "zero_width_cap if this degenerate shape is "
                        "legitimate data")
        zw = bc.zw
        if not bc.at_end():
            raise AvroDecodeError(
                f"block decoded {count} records with {len(block) - bc.pos} "
                "bytes left over — schema/data mismatch")
        if c.read(16) != sync:
            raise AvroDecodeError("sync marker mismatch mid-file")
    return schema, records


def _encoder_of(schema) -> Callable[[io.BytesIO, object], None]:
    """Compile a schema into an encode function — the exact mirror of
    _decoder_of, same core-type coverage. Unions encode by FIRST
    MATCHING branch (None → the null branch; anything else → the first
    non-null branch), which covers the nullable-union shape; general
    multi-branch type dispatch is out of scope and raises."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):
        null_i = next((i for i, s in enumerate(schema) if s == "null"), None)
        val_i = next((i for i, s in enumerate(schema) if s != "null"), None)
        if null_i is None or val_i is None or len(schema) != 2:
            raise AvroDecodeError(
                "encoder supports exactly the 2-branch nullable union")
        val_enc = _encoder_of(schema[val_i])

        def enc_union(out: io.BytesIO, v):
            if v is None:
                _write_long(out, null_i)
            else:
                _write_long(out, val_i)
                val_enc(out, v)
        return enc_union
    else:
        raise AvroDecodeError(f"unsupported schema node {schema!r}")

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
    if t == "bytes":
        return _write_bytes
    if t == "string":
        return lambda out, v: _write_bytes(out, v.encode("utf-8"))
    if t == "record":
        fields = [(f["name"], _encoder_of(f["type"]))
                  for f in schema["fields"]]

        def enc_record(out: io.BytesIO, v):
            for name, enc in fields:
                enc(out, v.get(name))
        return enc_record
    if t == "enum":
        index = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda out, v: _write_long(out, index[v])
    if t == "fixed":
        size = schema["size"]

        def enc_fixed(out: io.BytesIO, v):
            if len(v) != size:
                raise AvroDecodeError(f"fixed size {len(v)} != {size}")
            out.write(bytes(v))
        return enc_fixed
    if t == "array":
        item = _encoder_of(schema["items"])

        def enc_array(out: io.BytesIO, v):
            if v:
                _write_long(out, len(v))
                for x in v:
                    item(out, x)
            _write_long(out, 0)
        return enc_array
    if t == "map":
        val = _encoder_of(schema["values"])

        def enc_map(out: io.BytesIO, v):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    _write_bytes(out, k.encode("utf-8"))
                    val(out, x)
            _write_long(out, 0)
        return enc_map
    raise AvroDecodeError(f"unsupported avro type {t!r}")


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_bytes(out: io.BytesIO, v: bytes) -> None:
    _write_long(out, len(v))
    out.write(bytes(v))


def encode_ocf(schema_json: str, records: list[dict],
               codec: str = "deflate", block_records: int = 1000) -> bytes:
    """Encode records into Avro OCF bytes — the pure-Python mirror of
    decode_ocf, used for fixture renders (the JVM writer below is
    row-at-a-time over py4j — correct but slow; this is one pass).
    Independence is preserved in tests, which read these bytes back
    through the JVM avro-core library and compare. The 16-byte sync
    marker derives deterministically from the schema + record count
    (no randomness — reproducible fixtures).

    Note the round-trip asymmetry on DEGENERATE data: this writer will
    happily encode >100k zero-width values into one file, which the
    reader's default ``zero_width_cap`` then refuses — readers of such
    corpora must raise the cap explicitly (decode_ocf docstring)."""
    import hashlib

    schema = json.loads(schema_json)
    enc = _encoder_of(schema)
    if codec not in ("null", "deflate"):
        raise AvroDecodeError(f"unsupported write codec {codec!r}")
    sync = hashlib.md5(
        f"{schema_json}|{len(records)}".encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    for i in range(0, max(len(records), 1), block_records):
        chunk = records[i:i + block_records]
        if not chunk:
            break
        body = io.BytesIO()
        for r in chunk:
            enc(body, r)
        payload = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_avro(spark: SparkSession, path: str, ddl_schema: str,
              path_glob: str = "*.avro",
              mode: str = "FAILFAST",
              zero_width_cap: int = _ZERO_WIDTH_CAP) -> DataFrame:
    """Avro OCF files as a DataFrame: binaryFile scan (per-file tasks)
    → mapInPandas decode. ``ddl_schema`` names the output columns and
    types (explicit schema, like every harvest reader here); fields
    are taken from each record by name, missing fields surface as
    null. Timestamps/decimals ride their base types — cast after.

    ``mode`` mirrors the CSV reader's malformed-input contract at FILE
    granularity (an OCF decode error poisons its whole file — there is
    no later sync point to resync from once the schema or a block is
    bad): FAILFAST (default) raises the AvroDecodeError with the
    source path attached; DROPMALFORMED skips corrupt files and keeps
    the rest of the directory — the landing-zone posture where one
    truncated upload must not stall the feed (pair it with a file-count
    reconciliation downstream, exactly like scan_csv_badrows).

    ``zero_width_cap`` passes through to decode_ocf (see its
    docstring): files legitimately materializing >100k zero-width
    values need it raised explicitly, else they fail FAILFAST / are
    dropped under DROPMALFORMED — the bounded-by-default posture."""
    from pyspark.sql.types import _parse_datatype_string

    if mode not in ("FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"mode must be FAILFAST or DROPMALFORMED, "
                         f"got {mode!r}")
    target = _parse_datatype_string(ddl_schema)
    names = [f.name for f in target.fields]
    drop = mode == "DROPMALFORMED"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, recs = decode_ocf(bytes(content),
                                         zero_width_cap=zero_width_cap)
                except AvroDecodeError as e:
                    if drop:
                        continue
                    raise AvroDecodeError(f"{fpath}: {e}") from e
                yield pd.DataFrame(
                    {n: [r.get(n) for r in recs] for n in names})

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", path_glob).load(path)
             .select("path", "content"))
    return files.mapInPandas(gen, schema=target)


def write_avro_jvm(spark: SparkSession, rows: list[dict],
                   schema_json: str, out_path: str,
                   codec: str | None = None) -> None:
    """Write an OCF file through the JVM avro-core library (the
    independent reference implementation; avro core jars ship with
    pyspark even though the DataSource module does not). Driver-side
    and row-at-a-time over py4j — a FIXTURE/TEST writer for bounded
    data, not a data path; bulk export at scale stays parquet."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    fields = json.loads(schema_json)["fields"]
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    if codec == "deflate":
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    elif codec not in (None, "null"):
        raise ValueError(f"fixture writer supports null/deflate, got {codec}")
    def conv(jschema, v):
        # py4j auto-converts list/dict/str/int; the typed avro values
        # need explicit JVM wrappers: ByteBuffer for bytes, Float for
        # float (py4j sends Python float as Double), EnumSymbol /
        # Fixed for their named types; unions dispatch on null
        t = jschema.getType().getName()
        if t == "union":
            if v is None:
                return None
            branch = next(b for b in jschema.getTypes()
                          if b.getType().getName() != "null")
            return conv(branch, v)
        if t == "bytes":
            return jvm.java.nio.ByteBuffer.wrap(bytes(v))
        if t == "fixed":
            return jvm.org.apache.avro.generic.GenericData.Fixed(
                jschema, bytes(v))
        if t == "enum":
            return jvm.org.apache.avro.generic.GenericData.EnumSymbol(
                jschema, v)
        if t == "float":
            return jvm.java.lang.Float(float(v))
        return v

    jfields = {f["name"]: sch.getField(f["name"]).schema() for f in fields}
    writer.create(sch, jvm.java.io.File(out_path))
    try:
        for row in rows:
            rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
            for f in fields:
                name = f["name"]
                rec.put(name, conv(jfields[name], row.get(name)))
            writer.append(rec)
    finally:
        writer.close()
