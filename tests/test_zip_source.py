"""Hand-parsed ZIP reader/writer: round-trips, stdlib
cross-validation in BOTH directions (including a trailing archive
comment over the EOCD backward scan), typed quarantines.  The
driver-checkable twin is source_zip_documents."""

import io
import zipfile

import pytest

from parquet_to_sql_spark.operators.zip import (
    ZipFormatError,
    zip_build,
    zip_entries,
    zip_extract,
)

_MEMBERS = [
    ("a.txt", b"hello " * 50, "deflate"),
    ("img/b.bin", bytes(range(256)), "store"),
    ("empty", b"", "store"),
]


def test_roundtrip_and_stdlib_cross_validation():
    pay = zip_build(_MEMBERS)
    es = zip_entries(pay)
    assert [(e["name"], e["method"], e["size"]) for e in es] == [
        (n, m, len(c)) for n, c, m in _MEMBERS
    ]
    for e, (n, c, m) in zip(es, _MEMBERS):
        assert zip_extract(pay, e) == c
    zf = zipfile.ZipFile(io.BytesIO(pay))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == [
        (n, c) for n, c, m in _MEMBERS
    ]
    # stdlib-written archive WITH a trailing comment: the EOCD
    # backward scan must find the real record
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
        for n, c, m in _MEMBERS:
            out.writestr(n, c)
        out.comment = b"trailing archive comment here"
    data = buf.getvalue()
    assert [
        (e["name"], zip_extract(data, e)) for e in zip_entries(data)
    ] == [(n, c) for n, c, m in _MEMBERS]


def test_quarantines_are_typed():
    pay = zip_build(_MEMBERS)
    es = zip_entries(pay)
    nosig = bytearray(pay)
    i = pay.rfind(b"PK\x05\x06")
    nosig[i : i + 4] = b"PKxx"
    with pytest.raises(ZipFormatError, match="end-of-central"):
        zip_entries(bytes(nosig))
    crc = bytearray(pay)
    crc[es[0]["offset"] + 40] ^= 0xFF  # a payload byte
    with pytest.raises(ZipFormatError, match="CRC-32"):
        zip_extract(bytes(crc), es[0])
    # encrypted flag on the first CD entry
    enc = bytearray(pay)
    cd = pay.find(b"PK\x01\x02")
    enc[cd + 8] |= 0x01
    with pytest.raises(ZipFormatError, match="encrypted"):
        zip_entries(bytes(enc))
    # unsupported method code
    meth = bytearray(pay)
    meth[cd + 10] = 99
    with pytest.raises(ZipFormatError, match="method"):
        zip_entries(bytes(meth))
    with pytest.raises(ZipFormatError, match="too short"):
        zip_entries(b"PK")
    # bad local signature
    badloc = bytearray(pay)
    badloc[es[1]["offset"]] ^= 0xFF
    with pytest.raises(ZipFormatError, match="local-header"):
        zip_extract(bytes(badloc), es[1])
