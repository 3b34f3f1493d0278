"""ustar reader/writer: round-trips, stdlib cross-validation in
BOTH directions, name+prefix split, typed quarantines.  The
driver-checkable twin is source_webdataset_tar."""

import io
import tarfile

import pytest

from parquet_to_sql_spark.operators.tar import (
    TarFormatError,
    tar_build,
    tar_members,
)

_MEMBERS = [
    ("00000001.txt", b"hello world"),
    ("00000001.png", bytes(range(100))),
    ("sub/dir/00000002.txt", b"x" * 513),  # content needs padding
    ("a" * 90 + "/" + "b" * 60 + ".bin", b"deep"),  # prefix split
    ("empty.bin", b""),
]


def test_roundtrip_and_stdlib_cross_validation():
    """Our writer's output parses identically under the stdlib
    ``tarfile`` module, and a stdlib-written USTAR archive parses
    identically under OUR reader — independent framing evidence in
    both directions (no self-certification)."""
    pay = tar_build(_MEMBERS)
    assert [
        (m["name"], m["content"]) for m in tar_members(pay)
    ] == _MEMBERS
    tf = tarfile.open(fileobj=io.BytesIO(pay))
    assert [
        (ti.name, tf.extractfile(ti).read()) for ti in tf
    ] == _MEMBERS
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as out:
        for name, content in _MEMBERS:
            ti = tarfile.TarInfo(name)
            ti.size = len(content)
            ti.mtime = 0
            out.addfile(ti, io.BytesIO(content))
    ours = [
        (m["name"], m["content"])
        for m in tar_members(buf.getvalue())
        if m["typeflag"] == "0"
    ]
    assert ours == _MEMBERS


def test_directories_and_non_regular_members_reported():
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as out:
        d = tarfile.TarInfo("adir/")
        d.type = tarfile.DIRTYPE
        d.mtime = 0
        out.addfile(d)
        f = tarfile.TarInfo("adir/file.txt")
        f.size = 3
        f.mtime = 0
        out.addfile(f, io.BytesIO(b"abc"))
    ms = tar_members(buf.getvalue())
    assert [(m["name"], m["typeflag"], m["content"]) for m in ms] == [
        ("adir/", "5", None), ("adir/file.txt", "0", b"abc"),
    ]


def test_quarantines_are_typed():
    pay = tar_build(_MEMBERS)
    corrupt = bytearray(pay)
    corrupt[130] ^= 1  # size field byte
    with pytest.raises(TarFormatError, match="checksum"):
        tar_members(bytes(corrupt))
    with pytest.raises(TarFormatError, match="terminator"):
        tar_members(pay[:700])
    with pytest.raises(TarFormatError, match="bad octal"):
        bad = bytearray(pay)
        bad[124:136] = b"zzzzzzzzzzz\x00"
        tar_members(bytes(bad))
    with pytest.raises(TarFormatError, match="name too long"):
        tar_build([("x" * 120, b"")])  # no slash to split on
