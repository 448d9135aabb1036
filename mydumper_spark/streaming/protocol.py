"""The reference's stream wire protocol (SURVEY §2.8 ST1/ST2, K7).

mydumper --stream frames each finished file onto stdout as:

    \\n-- <filename> <size>\\n<size bytes>

(/root/reference/src/mydumper/mydumper_stream.c:80-157); myloader parses the
frames back into files (src/myloader/myloader_stream.c). We keep this exact
framing as an interop surface — a mydumper_spark dump can be piped into a
consumer expecting the reference protocol, and vice versa. Spark-side
transport uses the landing-dir streaming in streaming/stream.py; this module
is the byte-level compatibility layer.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import BinaryIO

HEADER_PREFIX = b"\n-- "


def write_frame(out: BinaryIO, filename: str, payload: bytes) -> None:
    """ST1 producer framing (metadata checksum line format
    mydumper_stream.c:100-110: '\\n-- filename size')."""
    out.write(HEADER_PREFIX + filename.encode() + b" " + str(len(payload)).encode() + b"\n")
    out.write(payload)


def stream_directory(out: BinaryIO, root: str, delete: bool = False,
                     exclude: "set[str] | None" = None) -> int:
    """Frame every file under root (sorted, metadata last like the
    reference's final-metadata ordering). ``exclude`` skips files already
    framed by the per-table overlap path (absolute paths) — the post-dump
    sweep then carries only the dump-wide artifacts (schema DDL, objects,
    profile, manifest). Returns file count."""
    skip = {os.path.abspath(p) for p in (exclude or ())}
    names = sorted(
        (p for p in (os.path.join(dp, f)
                     for dp, _, fs in os.walk(root) for f in fs)
         if os.path.abspath(p) not in skip),
        key=lambda p: (os.path.basename(p).startswith("_"), p),
    )
    for path in names:
        with open(path, "rb") as f:
            payload = f.read()
        write_frame(out, os.path.relpath(path, root), payload)
        if delete:  # --stream default deletes after send (NO_DELETE to keep)
            os.remove(path)
    return len(names)


def read_frames(inp: BinaryIO) -> Iterator[tuple[str, bytes]]:
    """ST2 consumer: parse frames back into (relative filename, payload)."""
    buf = inp.read()
    pos = 0
    while pos < len(buf):
        if not buf.startswith(HEADER_PREFIX, pos):
            raise ValueError(f"bad frame header at offset {pos}")
        eol = buf.index(b"\n", pos + len(HEADER_PREFIX))
        header = buf[pos + len(HEADER_PREFIX): eol].decode()
        filename, size_s = header.rsplit(" ", 1)
        size = int(size_s)
        start = eol + 1
        yield filename, buf[start: start + size]
        pos = start + size


def restore_directory(inp: BinaryIO, root: str) -> int:
    """Materialize a framed stream back into a directory tree."""
    n = 0
    for filename, payload in read_frames(inp):
        path = os.path.join(root, filename)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(payload)
        n += 1
    return n
