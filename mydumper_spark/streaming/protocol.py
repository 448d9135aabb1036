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

    def _rank(p: str) -> int:
        # data files first, then manifests/partials, then the FINAL
        # 'metadata' file dead last — the reference consumer treats its
        # arrival as the dump-complete signal (mydumper_stream.c final-
        # metadata ordering), so framing it mid-stream (it sorts before
        # 'zdb.*' alphabetically) would let the consumer finalize early
        base = os.path.basename(p)
        if base == "metadata":
            return 2
        if base.startswith("_") or base.startswith("metadata."):
            return 1
        return 0

    names = sorted(
        (p for p in (os.path.join(dp, f)
                     for dp, _, fs in os.walk(root) for f in fs)
         if os.path.abspath(p) not in skip),
        key=lambda p: (_rank(p), p),
    )
    for path in names:
        with open(path, "rb") as f:
            payload = f.read()
        write_frame(out, os.path.relpath(path, root), payload)
        if delete:  # --stream default deletes after send (NO_DELETE to keep)
            os.remove(path)
    return len(names)


def read_frames(inp: BinaryIO) -> Iterator[tuple[str, bytes]]:
    """ST2 consumer: parse frames back into (relative filename, payload).

    INCREMENTAL: each frame yields as soon as its bytes arrive — restore
    genuinely overlaps the producer's dump (the protocol's whole point)
    and memory stays O(largest single file), never O(whole stream);
    slurping the pipe would both serialize the pipeline behind producer
    EOF and OOM on dumps larger than driver RAM."""

    def _read_exact(n: int) -> bytes:
        chunks = []
        got = 0
        while got < n:
            b = inp.read(n - got)
            if not b:
                raise ValueError(
                    f"truncated frame payload ({got} of {n} bytes)")
            chunks.append(b)
            got += len(b)
        return b"".join(chunks)

    while True:
        lead = inp.read(len(HEADER_PREFIX))
        if not lead:
            return
        if lead != HEADER_PREFIX:
            raise ValueError(f"bad frame header {lead!r}")
        hdr = bytearray()
        while True:  # headers are tiny (one path + one size)
            c = inp.read(1)
            if not c:
                raise ValueError("truncated frame header")
            if c == b"\n":
                break
            hdr += c
        filename, size_s = hdr.decode().rsplit(" ", 1)
        yield filename, _read_exact(int(size_s))


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
