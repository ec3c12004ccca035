"""Byte-counting IO wrappers — countio crate parity.

The reference's third crate (`countio`) wraps any reader/writer and
counts bytes flowing through it (countio/counter/mod.rs:14-64,
stdlib impls counter/stdlib.rs:7-42); kit uses it solely to enforce
parse byte limits. Our Ray engine enforces those limits per blob
(kernels/sitemap.py) and accounts payload bytes in lineage manifests;
this module provides the standalone wrapper for API parity and for
callers that stream from real sockets/files.
"""

from __future__ import annotations


class CountingReader:
    """Wraps a binary file-like; counts bytes read (reader_bytes)."""

    def __init__(self, inner):
        self._inner = inner
        self.reader_bytes = 0

    def read(self, n: int = -1) -> bytes:
        data = self._inner.read(n)
        self.reader_bytes += len(data)
        return data

    def readline(self, limit: int = -1) -> bytes:
        data = self._inner.readline(limit)
        self.reader_bytes += len(data)
        return data

    def get_ref(self):
        return self._inner

    def into_inner(self):
        return self._inner


class CountingWriter:
    """Wraps a binary file-like; counts bytes written (writer_bytes)."""

    def __init__(self, inner):
        self._inner = inner
        self.writer_bytes = 0

    def write(self, data: bytes) -> int:
        n = self._inner.write(data)
        self.writer_bytes += n if n is not None else len(data)
        return n if n is not None else len(data)

    def flush(self):
        self._inner.flush()

    def get_ref(self):
        return self._inner

    def into_inner(self):
        return self._inner
