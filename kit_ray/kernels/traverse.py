"""Sitemap traversal drive loop — the executable reference semantics.

Reimplements ``AutoParser::try_sync`` (/root/reference/inclusion/parse/
auto.rs:114-211) as a pure-Python generator over in-memory blobs:

- the pending sitemap list is a LIFO stack (``Vec::pop``, auto.rs:199);
- a fetched blob is sniffed by its root tag (auto.rs:200-204);
- an index record is expanded by immediately fetching the child and
  replacing the active slot (auto.rs:186-197);
- a child that is itself an index is DROPPED — one level of index
  expansion only (auto.rs:190-193);
- fetch errors and malformed sitemaps are silently skipped
  (auto.rs:163, ``Scanner::from_sync(..).ok()``);
- record/byte limits truncate a sitemap, keeping records already
  emitted (LimitError from the parse kernels).

Deliberate divergence, pinned by tests: the reference's entry/index
arms ``take()`` the PLAIN slot on EOF (auto.rs:183,196 — an upstream
bug that loops forever when the last active parser is an entry parser).
We implement the evident intent: each arm clears its OWN slot on EOF.
SURVEY.md §3.2 documents this contract.

This kernel is used both by the single-process oracle
(kit_ray/oracle.py) and by the per-host Ray traversal stage — per-host
traversal is inherently sequential in the protocol (LIFO order +
politeness); the engine's parallelism is ACROSS hosts.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from .sitemap import (
    Entry,
    LimitError,
    parse_plain,
    parse_sitemapindex,
    parse_urlset,
    sniff_format,
)
from .urlkit import Url

# fetcher: Url -> bytes | None (None == fetch error -> sitemap skipped).
Fetcher = Callable[[Url], Optional[bytes]]


class TraversalEntry:
    """An Entry plus its deterministic order key within one host's
    traversal: (stack_rank, pos).

    ``stack_rank`` increments every time a sitemap blob starts being
    consumed (in traversal order); ``pos`` is the record's document
    order within that blob. Sorting all emitted entries by
    (stack_rank, pos) reproduces the reference's emission order exactly.
    """

    __slots__ = ("entry", "source_sitemap", "stack_rank", "pos")

    def __init__(self, entry: Entry, source_sitemap: str, stack_rank: int, pos: int):
        self.entry = entry
        self.source_sitemap = source_sitemap
        self.stack_rank = stack_rank
        self.pos = pos


def _iter_records(fmt: str, blob: bytes) -> Iterator[Entry]:
    """Entries of one sitemap blob in document order; limit truncation
    keeps the already-emitted prefix (auto.rs:163 skip-on-error)."""
    try:
        if fmt == "plain":
            for url in parse_plain(blob):
                yield Entry(url)  # Url -> Entry (url only), auto.rs:170-176
        elif fmt == "entry":
            yield from parse_urlset(blob)
    except LimitError:
        return


def traverse_host(
    sitemaps: list[Url],
    fetcher: Fetcher,
    max_sitemaps: int = 10_000,
) -> Iterator[TraversalEntry]:
    """Drive the sitemap stack of one host, yielding entries in the
    reference traversal order.

    ``sitemaps`` is the robots.txt-provided list in document order; the
    reference pops from the END (LIFO), so the LAST ``Sitemap:`` line is
    traversed first. ``max_sitemaps`` bounds runaway corpora (the
    reference has no such cap; the cap is ours and is far above any real
    host's sitemap count).
    """
    stack = list(sitemaps)
    stack_rank = 0
    fetched = 0

    while stack:
        sitemap_url = stack.pop()  # LIFO (auto.rs:199)
        if fetched >= max_sitemaps:
            return
        fetched += 1
        blob = fetcher(sitemap_url)
        if blob is None:
            continue  # fetch error -> skipped (auto.rs:163)
        fmt = sniff_format(blob)

        if fmt in ("plain", "entry"):
            stack_rank += 1
            rank = stack_rank
            for pos, rec in enumerate(_iter_records(fmt, blob)):
                yield TraversalEntry(rec, str(sitemap_url), rank, pos)
            continue

        # Index: expand each child immediately, one level only
        # (auto.rs:186-197). Children are processed in document order —
        # the reference fetches each child as soon as its record is read.
        try:
            children = list(parse_sitemapindex(blob))
        except LimitError:
            children = []
        for child in children:
            if fetched >= max_sitemaps:
                return
            fetched += 1
            child_blob = fetcher(child.location)
            if child_blob is None:
                continue
            child_fmt = sniff_format(child_blob)
            if child_fmt == "index":
                continue  # nested index dropped (auto.rs:190-193)
            stack_rank += 1
            rank = stack_rank
            for pos, rec in enumerate(_iter_records(child_fmt, child_blob)):
                yield TraversalEntry(rec, str(child.location), rank, pos)

    return
