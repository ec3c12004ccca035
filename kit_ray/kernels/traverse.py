"""Sitemap traversal drive loop — the executable reference semantics.

Reimplements ``AutoParser::try_sync`` (/root/reference/inclusion/parse/
auto.rs:114-211) as a pure-Python generator over in-memory blobs:

- the pending sitemap list is a LIFO stack (``Vec::pop``, auto.rs:199);
- a fetched blob is sniffed by its root tag (auto.rs:200-204);
- an index record is expanded by fetching the child and parsing it in
  place (auto.rs:186-197);
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

Order key: each emitted entry carries ``(stack_rank, pos)`` where

    stack_rank = root_order * 2^20 + child_slot
    root_order = LIFO pop sequence of the robots-listed sitemap (the
                 LAST ``Sitemap:`` line is root_order 0, auto.rs:199)
    child_slot = 0 for a plain/urlset root; 1 + the child record's
                 document position within a sitemapindex (dropped or
                 failed children keep their slot — the key depends only
                 on the LISTINGS, never on fetch outcomes)
    pos        = record document order within the blob

Sorting by ``(stack_rank, pos)`` reproduces the reference's sequential
emission order exactly, while allowing the engine to fetch+parse leaf
sitemaps in PARALLEL (the skew-resilient two-phase traversal in
stages/crawl_stages.py) — the listing-only rank is what makes the
parallel schedule order-equivalent to the sequential drive loop.
2^20 bounds child count per index (real cap is 50,000 records).

This kernel is the sequential form, used by the oracle and by
single-host callers; the Ray engine's two-phase expansion must produce
the identical (stack_rank, pos)-keyed set (pinned by tests).
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

RANK_STRIDE = 1 << 20  # max child slots per index (record cap is 50k)


class TraversalEntry:
    """An Entry plus its deterministic order key (see module docstring)."""

    __slots__ = ("entry", "source_sitemap", "stack_rank", "pos")

    def __init__(self, entry: Entry, source_sitemap: str, stack_rank: int, pos: int):
        self.entry = entry
        self.source_sitemap = source_sitemap
        self.stack_rank = stack_rank
        self.pos = pos


def iter_leaf_records(fmt: str, blob: bytes) -> Iterator[Entry]:
    """Entries of one leaf sitemap blob in document order; limit
    truncation keeps the already-emitted prefix (auto.rs:163)."""
    try:
        if fmt == "plain":
            for url in parse_plain(blob):
                yield Entry(url)  # Url -> Entry (url only), auto.rs:170-176
        elif fmt == "entry":
            yield from parse_urlset(blob)
    except LimitError:
        return


def expand_sitemaps(
    sitemaps: list[Url], fetcher: Fetcher, max_sitemaps: int = 100_000
):
    """Phase A of traversal: resolve the LIFO root list into LEAF work
    items ``(leaf_url, stack_rank, blob_or_None, child_of_index)``.

    Roots are fetched and sniffed here (their blob rides along so it is
    fetched once); an index root contributes its children as unfetched
    leaves — a child's format is unknown until its own fetch, so the
    nested-index drop (auto.rs:190-193) happens at parse time.
    """
    fetched = 0
    for root_order, sitemap_url in enumerate(reversed(sitemaps)):  # LIFO
        if fetched >= max_sitemaps:
            return
        fetched += 1
        blob = fetcher(sitemap_url)
        if blob is None:
            continue  # fetch error -> skipped (auto.rs:163)
        fmt = sniff_format(blob)
        base = root_order * RANK_STRIDE
        if fmt in ("plain", "entry"):
            yield (sitemap_url, base, blob, False)
            continue
        # Iterate-and-catch so a record/byte limit keeps the prefix of
        # children already parsed — the reference emits each record as
        # read and only fails on the NEXT read once over the cap
        # (inclusion/parse/mod.rs:44-57).
        slot = 0
        try:
            for child in parse_sitemapindex(blob):
                slot += 1
                yield (child.location, base + slot, None, True)
        except LimitError:
            pass


def traverse_host(
    sitemaps: list[Url],
    fetcher: Fetcher,
    max_sitemaps: int = 100_000,
) -> Iterator[TraversalEntry]:
    """Sequential drive of one host's sitemap list, yielding entries in
    the reference traversal order with their (stack_rank, pos) keys."""
    fetched = 0
    for leaf_url, rank, blob, child_of_index in expand_sitemaps(
        sitemaps, fetcher, max_sitemaps
    ):
        if blob is None:
            if fetched >= max_sitemaps:
                return
            fetched += 1
            blob = fetcher(leaf_url)
            if blob is None:
                continue
        fmt = sniff_format(blob)
        if fmt == "index":
            continue  # nested index dropped (auto.rs:190-193)
        for pos, rec in enumerate(iter_leaf_records(fmt, blob)):
            yield TraversalEntry(rec, str(leaf_url), rank, pos)
