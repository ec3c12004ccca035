"""Sitemap parsing / building — bit-match reimplementation of sitemapo.

From-scratch Python reimplementation of the ``sitemapo`` crate's record
semantics (spire-rs/kit ``inclusion``), as pure per-blob kernels used
inside Ray ``map_batches`` stages. Pinned behaviors:

- record types Entry/Index ........... /root/reference/inclusion/record/entry.rs:19-24, index.rs:15-18
- limits (50k records / 50 MB / 64 KiB URL) ... /root/reference/inclusion/record/mod.rs:13-22,
  enforced /root/reference/inclusion/parse/mod.rs:44-57
- XML path-stack field dispatch ....... /root/reference/inclusion/parse/inner.rs:61-108
  (record tag matched case-insensitively; field paths case-SENSITIVELY)
- urlset field mapping ................ /root/reference/inclusion/parse/entry.rs:100-115
- sitemapindex field mapping .......... /root/reference/inclusion/parse/index.rs:75-86
- plain TXT: one URL per line, bad lines skipped ... /root/reference/inclusion/parse/plain.rs:66-83
- format sniffing (root tag) .......... /root/reference/inclusion/parse/auto.rs:22-48; the
  scanner seeds the parser's path with the LOWERCASE root constant
  (auto.rs:38-46), so mixed-case roots still yield fields.
- lenient Frequency/Priority parse .... /root/reference/inclusion/record/frequency.rs:42-56,
  priority.rs:60-63 (invalid -> None, range-checked [0,1])
- recrawl arithmetic .................. /root/reference/inclusion/record/frequency.rs:69-100
- XML building (BOM + decl + xmlns; loc,lastmod,priority,changefreq
  order; ISO-8601 with 2-decimal seconds) ... /root/reference/inclusion/build/inner.rs:9-13,46-74,
  entry.rs:77-119, index.rs, plain.rs

TXT auto-detection is a TODO in the reference (auto.rs:9); we implement
the intended behavior: a blob with no XML root tag is treated as plain.
"""

from __future__ import annotations

import re
import xml.parsers.expat
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Iterator, Optional

from .urlkit import Url, try_parse

RECORD_LIMIT = 50_000  # record/mod.rs:13
BYTE_LIMIT = 52_428_800  # record/mod.rs:17
URL_LEN_LIMIT = 65_536  # record/mod.rs:22

LOCATION, LAST_MODIFIED, CHANGE_FREQUENCY, PRIORITY = "loc", "lastmod", "changefreq", "priority"
URL_SET, URL_TAG = "urlset", "url"
SITEMAP_INDEX, SITEMAP_TAG = "sitemapindex", "sitemap"

FREQUENCIES = ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")


class LimitError(Exception):
    """Record/byte cap exceeded — callers treat this as end-of-sitemap
    (records already emitted stand; the parser is dropped,
    auto.rs:163)."""


# ---------------------------------------------------------------------------
# Scalar field parsers
# ---------------------------------------------------------------------------

_ISO_RE = re.compile(
    # The time-crate Iso8601::PARSING grammar requires the 'T'
    # date/time separator but allows reduced precision: components
    # after the hour and their separators may be omitted, with a
    # missing second defaulting to 0 (entry.rs:109; time crate
    # Parsed->Time conversion). A space separator must NOT parse.
    r"^\s*(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?"
    r"(Z|z|[+-]\d{2}(?::?\d{2})?)\s*$"
)


def iso8601_parse(text: str) -> Optional[datetime]:
    """Lenient ISO-8601 -> aware UTC datetime; None on failure.

    Mirrors ``OffsetDateTime::parse(text, &Iso8601::PARSING).ok()``
    (entry.rs:109): date, time and offset are all required — a bare
    date like ``2022-06-04`` does NOT parse (the field is dropped).
    """
    m = _ISO_RE.match(text)
    if not m:
        return None
    y, mo, d, h, mi = (int(m.group(i)) for i in range(1, 6))
    s = int(m.group(6) or 0)
    frac = m.group(7) or ""
    micros = int((frac + "000000")[:6]) if frac else 0
    off = m.group(8)
    if off in ("Z", "z"):
        delta = timedelta(0)
    else:
        sign = 1 if off[0] == "+" else -1
        hh = int(off[1:3])
        mm = int(off[3:].replace(":", "") or 0)
        delta = sign * timedelta(hours=hh, minutes=mm)
    try:
        dt = datetime(y, mo, d, h, mi, s, micros, tzinfo=timezone.utc)
    except ValueError:
        return None
    return dt - delta


def iso8601_format(dt: datetime) -> str:
    """ISO-8601 with exactly 2 decimal second digits and a ±hh:mm offset,
    as the reference's builder emits (build/inner.rs:9-13)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    dt = dt.astimezone(timezone.utc)
    frac = dt.microsecond // 10_000
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{frac:02d}+00:00"


def frequency_parse(text: str) -> Optional[str]:
    """Frequency::parse (frequency.rs:42-56): trim + lowercase, enum or
    None."""
    t = text.strip().lower()
    return t if t in FREQUENCIES else None


def frequency_next_date(freq: str, date: datetime) -> Optional[datetime]:
    # frequency.rs:69-79 (hour / day / 7d / 30d / 365d).
    return {
        "always": None,
        "never": None,
        "hourly": date + timedelta(hours=1),
        "daily": date + timedelta(days=1),
        "weekly": date + timedelta(days=7),
        "monthly": date + timedelta(days=30),
        "yearly": date + timedelta(days=365),
    }[freq]


def frequency_is_outdated(freq: str, date: datetime, now: datetime) -> bool:
    # frequency.rs:91-100.
    if freq == "always":
        return True
    if freq == "never":
        return False
    return frequency_next_date(freq, date) <= now


_F32_RE = re.compile(
    r"^[+-]?(?:inf|infinity|nan|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)$", re.IGNORECASE
)


def priority_parse(text: str) -> Optional[float]:
    """Priority::parse (priority.rs:60-63): f32 parse + [0,1] range check
    (NOT clamped — out of range is dropped, entry.rs:111)."""
    import struct

    if not _F32_RE.match(text):
        return None
    try:
        v = float(text)
    except ValueError:
        return None
    v32 = struct.unpack("f", struct.pack("f", v))[0]  # f32 round-trip
    if not (0.0 <= v32 <= 1.0):
        return None
    return v32


def priority_clamp(v: float) -> float:
    # Priority::new_fallback (priority.rs:48-50).
    return max(0.0, min(1.0, v))


def priority_display(v: float) -> str:
    # "{:.1}" (priority.rs:86-90).
    return f"{v:.1f}"


# ---------------------------------------------------------------------------
# Records
# ---------------------------------------------------------------------------

@dataclass
class Entry:
    """A <urlset> record (record/entry.rs:19-24)."""

    location: Url
    modified: Optional[datetime] = None
    priority: Optional[float] = None
    frequency: Optional[str] = None


@dataclass
class IndexRecord:
    """A <sitemapindex> record (record/index.rs:15-18)."""

    location: Url
    modified: Optional[datetime] = None


# ---------------------------------------------------------------------------
# XML event-stream parsing (path-stack dispatch, inner.rs:61-108)
# ---------------------------------------------------------------------------

class _XmlEvents:
    """Streaming expat wrapper yielding ('start'|'text'|'end', value)
    events with text coalesced between tags, like quick_xml."""

    def __init__(self, data: bytes):
        self.events: list[tuple[str, str]] = []
        self.error = False
        p = xml.parsers.expat.ParserCreate()  # namespaces OFF: raw tag names
        p.buffer_text = True  # coalesce character data
        p.StartElementHandler = lambda name, attrs: self.events.append(("start", name))
        p.EndElementHandler = lambda name: self.events.append(("end", name))
        p.CharacterDataHandler = lambda text: self._text(text)
        try:
            p.Parse(data, True)
        except xml.parsers.expat.ExpatError:
            self.error = True  # events up to the error stand

    def _text(self, text: str):
        if self.events and self.events[-1][0] == "text":
            self.events[-1] = ("text", self.events[-1][1] + text)
        else:
            self.events.append(("text", text))


def _build_entry(rec: dict) -> Optional[Entry]:
    loc = try_parse(rec.get(LOCATION, ""))
    if loc is None:
        return None  # records without a parseable <loc> are dropped
    e = Entry(loc)
    if LAST_MODIFIED in rec:
        e.modified = iso8601_parse(rec[LAST_MODIFIED])
    if CHANGE_FREQUENCY in rec:
        e.frequency = frequency_parse(rec[CHANGE_FREQUENCY])
    if PRIORITY in rec:
        e.priority = priority_parse(rec[PRIORITY])
    return e


def parse_urlset(data: bytes) -> Iterator[Entry]:
    """Parse a <urlset> XML blob into Entry records.

    Field dispatch is by CASE-SENSITIVE path equality against the static
    lowercase paths (entry.rs:100-115); the record tag itself matches
    case-insensitively (inner.rs:68-74). The root element name is
    lowercase-normalized on push, mirroring the Scanner's lowercase path
    seeding (auto.rs:38-46).
    """
    fields = {
        (URL_SET, URL_TAG, LOCATION): LOCATION,
        (URL_SET, URL_TAG, LAST_MODIFIED): LAST_MODIFIED,
        (URL_SET, URL_TAG, CHANGE_FREQUENCY): CHANGE_FREQUENCY,
        (URL_SET, URL_TAG, PRIORITY): PRIORITY,
    }
    for rec in _parse_records_root_normalized(data, URL_SET, URL_TAG, fields):
        e = _build_entry(rec)
        if e is not None:
            yield e


def parse_sitemapindex(data: bytes) -> Iterator[IndexRecord]:
    """Parse a <sitemapindex> XML blob into IndexRecord records."""
    fields = {
        (SITEMAP_INDEX, SITEMAP_TAG, LOCATION): LOCATION,
        (SITEMAP_INDEX, SITEMAP_TAG, LAST_MODIFIED): LAST_MODIFIED,
    }
    for rec in _parse_records_root_normalized(data, SITEMAP_INDEX, SITEMAP_TAG, fields):
        loc = try_parse(rec.get(LOCATION, ""))
        if loc is None:
            continue
        r = IndexRecord(loc)
        if LAST_MODIFIED in rec:
            r.modified = iso8601_parse(rec[LAST_MODIFIED])
        yield r


def _parse_records_root_normalized(data, root_tag, record_tag, fields):
    """Like _parse_records but lowercases the ROOT element's name, mirroring
    the Scanner's lowercase path seeding (auto.rs:38-46)."""
    if len(data) > BYTE_LIMIT:
        data = data[:BYTE_LIMIT]
        truncated = True
    else:
        truncated = False

    ev = _XmlEvents(data)
    path: list[str] = []
    record: dict | None = None
    records = 0
    for kind, value in ev.events:
        if kind == "start":
            if not path and value.lower() == root_tag:
                value = root_tag  # scanner seeds the lowercase constant
            if value.lower() == record_tag:
                # Reference parity (inner.rs try_if_readable): records is
                # incremented on the record's Start tag and the
                # ``records + 1 > RECORD_LIMIT`` guard fails BEFORE that
                # record's content is read, so the XML parsers emit at
                # most RECORD_LIMIT - 1 records — the in-flight record at
                # the limit is discarded. (parse_plain counts after
                # read_line and differs deliberately, plain.rs:77.)
                if records + 2 > RECORD_LIMIT:
                    raise LimitError(f"record limit: {RECORD_LIMIT}")
                records += 1
                record = {}
            path.append(value)
        elif kind == "text":
            if record is not None:
                f = fields.get(tuple(path))
                if f is not None:
                    record[f] = value
        elif kind == "end":
            if path:
                path.pop()
            if value.lower() == record_tag and record is not None:
                yield record
                record = None
    if record is not None:
        yield record
    if truncated:
        raise LimitError(f"byte limit: {BYTE_LIMIT}")


def parse_plain(data: bytes) -> Iterator[Url]:
    """TXT sitemap: one URL per line; unparsable lines skipped; caps
    enforced (plain.rs:66-83). Line count (valid or not) feeds the
    record limit, matching ``records += 1`` before the parse attempt."""
    if len(data) > BYTE_LIMIT:
        data = data[:BYTE_LIMIT]
        truncated = True
    else:
        truncated = False
    records = 0
    for raw in data.splitlines():
        if records + 1 > RECORD_LIMIT:
            raise LimitError(f"record limit: {RECORD_LIMIT}")
        records += 1
        try:
            line = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        u = try_parse(line)
        if u is not None:
            yield u
    if truncated:
        raise LimitError(f"byte limit: {BYTE_LIMIT}")


# ---------------------------------------------------------------------------
# Format sniffing (auto.rs:10-65)
# ---------------------------------------------------------------------------

_ROOT_TAG_RE = re.compile(rb"<\s*([A-Za-z][\w:.\-]*)")


def sniff_format(data: bytes) -> str:
    """Return 'index' | 'entry' | 'plain'.

    The reference scans XML events until the first Start tag:
    ``sitemapindex`` -> index, ``urlset`` -> entry (case-insensitive,
    auto.rs:22-33). Anything else (incl. TXT — a TODO upstream,
    auto.rs:9) is treated as plain here.
    """
    data = data[:BYTE_LIMIT]
    ev = _XmlEvents(data)
    for kind, value in ev.events:
        if kind == "start":
            v = value.lower()
            if v == SITEMAP_INDEX:
                return "index"
            if v == URL_SET:
                return "entry"
            return "plain"  # XML but not a sitemap root
    return "plain"


# ---------------------------------------------------------------------------
# Builders (round-trip fixtures; build/entry.rs, build/index.rs, build/plain.rs)
# ---------------------------------------------------------------------------

_XML_OPEN = (
    "\ufeff"  # BOM (write_bom, build/inner.rs:48)
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
)


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_urlset(entries: list[Entry]) -> bytes:
    """Serialize entries as the reference's EntryBuilder does: BOM + decl
    + xmlns root; per record <url><loc/><lastmod/><priority/><changefreq/>
    — note priority BEFORE changefreq (build/entry.rs:94-107). Raises
    LimitError past 50,000 records."""
    if len(entries) > RECORD_LIMIT:
        raise LimitError(f"record limit: {RECORD_LIMIT}")
    parts = [_XML_OPEN.format(tag=URL_SET)]
    for e in entries:
        inner = f"<{LOCATION}>{_escape_text(str(e.location))}</{LOCATION}>"
        if e.modified is not None:
            inner += f"<{LAST_MODIFIED}>{iso8601_format(e.modified)}</{LAST_MODIFIED}>"
        if e.priority is not None:
            inner += f"<{PRIORITY}>{priority_display(e.priority)}</{PRIORITY}>"
        if e.frequency is not None:
            inner += f"<{CHANGE_FREQUENCY}>{e.frequency}</{CHANGE_FREQUENCY}>"
        rec = f"<{URL_TAG}>{inner}</{URL_TAG}>"
        if len(rec.encode()) > BYTE_LIMIT:
            raise LimitError(f"byte limit: {BYTE_LIMIT}")
        parts.append(rec)
    parts.append(f"</{URL_SET}>")
    return "".join(parts).encode("utf-8")


def build_sitemapindex(records: list[IndexRecord]) -> bytes:
    """Serialize a <sitemapindex> (build/index.rs)."""
    if len(records) > RECORD_LIMIT:
        raise LimitError(f"record limit: {RECORD_LIMIT}")
    parts = [_XML_OPEN.format(tag=SITEMAP_INDEX)]
    for r in records:
        inner = f"<{LOCATION}>{_escape_text(str(r.location))}</{LOCATION}>"
        if r.modified is not None:
            inner += f"<{LAST_MODIFIED}>{iso8601_format(r.modified)}</{LAST_MODIFIED}>"
        parts.append(f"<{SITEMAP_TAG}>{inner}</{SITEMAP_TAG}>")
    parts.append(f"</{SITEMAP_INDEX}>")
    return "".join(parts).encode("utf-8")


def build_plain(urls: list[Url]) -> bytes:
    """TXT sitemap builder (build/plain.rs): one URL per line; enforces
    the 64 KiB URL length cap and record/byte limits."""
    if len(urls) > RECORD_LIMIT:
        raise LimitError(f"record limit: {RECORD_LIMIT}")
    lines = []
    for u in urls:
        s = str(u)
        if len(s.encode()) > URL_LEN_LIMIT:
            raise LimitError(f"url length limit: {URL_LEN_LIMIT}")
        lines.append(s)
    out = "\n".join(lines).encode("utf-8")
    if len(out) > BYTE_LIMIT:
        raise LimitError(f"byte limit: {BYTE_LIMIT}")
    return out
