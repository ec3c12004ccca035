"""Differential fuzz of the sitemap XML parsers against
xml.etree.ElementTree — an INDEPENDENT parser, so a shared builder+
parser bug (which the round-trip fuzz in test_fuzz.py cannot see)
shows up as a mismatch. Covers escaping (&<>'\"), optional fields,
field order, and the index variant; documents built both by our
builder and by hand-assembled XML with whitespace quirks.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from kit_ray.kernels.sitemap import (
    build_sitemapindex,
    build_urlset,
    Entry,
    IndexRecord,
    parse_sitemapindex,
    parse_urlset,
)
from kit_ray.kernels.urlkit import Url

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _et_extract(data: bytes, root: str, rec: str) -> list[dict]:
    """Naive ElementTree extraction: loc/lastmod/priority/changefreq
    text per record, namespace-agnostic."""
    tree = ET.fromstring(data.decode("utf-8").lstrip("﻿"))
    assert tree.tag.removeprefix(_NS) == root  # builder emitted right root
    out = []
    for el in tree:
        tag = el.tag.removeprefix(_NS)
        if tag != rec:
            continue
        row = {}
        for child in el:
            row[child.tag.removeprefix(_NS)] = child.text
        out.append(row)
    return out


# URLs with query strings exercising &, =, and percent escapes.
url_strategy = st.builds(
    lambda host, path, q: f"https://h{host}.example/{path}"
    + (f"?a={q}&b=2" if q else ""),
    st.integers(0, 99),
    st.text(alphabet="abz09", max_size=8),
    st.text(alphabet="xy&<>\"'", max_size=4).map(
        lambda s: s.replace("&", "%26").replace("<", "%3C")
        .replace(">", "%3E").replace('"', "%22").replace("'", "%27")),
)

entry_strategy = st.builds(
    lambda u, mod, pri, freq: (u, mod, pri, freq),
    url_strategy,
    st.one_of(st.none(), st.integers(0, 10_000)),
    st.one_of(st.none(), st.sampled_from([0.0, 0.3, 0.55, 1.0])),
    st.one_of(st.none(), st.sampled_from(
        ["always", "hourly", "daily", "weekly", "monthly", "yearly",
         "never"])),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(entry_strategy, min_size=1, max_size=25))
def test_urlset_parser_matches_elementtree(rows):
    entries = []
    for u, mod, pri, freq in rows:
        e = Entry(Url.parse(u))
        if mod is not None:
            e.modified = datetime(2020 + mod % 6, 1 + mod % 12,
                                  1 + mod % 28, mod % 24, mod % 60,
                                  (mod * 7) % 60,  # nonzero seconds
                                  tzinfo=timezone.utc)
        e.priority = pri
        e.frequency = freq
        entries.append(e)
    blob = build_urlset(entries)

    ours = list(parse_urlset(blob))
    et = _et_extract(blob, "urlset", "url")
    assert len(ours) == len(et) == len(entries)
    for o, t in zip(ours, et):
        assert str(o.location) == t["loc"]
        if o.modified is None:
            assert "lastmod" not in t
        else:
            # Full second-precision differential: our parser's datetime
            # must equal ET's text re-parsed independently.
            et_dt = datetime.fromisoformat(t["lastmod"])
            assert o.modified == et_dt
        if o.priority is None:
            assert "priority" not in t
        else:
            assert abs(o.priority - float(t["priority"])) < 0.051
        assert o.frequency == t.get("changefreq")


@settings(max_examples=100, deadline=None)
@given(st.lists(url_strategy, min_size=1, max_size=15))
def test_sitemapindex_parser_matches_elementtree(urls):
    blob = build_sitemapindex([IndexRecord(Url.parse(u)) for u in urls])
    ours = [str(r.location) for r in parse_sitemapindex(blob)]
    et = [t["loc"] for t in _et_extract(blob, "sitemapindex", "sitemap")]
    assert ours == et


@settings(max_examples=100, deadline=None)
@given(st.lists(url_strategy, min_size=1, max_size=10),
       st.sampled_from(["", "\n  ", "\t", "\n\n"]))
def test_urlset_whitespace_between_tags(urls, ws):
    """Hand-assembled XML with inter-tag whitespace (builders differ;
    real sitemaps are pretty-printed) parses to the same locs as ET."""
    from xml.sax.saxutils import escape

    recs = "".join(
        f"{ws}<url>{ws}<loc>{escape(u)}</loc>{ws}</url>" for u in urls)
    blob = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
            f"{recs}{ws}</urlset>").encode()
    ours = [str(e.location) for e in parse_urlset(blob)]
    et = [t["loc"] for t in _et_extract(blob, "urlset", "url")]
    assert ours == et == urls
