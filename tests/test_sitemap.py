"""Sitemap kernel conformance tests.

Ported tables: urlset parse (inclusion/parse/entry.rs:202-250), txt
parse (plain.rs:156-198), frequency/priority doc-tests
(record/frequency.rs:34-100, record/priority.rs), build round-trips
(build/entry.rs:194-268, plain.rs:144-224), sniffing + limits
(parse/auto.rs, parse/mod.rs:44-57).
"""

from datetime import datetime, timedelta, timezone

import pytest

from kit_ray.kernels.sitemap import (
    BYTE_LIMIT,
    RECORD_LIMIT,
    Entry,
    IndexRecord,
    LimitError,
    build_plain,
    build_sitemapindex,
    build_urlset,
    frequency_is_outdated,
    frequency_next_date,
    frequency_parse,
    iso8601_format,
    iso8601_parse,
    parse_plain,
    parse_sitemapindex,
    parse_urlset,
    priority_clamp,
    priority_display,
    priority_parse,
    sniff_format,
)
from kit_ray.kernels.urlkit import Url

EXAMPLE_URLSET = b"""
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>https://www.example.com/file1.html</loc>
        <lastmod>2022-09-08T10:43:13.000-04:00</lastmod>
        <changefreq>daily</changefreq>
        <priority>0.6</priority>
    </url>
</urlset>"""

EXAMPLE_INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
   <sitemap>
      <loc>http://www.example.com/sitemap.xml.gz</loc>
      <lastmod>2004-10-01T18:23:17+00:00</lastmod>
   </sitemap>
</sitemapindex>"""


class TestUrlsetParse:
    def test_entry_fields(self):
        recs = list(parse_urlset(EXAMPLE_URLSET))
        assert len(recs) == 1
        e = recs[0]
        assert str(e.location) == "https://www.example.com/file1.html"
        assert e.modified == datetime(2022, 9, 8, 14, 43, 13, tzinfo=timezone.utc)
        assert e.frequency == "daily"
        assert e.priority == pytest.approx(0.6)

    def test_missing_loc_dropped(self):
        data = b"<urlset><url><lastmod>2022-09-08T10:43:13Z</lastmod></url></urlset>"
        assert list(parse_urlset(data)) == []

    def test_invalid_loc_dropped(self):
        data = b"<urlset><url><loc>not a url</loc></url></urlset>"
        assert list(parse_urlset(data)) == []

    def test_invalid_optional_fields_become_none(self):
        data = (
            b"<urlset><url><loc>https://e.com/a</loc>"
            b"<lastmod>2022-06-04</lastmod>"  # date-only: Iso8601 OffsetDateTime fails
            b"<changefreq>sometimes</changefreq>"
            b"<priority>2.6</priority></url></urlset>"
        )
        e = list(parse_urlset(data))[0]
        assert e.modified is None and e.frequency is None and e.priority is None

    def test_case_insensitive_record_tag_case_sensitive_fields(self):
        # inner.rs:68-74 vs entry.rs:100-104 — <URL> starts a record but
        # <LOC> text is not applied (path compare is case-sensitive).
        data = (
            b"<urlset><URL><LOC>https://e.com/a</LOC></URL>"
            b"<url><loc>https://e.com/b</loc></url></urlset>"
        )
        recs = list(parse_urlset(data))
        assert [str(e.location) for e in recs] == ["https://e.com/b"]

    def test_mixed_case_root_still_yields(self):
        # Scanner seeds the lowercase root path (auto.rs:38-46).
        data = b"<UrlSet><url><loc>https://e.com/a</loc></url></UrlSet>"
        assert [str(e.location) for e in parse_urlset(data)] == ["https://e.com/a"]

    def test_dangling_record_emitted_at_eof(self):
        # inner.rs:99-102.
        data = b"<urlset><url><loc>https://e.com/a</loc>"
        assert [str(e.location) for e in parse_urlset(data)] == ["https://e.com/a"]

    def test_entity_unescape(self):
        data = b"<urlset><url><loc>https://e.com/a?x=1&amp;y=2</loc></url></urlset>"
        assert [str(e.location) for e in parse_urlset(data)] == ["https://e.com/a?x=1&y=2"]

    def test_record_limit(self):
        rows = b"".join(
            b"<url><loc>https://e.com/%d</loc></url>" % i for i in range(RECORD_LIMIT + 5)
        )
        data = b"<urlset>" + rows + b"</urlset>"
        got = []
        with pytest.raises(LimitError):
            for e in parse_urlset(data):
                got.append(e)
        # Reference parity: try_if_readable fails before the
        # RECORD_LIMIT-th record's content is read (inner.rs), so the
        # XML parsers emit at most RECORD_LIMIT - 1 records.
        assert len(got) == RECORD_LIMIT - 1


class TestIndexParse:
    def test_index_fields(self):
        recs = list(parse_sitemapindex(EXAMPLE_INDEX))
        assert len(recs) == 1
        assert str(recs[0].location) == "http://www.example.com/sitemap.xml.gz"
        assert recs[0].modified == datetime(2004, 10, 1, 18, 23, 17, tzinfo=timezone.utc)


class TestPlainParse:
    def test_one_url_per_line(self):
        buf = b"https://www.example.com/file1.html\n        https://www.example.com/file2.html"
        urls = list(parse_plain(buf))
        # Leading whitespace is stripped by the WHATWG parser, as in the
        # reference where Url::parse tolerates it (plain.rs:156-178).
        assert [str(u) for u in urls] == [
            "https://www.example.com/file1.html",
            "https://www.example.com/file2.html",
        ]

    def test_invalid_lines_skipped(self):
        buf = b"not a url\nhttps://e.com/a\n\nalso bad"
        assert [str(u) for u in parse_plain(buf)] == ["https://e.com/a"]

    def test_record_limit_counts_all_lines(self):
        # records += 1 happens before the parse attempt (plain.rs:77).
        buf = b"\n" * RECORD_LIMIT + b"https://e.com/a"
        got = []
        with pytest.raises(LimitError):
            for u in parse_plain(buf):
                got.append(u)
        assert got == []


class TestSniff:
    def test_urlset(self):
        assert sniff_format(EXAMPLE_URLSET) == "entry"

    def test_index(self):
        assert sniff_format(EXAMPLE_INDEX) == "index"

    def test_case_insensitive(self):
        assert sniff_format(b"<SiteMapIndex></SiteMapIndex>") == "index"
        assert sniff_format(b"<URLSET/>") == "entry"

    def test_txt_is_plain(self):
        assert sniff_format(b"https://e.com/a\nhttps://e.com/b") == "plain"

    def test_other_xml_is_plain(self):
        assert sniff_format(b"<rss><channel/></rss>") == "plain"


class TestScalars:
    def test_frequency_parse_doc(self):
        assert frequency_parse("Daily") == "daily"
        assert frequency_parse(" weekly ") == "weekly"
        assert frequency_parse("sometimes") is None

    def test_frequency_next_date_doc(self):
        d0 = datetime(2022, 9, 12, 12, 0, tzinfo=timezone.utc)
        assert frequency_next_date("monthly", d0) == datetime(
            2022, 10, 12, 12, 0, tzinfo=timezone.utc
        )
        assert frequency_next_date("always", d0) is None
        assert frequency_next_date("never", d0) is None

    def test_frequency_is_outdated_doc(self):
        d0 = datetime(2022, 9, 12, 12, 0, tzinfo=timezone.utc)
        d1 = datetime(2022, 10, 12, 12, 0, tzinfo=timezone.utc)
        assert frequency_is_outdated("monthly", d0, d1)
        assert frequency_is_outdated("always", d0, d0)
        assert not frequency_is_outdated("never", d0, d1 + timedelta(days=9999))

    def test_priority(self):
        assert priority_parse("0.6") == pytest.approx(0.6)
        assert priority_parse("2.6") is None  # parse is range-checked
        assert priority_parse("abc") is None
        assert priority_clamp(2.6) == 1.0
        assert priority_display(0.55) == "0.6" or priority_display(0.55) == "0.5"
        assert priority_display(0.6) == "0.6"

    def test_iso8601_parse(self):
        assert iso8601_parse("2004-10-01T18:23:17+00:00") == datetime(
            2004, 10, 1, 18, 23, 17, tzinfo=timezone.utc
        )
        assert iso8601_parse("2022-09-08T10:43:13.000-04:00") == datetime(
            2022, 9, 8, 14, 43, 13, tzinfo=timezone.utc
        )
        assert iso8601_parse("2022-06-04") is None  # date-only fails
        assert iso8601_parse("garbage") is None
        # time-crate grammar: 'T' separator is required, but components
        # after the hour may be omitted (reduced precision); a missing
        # second defaults to 0.
        assert iso8601_parse("2022-09-08 10:43:13+00:00") is None
        assert iso8601_parse("2022-09-08T10:43+00:00") == datetime(
            2022, 9, 8, 10, 43, 0, tzinfo=timezone.utc
        )

    def test_iso8601_format_two_decimals(self):
        # build/inner.rs:9-13: 2-decimal seconds.
        dt = datetime(2022, 9, 8, 14, 43, 13, 500_000, tzinfo=timezone.utc)
        assert iso8601_format(dt) == "2022-09-08T14:43:13.50+00:00"


class TestRoundTrip:
    def test_urlset_round_trip(self):
        entries = [
            Entry(
                Url.parse("https://example.com/a.html"),
                modified=datetime(2022, 9, 8, 14, 43, 13, tzinfo=timezone.utc),
                priority=0.6,
                frequency="daily",
            ),
            Entry(Url.parse("https://example.com/b.html")),
        ]
        blob = build_urlset(entries)
        assert sniff_format(blob) == "entry"
        back = list(parse_urlset(blob))
        assert [str(e.location) for e in back] == [str(e.location) for e in entries]
        assert back[0].modified == entries[0].modified
        assert back[0].frequency == "daily"
        assert back[0].priority == pytest.approx(0.6)
        assert back[1].modified is None

    def test_index_round_trip(self):
        recs = [
            IndexRecord(
                Url.parse("https://example.com/sitemap1.xml"),
                modified=datetime(2004, 10, 1, 18, 23, 17, tzinfo=timezone.utc),
            )
        ]
        blob = build_sitemapindex(recs)
        assert sniff_format(blob) == "index"
        back = list(parse_sitemapindex(blob))
        assert str(back[0].location) == "https://example.com/sitemap1.xml"
        assert back[0].modified == recs[0].modified

    def test_plain_round_trip(self):
        urls = [Url.parse("https://example.com/a"), Url.parse("https://example.com/b")]
        blob = build_plain(urls)
        assert [str(u) for u in parse_plain(blob)] == [str(u) for u in urls]

    def test_build_record_limit(self):
        with pytest.raises(LimitError):
            build_plain([Url.parse("https://e.com/x")] * (RECORD_LIMIT + 1))
