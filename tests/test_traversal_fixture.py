"""Hand-enumerated traversal-order fixture.

The engine and the oracle share the traversal kernel (per-host traversal
is sequential by protocol), so oracle-vs-engine tests alone can't catch
a bug in the kernel itself. This fixture pins the EXPECTED order by
hand, derived by walking auto.rs:169-207 on paper:

- robots lists Sitemap lines in document order; the stack pops from the
  END, so the LAST line is traversed first (Vec::pop, auto.rs:199);
- an index's children are fetched in document order, one level deep;
  a child that is itself an index is dropped (auto.rs:186-197);
- within a urlset/txt, document order; invalid records skipped.
"""

import io

from kit_ray.kernels.traverse import traverse_host
from kit_ray.kernels.urlkit import Url
from kit_ray.sources.countio import CountingReader, CountingWriter

WEB = {
    # robots advertises [first.xml, second_index.xml]; LIFO -> index first.
    "https://h.example/first.xml": b"""<urlset>
        <url><loc>https://h.example/f1</loc></url>
        <url><loc>not a url</loc></url>
        <url><loc>https://h.example/f2</loc></url>
    </urlset>""",
    "https://h.example/second_index.xml": b"""<sitemapindex>
        <sitemap><loc>https://h.example/childA.txt</loc></sitemap>
        <sitemap><loc>https://h.example/nested.xml</loc></sitemap>
        <sitemap><loc>https://h.example/missing.xml</loc></sitemap>
        <sitemap><loc>https://h.example/childB.xml</loc></sitemap>
    </sitemapindex>""",
    "https://h.example/childA.txt": b"https://h.example/a1\njunk line\nhttps://h.example/a2",
    "https://h.example/nested.xml": b"<sitemapindex><sitemap><loc>https://h.example/childB.xml</loc></sitemap></sitemapindex>",
    "https://h.example/childB.xml": b"<urlset><url><loc>https://h.example/b1</loc></url></urlset>",
}

# Walked by hand from the reference drive loop. stack_rank =
# root_order * 2^20 + child_slot where child slots count ALL listed
# children (dropped/missing ones keep their slot — the key depends only
# on the listings):
#   pop second_index.xml (last Sitemap line first; root_order 0)
#     slot 1: childA.txt   -> a1, a2           (junk line skipped)
#     slot 2: nested.xml   -> DROPPED (index inside index)
#     slot 3: missing.xml  -> fetch error, skipped
#     slot 4: childB.xml   -> b1
#   pop first.xml (root_order 1, slot 0) -> f1, f2  (invalid <loc> skipped)
M = 1 << 20
EXPECTED = [
    ("https://h.example/a1", 1, 0),
    ("https://h.example/a2", 1, 1),
    ("https://h.example/b1", 4, 0),
    ("https://h.example/f1", M, 0),
    ("https://h.example/f2", M, 1),
]


def test_hand_enumerated_order():
    sitemaps = [
        Url.parse("https://h.example/first.xml"),
        Url.parse("https://h.example/second_index.xml"),
    ]
    got = [
        (str(t.entry.location), t.stack_rank, t.pos)
        for t in traverse_host(sitemaps, lambda u: WEB.get(str(u)))
    ]
    assert got == EXPECTED


def test_over_limit_index_keeps_parsed_prefix():
    """A sitemapindex past RECORD_LIMIT keeps the children parsed before
    the limit trips (inclusion/parse/mod.rs:44-57 fails on the NEXT
    read, so the emitted prefix stands) — in both the expand kernel and
    the full drive loop."""
    from kit_ray.kernels.sitemap import RECORD_LIMIT
    from kit_ray.kernels.traverse import expand_sitemaps

    n = RECORD_LIMIT + 10
    big_index = b"<sitemapindex>" + b"".join(
        b"<sitemap><loc>https://h.example/c%d.txt</loc></sitemap>" % i
        for i in range(n)
    ) + b"</sitemapindex>"
    web = {"https://h.example/idx.xml": big_index}
    # Leaves: only the first two exist; the rest 404 (skipped).
    web["https://h.example/c0.txt"] = b"https://h.example/u0"
    web["https://h.example/c1.txt"] = b"https://h.example/u1"

    roots = [Url.parse("https://h.example/idx.xml")]
    leaves = list(expand_sitemaps(roots, lambda u: web.get(str(u))))
    # records+2 > RECORD_LIMIT guard: the XML parser emits at most
    # RECORD_LIMIT - 1 full records before raising.
    assert len(leaves) == RECORD_LIMIT - 1
    assert str(leaves[0][0]) == "https://h.example/c0.txt"
    assert [rank for _, rank, _, _ in leaves[:3]] == [1, 2, 3]

    got = [
        (str(t.entry.location), t.stack_rank, t.pos)
        for t in traverse_host(roots, lambda u: web.get(str(u)))
    ]
    assert got == [
        ("https://h.example/u0", 1, 0),
        ("https://h.example/u1", 2, 0),
    ]


def test_counting_io():
    # countio parity: byte accounting through the wrappers
    # (countio/counter/stdlib.rs:54-113 test shape).
    r = CountingReader(io.BytesIO(b"hello world"))
    assert r.read(5) == b"hello"
    assert r.reader_bytes == 5
    r.read()
    assert r.reader_bytes == 11

    w = CountingWriter(io.BytesIO())
    w.write(b"abc")
    w.write(b"defg")
    assert w.writer_bytes == 7
    assert w.into_inner().getvalue() == b"abcdefg"


def test_robots_from_reader_uses_cap():
    from kit_ray.kernels.robots import BYTE_LIMIT, Robots

    blob = b"User-Agent: *\nDisallow: /blocked\n" + b"#x\n" * 200_000
    counted = CountingReader(io.BytesIO(blob))
    r = Robots.from_reader(counted, "*")
    assert counted.reader_bytes == BYTE_LIMIT  # reader.take(BYTE_LIMIT)
    assert not r.is_relative_allowed("/blocked/x")
