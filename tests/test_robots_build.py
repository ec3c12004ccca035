"""RobotsBuilder round-trip tests (exclusion/build/group.rs:163-178,
build/mod.rs:119-146) — the builder output must parse back into the
verdicts it declares."""

from kit_ray.kernels.robots import ALL_UAS, Robots
from kit_ray.kernels.robots_build import GroupBuilder, RobotsBuilder


def test_empty_uas_is_star():
    # group.rs:163-171.
    out = str(GroupBuilder().disallow("/foo"))
    assert "User-Agent: *" in out


def test_no_rules_emits_allow_star():
    # group.rs:173-178.
    out = str(GroupBuilder(["foobot"]))
    assert "Allow: *" in out


def test_readme_round_trip():
    # build/mod.rs:119-146 readme test, extended with a parse check.
    b = (
        RobotsBuilder()
        .header("Robots.txt: Start")
        .group(["foobot"], lambda u: (
            u.crawl_delay(5)
            .header("Rules for Foobot: Start")
            .allow("/example/yeah.txt")
            .disallow("/example/nope.txt")
            .footer("Rules for Foobot: End")
        ))
        .group(["barbot", "nombot"], lambda u: (
            u.crawl_delay(2)
            .disallow("/example/yeah.txt")
            .disallow("/example/nope.txt")
        ))
        .sitemap("https://example.com/sitemap_1.xml")
        .sitemap("https://example.com/sitemap_2.xml")
        .sitemap("https://example.com/sitemap_1.xml")  # dedup
        .footer("Robots.txt: End")
    )
    txt = str(b).encode()

    r = Robots.from_bytes(txt, "foobot")
    assert r.is_relative_allowed("/example/yeah.txt")
    assert not r.is_relative_allowed("/example/nope.txt")
    assert r.crawl_delay() == 5.0

    r2 = Robots.from_bytes(txt, "barbot")
    assert not r2.is_relative_allowed("/example/yeah.txt")
    assert r2.crawl_delay() == 2.0

    r3 = Robots.from_bytes(txt, "someone-else")
    assert len(r3.sitemaps()) == 2


def test_comment_formatting():
    out = str(RobotsBuilder().header("Line one\n# already prefixed\n\n  Line two  ")
              .group([], lambda u: u.allow("/")))
    assert out.startswith("# Line one\n# already prefixed\n# Line two")


def test_group_terminator_interrupts():
    # The explicit `Allow: *` keeps an empty group from swallowing the
    # next group's rules.
    txt = str(
        RobotsBuilder()
        .group(["a"], lambda u: u)
        .group(["b"], lambda u: u.disallow("/x"))
    ).encode()
    ra = Robots.from_bytes(txt, "a")
    rb = Robots.from_bytes(txt, "b")
    assert ra.is_relative_allowed("/x")
    assert not rb.is_relative_allowed("/x")
