"""Declarative robots.txt emitter — reimplementation of RobotsBuilder.

Mirrors the observable output of the reference builder:
- group layout & quirks ....... /root/reference/exclusion/build/group.rs:120-161
  (empty UA list -> ``User-Agent: *``; no rules at all -> explicit
  ``Allow: *`` to terminate the group)
- top-level layout ............ /root/reference/exclusion/build/mod.rs:104-117
  (header/groups/footer joined by blank lines; sitemap set deduped)
- comment formatting .......... /root/reference/exclusion/build/split.rs:2-15

Used to generate deterministic corpus fixtures and for the
build->parse->verdict round-trip conformance tests.

Deliberate divergence: the reference's ``Display`` collects ``Sitemap``
URLs but never writes them (`build/mod.rs:112` joins only
header/groups/footer — an evident upstream bug). Our builder emits a
``Sitemap:`` line per collected URL, since the corpus generator needs
robots.txt files that actually advertise their sitemaps.
"""

from __future__ import annotations

from .robots import normalize_path
from .urlkit import Url


def format_comment(txt: str) -> str:
    """Split multiline comments into '# '-prefixed lines (split.rs:2-15)."""
    out = []
    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        out.append(line if line.startswith("#") else f"# {line}")
    return "\n".join(out)


class GroupBuilder:
    """One formatted ``user-agent`` group (group.rs:11-161)."""

    def __init__(self, user_agents=()):
        # Insertion-ordered unique set (the reference uses a HashSet whose
        # iteration order is unspecified; deterministic order is strictly
        # better for fixtures and parses identically).
        self.user_agents = list(dict.fromkeys(ua.strip() for ua in user_agents))
        self.rules_allow: list[str] = []
        self.rules_disallow: list[str] = []
        self.delay: int | None = None
        self._header: str | None = None
        self._footer: str | None = None

    def header(self, header: str) -> "GroupBuilder":
        self._header = header
        return self

    def footer(self, footer: str) -> "GroupBuilder":
        self._footer = footer
        return self

    def allow(self, rule: str) -> "GroupBuilder":
        self.rules_allow.append(normalize_path(rule))
        return self

    def disallow(self, rule: str) -> "GroupBuilder":
        self.rules_disallow.append(normalize_path(rule))
        return self

    def crawl_delay(self, delay: int) -> "GroupBuilder":
        self.delay = delay
        return self

    def __str__(self) -> str:
        header = format_comment(self._header) if self._header else None
        footer = format_comment(self._footer) if self._footer else None
        delay = f"Crawl-Delay: {self.delay}" if self.delay is not None else None

        if not self.user_agents:
            agents = "User-Agent: *"  # group.rs:126-132
        else:
            agents = "\n".join(f"User-Agent: {ua}" for ua in self.user_agents)

        disallows = (
            "\n".join(f"Disallow: {r}" for r in self.rules_disallow)
            if self.rules_disallow
            else None
        )
        if self.rules_allow:
            allows = "\n".join(f"Allow: {r}" for r in self.rules_allow)
        elif not self.rules_disallow:
            allows = "Allow: *"  # explicit group terminator (group.rs:142-149)
        else:
            allows = None

        parts = [header, agents, delay, disallows, allows, footer]
        return "\n".join(p for p in parts if p is not None)


class RobotsBuilder:
    """Set of groups + sitemaps + header/footer (build/mod.rs:15-117)."""

    def __init__(self):
        self.groups: list[GroupBuilder] = []
        self.sitemaps: list[str] = []  # deduped, insertion-ordered
        self._header: str | None = None
        self._footer: str | None = None

    def header(self, header: str) -> "RobotsBuilder":
        self._header = header
        return self

    def footer(self, footer: str) -> "RobotsBuilder":
        self._footer = footer
        return self

    def group(self, user_agents, factory) -> "RobotsBuilder":
        g = GroupBuilder(user_agents)
        self.groups.append(factory(g))
        return self

    def sitemap(self, sitemap: Url | str) -> "RobotsBuilder":
        s = str(sitemap)
        if s not in self.sitemaps:  # HashSet dedup (build/mod.rs:72-75)
            self.sitemaps.append(s)
        return self

    def __str__(self) -> str:
        header = format_comment(self._header) if self._header else None
        footer = format_comment(self._footer) if self._footer else None
        groups = "\n\n".join(str(g) for g in self.groups)
        sitemaps = "\n".join(f"Sitemap: {s}" for s in self.sitemaps) if self.sitemaps else None
        parts = [header, groups if groups else None, sitemaps, footer]
        return "\n\n".join(p for p in parts if p is not None)
