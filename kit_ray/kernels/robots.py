"""robots.txt lexing / parsing / matching — bit-match reimplementation.

From-scratch Python reimplementation of the decision semantics of the
``robotxt`` crate in spire-rs/kit (NOT a code port; the reference is a
nom-based Rust lexer). Every observable behavior is pinned to the
reference source:

- lexer grammar + directive misspellings ...... /root/reference/exclusion/parse/lexer.rs:65-198
- empty Disallow -> ``Allow: /`` rewrite ...... /root/reference/exclusion/parse/lexer.rs:135-142
- BOM strip ................................... /root/reference/exclusion/parse/lexer.rs:81-83
- UA longest-prefix-match selection + FSM ..... /root/reference/exclusion/parse/parser.rs:47-96
- crawl-delay min-of-values ................... /root/reference/exclusion/parse/parser.rs:99-111
- wildcard classification / validation ........ /root/reference/exclusion/parse/rule.rs:31-74
- rule ordering (len DESC, allow DESC) ........ /root/reference/exclusion/parse/rule.rs:216-221
- verdict precedence / no-match -> allow ...... /root/reference/exclusion/parse/inner.rs:92-110
- ``optimal`` Always fold ..................... /root/reference/exclusion/parse/inner.rs:62-78
- 512,000-byte input cap, \\x00 -> \\n ........ /root/reference/exclusion/parse/inner.rs:36-48
- path normalization .......................... /root/reference/exclusion/paths/normal.rs:7-20
- robots.txt URL derivation ................... /root/reference/exclusion/paths/create.rs:15-37
- serde cache shape ........................... /root/reference/exclusion/parse/serde.rs

These are pure-Python kernels: no Ray imports. The Ray layer wraps them
in stateful ``map_batches`` actor pools (see RobotsGate in
kit_ray/stages/crawl_stages.py).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Optional

from .urlkit import Url, UrlError, try_parse

ALL_UAS = "*"
BYTE_LIMIT = 512_000  # exclusion/paths/mod.rs:9

# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

# Directive kinds.
USER_AGENT = "user_agent"
ALLOW = "allow"
DISALLOW = "disallow"
CRAWL_DELAY = "crawl_delay"
SITEMAP = "sitemap"
UNKNOWN = "unknown"

# Accepted (mis)spellings, in the reference's alternation order
# (lexer.rs:101-167). Matching is case-insensitive, at line start after
# optional spaces/tabs, followed by ``[ \t]*:`` or at least one space/tab.
_SPELLINGS = [
    (USER_AGENT, ("user-agent", "user agent", "useragent")),
    (ALLOW, ("allow", "alow", "allaw")),
    (DISALLOW, ("disallow", "dissallow", "dissalow", "disalow", "diasllow", "disallaw")),
    (CRAWL_DELAY, ("crawl-delay", "crawl delay", "crawldelay")),
    (SITEMAP, ("sitemap", "site-map", "site map")),
]

# One compiled regex per directive kind: ^[ \t]*(spelling)([ \t]*:|[ \t]+)value
_DIRECTIVE_RES = [
    (
        kind,
        re.compile(
            rb"^[ \t]*(?:" + b"|".join(re.escape(s.encode()) for s in sp) + rb")(?:[ \t]*:|[ \t]+)",
            re.IGNORECASE,
        ),
    )
    for kind, sp in _SPELLINGS
]

# Line separator: all consecutive CRs then one optional LF (lexer.rs:56-60).
_LINE_SEP = re.compile(rb"\r*\n|\r+")


def lex_tokens(data: bytes) -> list[tuple[str, bytes]]:
    """Tokenize robots.txt bytes into ``(kind, value)`` directives.

    Equivalent to ``Lexer::parse_tokens`` (lexer.rs:71-98): BOM bytes
    stripped, one directive per line, unmatched lines -> ``unknown``.
    """
    # Strip optional BOM bytes (each tried independently, lexer.rs:81-83).
    for bom in (b"\xef", b"\xbb", b"\xbf"):
        if data.startswith(bom):
            data = data[len(bom):]

    lines = _LINE_SEP.split(data)
    # A trailing separator leaves one empty segment that the reference's
    # many_till(.., eof) never turns into a token.
    if lines and lines[-1] == b"":
        lines = lines[:-1]

    out: list[tuple[str, bytes]] = []
    for line in lines:
        tok = _lex_line(line)
        out.append(tok)
    return out


def _lex_line(line: bytes) -> tuple[str, bytes]:
    for kind, rx in _DIRECTIVE_RES:
        m = rx.match(line)
        if m is None:
            continue
        value = line[m.end():]
        # Value stops at '#'; the rest of the line is a comment.
        hash_at = value.find(b"#")
        if hash_at != -1:
            value = value[:hash_at]
        value = value.strip()  # bstr trim = ASCII whitespace
        if kind == DISALLOW and value == b"":
            # Empty Disallow == allow all (lexer.rs:135-142).
            return (ALLOW, b"/")
        return (kind, value)
    # No directive matched: the whole line (sans comment handling — the
    # reference's `unknown` consumes to EOL verbatim, lexer.rs:170-174).
    return (UNKNOWN, line)


# ---------------------------------------------------------------------------
# normalize_path / create_url
# ---------------------------------------------------------------------------

_NORMALIZE_SET = set(range(0x00, 0x20)) | {0x7F, 0x20, 0x22, 0x3C, 0x3E}


def normalize_path(path: str) -> str:
    """Percent-encode CONTROLS ∪ {space, '"', '<', '>'} and ensure a
    leading '/' (normal.rs:7-20). Non-ASCII passes through unencoded,
    mirroring utf8_percent_encode with an AsciiSet."""
    out = []
    for ch in path:
        cp = ord(ch)
        if cp < 0x80 and cp in _NORMALIZE_SET:
            out.append("%%%02X" % cp)
        else:
            out.append(ch)
    s = "".join(out)
    return s if s.startswith("/") else "/" + s


def create_url(url: Url) -> Url:
    """URL -> its /robots.txt URL (create.rs:15-37): http/https only,
    credentials stripped."""
    if url.cannot_be_a_base():
        raise UrlError("cannot be a base")
    if url.scheme not in ("http", "https"):
        raise UrlError(f"wrong scheme: {url.scheme}")
    url = url.with_userinfo("", None)
    return url.join("/robots.txt")


# ---------------------------------------------------------------------------
# Rules
# ---------------------------------------------------------------------------

_STAR_KILLER = re.compile(r"\*+")
REGEX_SIZE_CAP = 42 * (1 << 10)  # rule.rs:68-71 (approximated on pattern length)


class RuleError(ValueError):
    """Invalid wildcard pattern — the rule is silently dropped
    (parser.rs:92-96)."""


class Wildcard:
    """Compiled wildcard matcher (rule.rs:19-113).

    kind: 'ending' ($-anchored, no *) | 'universal' (* only) | 'both'.
    """

    __slots__ = ("kind", "pattern", "_regex", "_splits")

    def __init__(self, kind: str, pattern: str, regex=None):
        self.kind = kind
        self.pattern = pattern
        self._regex = regex
        self._splits = pattern.split("*") if kind == "universal" else None

    @staticmethod
    def new(pattern: str) -> Optional["Wildcard"]:
        """Classify; returns None for plain prefixes; raises RuleError on
        invalid '$' placement (rule.rs:31-74)."""
        has_star = "*" in pattern
        endings = pattern.count("$")

        if endings == 0 and not has_star:
            return None
        if endings > 1:
            raise RuleError(f"too many ending wildcards: {endings}")
        if endings == 1 and pattern.endswith("$") and not has_star:
            return Wildcard("ending", pattern[:-1])
        if endings == 1 and not pattern.endswith("$"):
            raise RuleError(f"unexpected ending wildcard position: {pattern.find('$')}")

        pattern = _STAR_KILLER.sub("*", pattern)
        if has_star and endings == 0:
            return Wildcard("universal", pattern)

        # Both '*' and trailing '$'.
        rx = "^" + re.escape(pattern).replace("\\*", ".*").replace("\\$", "$")
        if len(rx) > REGEX_SIZE_CAP:
            raise RuleError("regex size limit")
        try:
            compiled = re.compile(rx)
        except re.error as e:  # pragma: no cover - defensive
            raise RuleError(str(e)) from e
        return Wildcard("both", pattern, compiled)

    def is_match(self, path: str) -> bool:
        if self.kind == "ending":
            return path == self.pattern
        if self.kind == "universal":
            return self._match_universal(path)
        return self._regex.search(path) is not None

    def _match_universal(self, path: str) -> bool:
        # Greedy left-to-right segment scan (rule.rs:82-103).
        splits = self._splits
        first = splits[0]
        if not path.startswith(first):
            return False
        pos = len(first)
        for split in splits[1:]:
            idx = path.find(split, pos)
            if idx == -1:
                return False
            pos = idx + len(split)
        return True

    def regex_str(self) -> str | None:
        return self._regex.pattern if self._regex is not None else None


@dataclass
class Rule:
    """A single compiled Allow/Disallow pattern (rule.rs:150-200)."""

    pattern: str
    allow: bool
    wildcard: Optional[Wildcard]

    @staticmethod
    def new(pattern: str, allow: bool) -> "Rule":
        pattern = normalize_path(pattern)
        wildcard = Wildcard.new(pattern)  # may raise RuleError -> dropped
        return Rule(pattern, allow, wildcard)

    def is_match(self, path: str) -> bool:
        if self.wildcard is None:
            return path.startswith(self.pattern)
        return self.wildcard.is_match(path)

    def is_universal(self) -> bool:
        # rule.rs:192-199
        w = self.wildcard
        if w is None:
            return self.pattern == "/"
        if w.kind == "ending":
            return False
        if w.kind == "universal":
            return w.pattern == "/*"
        return w.regex_str() == "^/.*$"

    def sort_key(self):
        # (pattern length DESC, allow DESC); Python sort is stable like
        # Rust's (rule.rs:216-221, sort at parser.rs:41).
        return (-len(self.pattern), not self.allow)


# ---------------------------------------------------------------------------
# Parser FSM
# ---------------------------------------------------------------------------

_F64_RE = re.compile(
    r"^[+-]?(?:inf|infinity|nan|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)$", re.IGNORECASE
)


def _parse_f64(s: str) -> float | None:
    """Rust ``str::parse::<f64>`` — no underscores, no hex, accepts
    inf/infinity/nan (case-insensitive)."""
    if not _F64_RE.match(s):
        return None
    try:
        return float(s)
    except ValueError:  # pragma: no cover
        return None


def _duration_from_secs_f64(secs: float) -> float | None:
    """std::time::Duration::try_from_secs_f64 — rejects negative, NaN,
    infinite, overflow."""
    if math.isnan(secs) or math.isinf(secs) or secs < 0 or secs >= 2**64:
        return None
    return secs


class ParserState:
    """Group-capture FSM over the directive stream (parser.rs:9-121)."""

    def __init__(self, longest_match: str, captures_rules: bool):
        self.captures_group = False
        self.captures_rules = captures_rules
        self.longest_match = longest_match
        self.rules: list[Rule] = []
        self.crawl_delay: float | None = None
        self.sitemaps: list[Url] = []

    @staticmethod
    def parse_rules(directives: list[tuple[str, bytes]], user_agent: str) -> "ParserState":
        longest, captures = ParserState._longest_match(directives, user_agent)
        st = ParserState(longest, captures)
        for kind, data in directives:
            if kind == USER_AGENT:
                st._try_user_agent(data)
            elif kind == ALLOW:
                st._try_rule(data, True)
            elif kind == DISALLOW:
                st._try_rule(data, False)
            elif kind == CRAWL_DELAY:
                st._try_delay(data)
            elif kind == SITEMAP:
                st._try_sitemap(data)
        st.rules.sort(key=Rule.sort_key)
        return st

    @staticmethod
    def _longest_match(directives, user_agent: str) -> tuple[str, bool]:
        # parser.rs:47-68: longest UA token that prefixes the requested
        # agent; ties resolved to the LAST max (Rust max_by keeps the
        # last maximal element).
        user_agent = user_agent.strip().lower()
        selected = None
        for kind, data in directives:
            if kind != USER_AGENT:
                continue
            try:
                ua = data.decode("utf-8")
            except UnicodeDecodeError:
                continue
            ua = ua.strip().lower()
            if user_agent.startswith(ua):
                if selected is None or len(ua) >= len(selected):
                    selected = ua
        if selected is None:
            selected = ALL_UAS
        return selected, selected == ALL_UAS

    def _try_user_agent(self, data: bytes):
        try:
            ua = data.decode("utf-8").strip().lower()
        except UnicodeDecodeError:
            ua = None
        if ua is not None:
            if not self.captures_group or not self.captures_rules:
                self.captures_rules = ua == self.longest_match
        self.captures_group = True

    def _try_rule(self, data: bytes, allow: bool):
        self.captures_group = False
        if not self.captures_rules:
            return
        try:
            pattern = data.decode("utf-8")
        except UnicodeDecodeError:
            return
        try:
            self.rules.append(Rule.new(pattern, allow))
        except RuleError:
            pass  # invalid rule silently dropped (parser.rs:92-96)

    def _try_delay(self, data: bytes):
        self.captures_group = False
        if not self.captures_rules:
            return
        try:
            s = data.decode("utf-8")
        except UnicodeDecodeError:
            return
        secs = _parse_f64(s)
        if secs is None:
            return
        dur = _duration_from_secs_f64(secs)
        if dur is None:
            return
        prev = self.crawl_delay if self.crawl_delay is not None else dur
        self.crawl_delay = min(prev, dur)  # multiple values -> minimum

    def _try_sitemap(self, data: bytes):
        # Collected regardless of the active group (parser.rs:114-120).
        try:
            s = data.decode("utf-8")
        except UnicodeDecodeError:
            return
        addr = try_parse(s)
        if addr is not None:
            self.sitemaps.append(addr)


# ---------------------------------------------------------------------------
# Robots policy
# ---------------------------------------------------------------------------

class Robots:
    """Parsed per-agent robots.txt policy (inner.rs:26-149, mod.rs:67-363).

    Immutable; parse once per (host, user_agent), match many times.
    ``rules`` is either a sorted rule list or the Always fold.
    """

    __slots__ = ("_user_agent", "_always", "_rules", "_crawl_delay", "_sitemaps")

    def __init__(self, user_agent, always, rules, crawl_delay, sitemaps):
        self._user_agent = user_agent
        self._always = always  # None | bool
        self._rules = rules  # list[Rule] (unused when _always is set)
        self._crawl_delay = crawl_delay
        self._sitemaps = sitemaps

    # -- constructors ----------------------------------------------------

    @staticmethod
    def from_bytes(robots: bytes, user_agent: str) -> "Robots":
        robots = robots[:BYTE_LIMIT]  # inner.rs:38-39
        robots = robots.replace(b"\x00", b"\n")  # inner.rs:42-48
        directives = lex_tokens(robots)
        st = ParserState.parse_rules(directives, user_agent)
        always, rules = Robots._optimize(st.rules)
        return Robots(st.longest_match, always, rules, st.crawl_delay, st.sitemaps)

    @staticmethod
    def from_reader(reader, user_agent: str) -> "Robots":
        """Parse from any binary file-like, reading at most BYTE_LIMIT
        bytes (mod.rs:116-125 ``reader.take(BYTE_LIMIT)``)."""
        return Robots.from_bytes(reader.read(BYTE_LIMIT), user_agent)

    @staticmethod
    def _optimize(rules: list[Rule]):
        # inner.rs:62-78 (`optimal` feature fold — verdict-preserving).
        if not rules or all(r.allow for r in rules):
            return True, []
        if all(not r.allow for r in rules) and any(r.is_universal() for r in reversed(rules)):
            return False, []
        return None, rules

    @staticmethod
    def from_always(always: bool, user_agent: str, crawl_delay: float | None = None) -> "Robots":
        return Robots(user_agent, always, [], crawl_delay, [])

    @staticmethod
    def from_access(access: str, robots: bytes | None, user_agent: str) -> "Robots":
        """AccessResult -> policy (mod.rs:144-151, access.rs):
        successful -> parse; redirect/unavailable -> allow-all;
        unreachable -> disallow-all."""
        if access == "successful":
            return Robots.from_bytes(robots or b"", user_agent)
        if access in ("redirect", "unavailable"):
            return Robots.from_always(True, user_agent)
        if access == "unreachable":
            return Robots.from_always(False, user_agent)
        raise ValueError(f"unknown access result: {access}")

    # -- matching --------------------------------------------------------

    def try_is_relative_allowed(self, path: str) -> bool | None:
        # inner.rs:92-103
        if self._always is not None:
            return self._always
        path = normalize_path(path)
        if path == "/robots.txt":
            return True
        for rule in self._rules:
            if rule.is_match(path):
                return rule.allow
        return None

    def is_relative_allowed(self, path: str) -> bool:
        v = self.try_is_relative_allowed(path)
        return True if v is None else v

    def try_is_absolute_allowed(self, url: Url) -> bool | None:
        # mod.rs:243-258: path + ?query + #fragment.
        return self.try_is_relative_allowed(url.relative())

    def is_absolute_allowed(self, url: Url) -> bool:
        v = self.try_is_absolute_allowed(url)
        return True if v is None else v

    # -- accessors -------------------------------------------------------

    def is_always(self) -> bool | None:
        return self._always

    def user_agent(self) -> str:
        return self._user_agent

    def crawl_delay(self) -> float | None:
        return self._crawl_delay

    def sitemaps(self) -> list[Url]:
        return list(self._sitemaps)

    def __len__(self):
        return len(self._rules) if self._always is None else 0

    def rules_len(self) -> int | None:
        # Robots::len (mod.rs:354-356): None when folded to Always.
        return None if self._always is not None else len(self._rules)

    # -- serde cache shape (serde.rs:14-31) ------------------------------

    def to_cache(self) -> dict:
        """JSON-safe dict mirroring the reference's serde cache form:
        {"always": bool} or {"allow": [...], "disallow": [...]}."""
        d = {
            "user_agent": self._user_agent,
            "crawl_delay": self._crawl_delay,
            "sitemaps": [str(u) for u in self._sitemaps],
        }
        if self._always is not None:
            d["always"] = self._always
        else:
            d["allow"] = [r.pattern for r in self._rules if r.allow]
            d["disallow"] = [r.pattern for r in self._rules if not r.allow]
        return d

    @staticmethod
    def from_cache(d: dict) -> "Robots":
        if "always" in d:
            return Robots(d["user_agent"], d["always"], [], d.get("crawl_delay"),
                          [Url.parse(u) for u in d.get("sitemaps", [])])
        rules = [Rule.new(p, True) for p in d.get("allow", [])]
        rules += [Rule.new(p, False) for p in d.get("disallow", [])]
        rules.sort(key=Rule.sort_key)
        always, rules = Robots._optimize(rules)
        return Robots(d["user_agent"], always, rules, d.get("crawl_delay"),
                      [Url.parse(u) for u in d.get("sitemaps", [])])
