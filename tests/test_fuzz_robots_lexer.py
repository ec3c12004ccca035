"""Differential fuzz of the robots.txt lexer + group/precedence FSM
(round-4 verdict #7): random misspelling-adjacent directive streams are
checked against a NAIVE model written straight from the reference
semantics (exclusion/parse/lexer.rs:65-198, parser.rs:9-121,
rule.rs:19-221, inner.rs:92-110) — independent of the kernel's
vectorized/regex implementation, so a bug in either side shows up as a
mismatch.

tests/test_fuzz.py already fuzzes totality (never crashes) and the
wildcard matcher; this file fuzzes the LEXER's spelling/separator/
comment grammar and the end-to-end verdict pipeline.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kit_ray.kernels.robots import Robots, lex_tokens

# ---------------------------------------------------------------------------
# Naive lexer model (lexer.rs:71-174): nested (kind, spelling) loop in
# table order; a spelling matches at line start (after ws) iff followed
# by `[ \t]*:` or at least one space/tab.
# ---------------------------------------------------------------------------

_TABLE = [
    ("user_agent", ("user-agent", "user agent", "useragent")),
    ("allow", ("allow", "alow", "allaw")),
    ("disallow", ("disallow", "dissallow", "dissalow", "disalow",
                  "diasllow", "disallaw")),
    ("crawl_delay", ("crawl-delay", "crawl delay", "crawldelay")),
    ("sitemap", ("sitemap", "site-map", "site map")),
]

# Misspelling-adjacent words that must lex as `unknown` (one edit away
# from a table entry but NOT in it).
_NEAR_MISSES = [
    "disallows", "disallw", "dislalow", "useragnet", "user_agent",
    "usragent", "alllow", "allows", "alow ed", "crawl--delay",
    "crawldelays", "site_map", "sitemaps", "sitema", "crawl_delay",
]

_SEP_RE = re.compile(r"^[ \t]*:")
_WS_RE = re.compile(r"^[ \t]+")


def _naive_lex_line(line: str) -> tuple[str, str]:
    body = line.lstrip(" \t")
    low = body.lower()
    for kind, spellings in _TABLE:
        for sp in spellings:
            if not low.startswith(sp):
                continue
            rest = body[len(sp):]
            m = _SEP_RE.match(rest) or _WS_RE.match(rest)
            if m is None:
                continue
            value = rest[m.end():]
            hash_at = value.find("#")
            if hash_at != -1:
                value = value[:hash_at]
            value = value.strip(" \t\r\n\x0b\x0c")
            if kind == "disallow" and value == "":
                return ("allow", "/")
            return (kind, value)
    return ("unknown", line)


# A generated line: (word, case-mangle seed, separator style, value,
# comment or None, leading ws).
_WORDS = [sp for _, sps in _TABLE for sp in sps] + _NEAR_MISSES

line_strategy = st.tuples(
    st.sampled_from(_WORDS),
    st.integers(0, 7),                      # case mangle
    st.sampled_from([":", " :", ":\t", "\t:", " ", "\t", "  "]),
    st.text(alphabet="abz/*$ .", max_size=12),
    st.one_of(st.none(), st.text(alphabet="abc :", max_size=6)),
    st.sampled_from(["", " ", "\t", " \t"]),
)


def _render(parts) -> str:
    word, caseseed, sep, value, comment, lead = parts
    if caseseed & 1:
        word = word.upper()
    if caseseed & 2:
        word = word.capitalize()
    if caseseed & 4:
        word = "".join(
            c.upper() if i % 2 else c for i, c in enumerate(word))
    line = f"{lead}{word}{sep}{value}"
    if comment is not None:
        line += f"#{comment}"
    return line


@settings(max_examples=300, deadline=None)
@given(st.lists(line_strategy, min_size=1, max_size=20))
def test_lexer_matches_naive_model(line_parts):
    lines = [_render(p) for p in line_parts]
    data = "\n".join(lines).encode()
    got = lex_tokens(data)
    want = [_naive_lex_line(ln) for ln in lines]
    assert [(k, v.decode()) for k, v in got] == want


@settings(max_examples=150, deadline=None)
@given(st.lists(line_strategy, min_size=1, max_size=20),
       st.sampled_from(["\r\n", "\r", "\r\r\n", "\n"]))
def test_lexer_line_separators(line_parts, sep):
    """All-CRs-then-optional-LF is one separator (lexer.rs:56-60):
    joining with any such separator yields the same token stream as
    joining with plain LF."""
    lines = [_render(p).replace("\r", "") for p in line_parts]
    got = lex_tokens(sep.join(lines).encode())
    want = lex_tokens("\n".join(lines).encode())
    assert got == want


# ---------------------------------------------------------------------------
# End-to-end verdict model: UA group selection (longest prefix, last max,
# parser.rs:47-68), capture FSM (parser.rs:70-96), rule sort
# (len DESC / allow DESC, stable; rule.rs:216-221), first-match verdict
# with no-match -> None (inner.rs:92-103).
# ---------------------------------------------------------------------------

_UAS = ["*", "b", "bot", "botx", "superbot", "BOT "]
_PATTERNS = ["/", "/a", "/a/b", "/a*", "/*b", "/a$", "/a*b$", "/*", "/**a",
             "/a$b", "/$$", "/a.b", "/b?c", "/ab", "/a/b/c$"]
_PATHS = ["/", "/a", "/ab", "/a/b", "/a/b/c", "/b?c", "/a.b", "/xa",
          "/robots.txt", "/aXb"]

directive_strategy = st.one_of(
    st.tuples(st.just("ua"), st.sampled_from(_UAS)),
    st.tuples(st.sampled_from(["allow", "disallow"]),
              st.sampled_from(_PATTERNS)),
)


def _naive_verdict(directives, request_ua: str, path: str):
    req = request_ua.strip().lower()
    # Longest UA prefix; ties -> last maximal element.
    selected = None
    for kind, val in directives:
        if kind != "ua":
            continue
        ua = val.strip().lower()
        if req.startswith(ua) and (selected is None or
                                   len(ua) >= len(selected)):
            selected = ua
    if selected is None:
        selected = "*"
    # Capture FSM.
    captures_group = False
    captures_rules = selected == "*"
    rules = []  # (pattern, allow) in file order
    for kind, val in directives:
        if kind == "ua":
            if not captures_group or not captures_rules:
                captures_rules = val.strip().lower() == selected
            captures_group = True
        else:
            captures_group = False
            if not captures_rules:
                continue
            n_end = val.count("$")
            if n_end > 1 or (n_end == 1 and not val.endswith("$")):
                continue  # invalid wildcard -> rule dropped
            # Precedence length is the UNCOLLAPSED pattern's
            # (rule.rs:216-221 sorts the stored pattern; `*+` collapse
            # applies only to the compiled matcher, rule.rs:55).
            rules.append((val, kind == "allow"))
    # `optimal` Always fold (inner.rs:62-78) — checked BEFORE the
    # /robots.txt special case, so Always(False) denies even that.
    if not rules or all(allow for _, allow in rules):
        return True
    if all(not allow for _, allow in rules) and any(
            re.sub(r"\*+", "*", pat) in ("/", "/*", "/*$")
            for pat, _ in rules):
        return False
    # Stable precedence sort + first match via a from-scratch regex.
    rules.sort(key=lambda r: (-len(r[0]), not r[1]))
    if path == "/robots.txt":
        return True
    for raw, allow in rules:
        pat = re.sub(r"\*+", "*", raw)  # matcher-side collapse
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
        if anchored:
            rx += "$"
        if re.search(rx, path):
            return allow
    return None


@settings(max_examples=300, deadline=None)
@given(st.lists(directive_strategy, min_size=0, max_size=15),
       st.sampled_from(["bot", "botx", "superbot", "other"]),
       st.sampled_from(_PATHS))
def test_verdicts_match_naive_model(directives, request_ua, path):
    lines = []
    for kind, val in directives:
        name = {"ua": "User-Agent", "allow": "Allow",
                "disallow": "Disallow"}[kind]
        lines.append(f"{name}: {val}")
    robots = Robots.from_bytes("\n".join(lines).encode(), request_ua)
    assert robots.try_is_relative_allowed(path) == _naive_verdict(
        directives, request_ua, path)
