"""Minimal WHATWG-style URL parser/serializer.

Reimplements the observable behavior of the ``url`` crate (servo/rust-url)
that spire-rs/kit depends on, for the subset of URLs a crawl frontier
handles (http/https plus opaque-path schemes used for error tests):

- ``Url::parse`` fails on relative references (no scheme) — used by the
  plain sitemap parser (`/root/reference/inclusion/parse/plain.rs:78-81`)
  and the robots ``Sitemap:`` collector
  (`/root/reference/exclusion/parse/parser.rs:114-119`) to silently skip
  invalid lines.
- Leading/trailing C0-control-or-space stripped; internal tab/newline
  removed (so a line read including its ``\\n`` still parses).
- Scheme and host lowercased, default ports dropped, empty path -> "/".
- ``cannot_be_a_base`` for non-special schemes without ``//``
  (`/root/reference/exclusion/paths/create.rs:18-20`).

This is a from-scratch implementation (stdlib only, no external deps);
it is NOT a full WHATWG parser — it covers the grammar the synthetic
corpus and the ported reference tests exercise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21, "file": None}

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", re.S)

# WHATWG path percent-encode set (C0 + space + " < > ` ? { } — '?' kept
# raw here because we split query off first; '#' likewise).
_PATH_ENCODE = set(range(0x00, 0x20)) | {0x7F, 0x20, 0x22, 0x3C, 0x3E, 0x60, 0x7B, 0x7D}
_QUERY_ENCODE = set(range(0x00, 0x20)) | {0x7F, 0x20, 0x22, 0x23, 0x3C, 0x3E}
_FRAGMENT_ENCODE = set(range(0x00, 0x20)) | {0x7F, 0x20, 0x22, 0x3C, 0x3E, 0x60}


class UrlError(ValueError):
    """Raised when a string is not an absolute, parseable URL."""


def _percent_encode(s: str, encode_set: set[int]) -> str:
    out = []
    for b in s.encode("utf-8"):
        if b in encode_set or b >= 0x80:
            out.append("%%%02X" % b)
        else:
            out.append(chr(b))
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4, as applied by the WHATWG path state machine.
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    if path.endswith("/.") or path.endswith("/.."):
        output.append("")
    return "/".join(output)


@dataclass(frozen=True)
class Url:
    scheme: str
    host: str = ""
    port: int | None = None
    path: str = ""
    query: str | None = None
    fragment: str | None = None
    username: str = ""
    password: str | None = None
    opaque: str | None = None  # set for cannot-be-a-base URLs (e.g. mailto:)
    _s: str = field(default="", compare=False, repr=False)

    # -- parsing ---------------------------------------------------------

    @staticmethod
    def parse(raw: str) -> "Url":
        if not isinstance(raw, str):
            raise UrlError("not a string")
        # Strip leading/trailing C0 controls and spaces; drop \t \r \n.
        s = raw.strip("".join(chr(c) for c in range(0x21)))
        s = s.replace("\t", "").replace("\n", "").replace("\r", "")
        m = _SCHEME_RE.match(s)
        if not m:
            raise UrlError(f"relative URL without a base: {raw!r}")
        scheme, rest = m.group(1).lower(), m.group(2)

        if scheme not in SPECIAL_SCHEMES:
            if rest.startswith("//"):
                return Url._parse_authority(scheme, rest[2:])
            # Opaque path (cannot be a base).
            frag = None
            if "#" in rest:
                rest, frag = rest.split("#", 1)
            return Url(scheme=scheme, opaque=rest, fragment=frag)

        # Special schemes tolerate any number of slashes after the colon.
        rest = re.sub(r"^[/\\]*", "", rest)
        return Url._parse_authority(scheme, rest)

    @staticmethod
    def _parse_authority(scheme: str, rest: str) -> "Url":
        frag = None
        if "#" in rest:
            rest, frag = rest.split("#", 1)
        query = None
        if "?" in rest:
            rest, query = rest.split("?", 1)

        m2 = re.match(r"^([^/\\]*)(.*)$", rest, re.S)
        authority, path = m2.group(1), m2.group(2)

        username, password = "", None
        if "@" in authority:
            userinfo, authority = authority.rsplit("@", 1)
            if ":" in userinfo:
                username, password = userinfo.split(":", 1)
            else:
                username = userinfo

        host, port = authority, None
        pm = re.match(r"^(\[[^\]]*\]|[^:]*)(?::(\d*))?$", authority)
        if pm:
            host = pm.group(1)
            if pm.group(2):
                port = int(pm.group(2))
        host = host.lower()
        if scheme in SPECIAL_SCHEMES and not host:
            raise UrlError(f"empty host for special scheme {scheme!r}")
        if port is not None and port == SPECIAL_SCHEMES.get(scheme):
            port = None

        path = path.replace("\\", "/")
        if not path:
            path = "/"
        path = _remove_dot_segments(path)
        path = _percent_encode(path, _PATH_ENCODE)
        if query is not None:
            query = _percent_encode(query, _QUERY_ENCODE)
        if frag is not None:
            frag = _percent_encode(frag, _FRAGMENT_ENCODE)

        return Url(
            scheme=scheme,
            host=host,
            port=port,
            path=path,
            query=query,
            fragment=frag,
            username=username,
            password=password,
        )

    # -- accessors mirroring url::Url ------------------------------------

    def cannot_be_a_base(self) -> bool:
        return self.opaque is not None

    def with_userinfo(self, username: str = "", password: str | None = None) -> "Url":
        return replace(self, username=username, password=password)

    def join(self, reference: str) -> "Url":
        """Resolve ``reference`` against self (subset: absolute path,
        relative path, absolute URL — what create_url/sitemaps need)."""
        try:
            return Url.parse(reference)
        except UrlError:
            pass
        if self.cannot_be_a_base():
            raise UrlError("cannot be a base")
        base = replace(self, query=None, fragment=None)
        if reference.startswith("//"):
            return Url._parse_authority(self.scheme, reference[2:])
        if reference.startswith("/"):
            return Url._parse_authority(
                self.scheme, self._authority() + reference
            )._with_userinfo_of(self)
        if reference.startswith("?"):
            return replace(base, query=_percent_encode(reference[1:], _QUERY_ENCODE))
        if reference.startswith("#"):
            return replace(base, fragment=_percent_encode(reference[1:], _FRAGMENT_ENCODE))
        # Relative path.
        dirname = base.path.rsplit("/", 1)[0]
        return Url._parse_authority(
            self.scheme, self._authority() + dirname + "/" + reference
        )._with_userinfo_of(self)

    def _with_userinfo_of(self, other: "Url") -> "Url":
        return replace(self, username=other.username, password=other.password)

    def _authority(self) -> str:
        userinfo = ""
        if self.username or self.password is not None:
            userinfo = self.username
            if self.password is not None:
                userinfo += ":" + self.password
            userinfo += "@"
        hostport = self.host
        if self.port is not None:
            hostport += f":{self.port}"
        return userinfo + hostport

    def host_port(self) -> str:
        """Host (plus non-default port) — the politeness/partition key."""
        return self.host if self.port is None else f"{self.host}:{self.port}"

    def relative(self) -> str:
        """path + ?query + #fragment, exactly as the robots matcher builds
        it (`/root/reference/exclusion/parse/mod.rs:243-258`)."""
        out = self.path
        if self.query is not None:
            out += "?" + self.query
        if self.fragment is not None:
            out += "#" + self.fragment
        return out

    def __str__(self) -> str:
        if self.opaque is not None:
            s = f"{self.scheme}:{self.opaque}"
            if self.fragment is not None:
                s += "#" + self.fragment
            return s
        s = f"{self.scheme}://{self._authority()}{self.path}"
        if self.query is not None:
            s += "?" + self.query
        if self.fragment is not None:
            s += "#" + self.fragment
        return s


def try_parse(raw: str) -> Url | None:
    """``Url::parse(..).ok()`` — the silent-skip idiom used everywhere in
    the reference."""
    try:
        return Url.parse(raw)
    except UrlError:
        return None


def canonical_from_parsed(u: "Url") -> str:
    """Canonical URL-seen key for an ALREADY-PARSED URL — the fast path
    for stages that hold ``Url`` objects (the sitemap parser emits
    them), skipping a redundant serialize→re-parse round trip.
    ``Url.parse`` is idempotent on its own serialization (pinned by
    tests), so this equals ``canonical_url(str(u))`` exactly."""
    return str(u if u.fragment is None else replace(u, fragment=None))


def canonical_url(raw: str) -> str | None:
    """Canonical key for the URL-seen set: parsed/serialized URL with the
    fragment dropped (fragments do not identify distinct fetchable
    resources). Returns None for unparseable input."""
    u = try_parse(raw)
    if u is None:
        return None
    return canonical_from_parsed(u)
