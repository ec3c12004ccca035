"""Deterministic synthetic web corpus.

Generates, purely from ``(seed, n_hosts, pages_per_host)``, an entire
"web": per-host robots.txt (via the ported RobotsBuilder), sitemap
trees (urlset / sitemapindex / plain TXT, via the ported builders) and
per-URL image+caption payloads (functions/imagegen.py). Every blob is a
pure function of the config, so fetch actors on any node regenerate
identical bytes without shipping state — the sandbox stand-in for the
network that lets the Ray engine and the single-process oracle see the
same web.

Host layout variety (selected by stable hash) exercises every traversal
path of the reference drive loop (auto.rs:169-207):

- ``plain``    one TXT sitemap
- ``urlset``   one XML urlset
- ``index``    sitemapindex -> k urlsets (one-level expansion)
- ``nested``   like index, plus a child that is itself an index (dropped,
               auto.rs:190-193)
- ``multi``    two Sitemap: lines in robots.txt (LIFO order observable)

Robots access results rotate: most hosts successful, every 13th
unavailable (allow-all), every 17th unreachable (disallow-all), every
19th redirect (allow-all) — exclusion/parse/access.rs semantics.
Duplicate URLs (within a host and cross-host) are planted to exercise
the URL-seen set.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from .functions.imagegen import make_image_row, stable_hash
from .kernels.robots_build import RobotsBuilder
from .kernels.sitemap import Entry, IndexRecord, build_plain, build_sitemapindex, build_urlset
from .kernels.urlkit import Url

USER_AGENT = "graftbot"

_LAYOUTS = ("plain", "urlset", "index", "nested", "multi")
_DELAYS = (None, 1, 2, 5)
_FREQS = (None, "daily", "weekly", "monthly", "always", "never", "hourly", "yearly")


@dataclass(frozen=True)
class CorpusConfig:
    seed: int = 42
    n_hosts: int = 20
    pages_per_host: int = 50
    urls_per_sitemap: int = 25  # split point for index layouts
    image_scale: int = 1  # payload-size multiplier (benchmark knob)
    # Skew (FIXTURES.md §5): every ``hot_every``-th host carries
    # ``hot_factor`` x the pages — 0 disables. Hot hosts use the index
    # layout so their URLs spread over many child sitemaps, which the
    # two-phase traversal parallelizes across the pool.
    hot_every: int = 0
    hot_factor: int = 20

    def hosts(self) -> list[str]:
        return [f"host{i:05d}.example" for i in range(self.n_hosts)]

    def seed_urls(self) -> list[str]:
        """A realistic messy seed list: one URL per host in host order,
        with credentialed URLs, duplicate aliases, and invalid rows
        (wrong scheme / unparseable) sprinkled in — exercising the
        canonicalize/create_url entry stage (create.rs:15-37). The
        per-host FIRST valid URL defines host_rank, so the derived host
        order equals ``hosts()``."""
        out = []
        for i, h in enumerate(self.hosts()):
            if i % 5 == 1:
                out.append(f"https://user:pass@{h}/deep/page.html")  # creds stripped
            elif i % 5 == 2:
                out.append(f"HTTPS://{h.upper()}/")  # case-normalized
            else:
                out.append(f"https://{h}/")
            if i % 7 == 3:
                out.append(f"https://{h}/alias#frag")  # same-host duplicate
            if i % 6 == 0:
                out.append(f"ftp://{h}/not-crawlable")  # wrong scheme: dropped
            if i % 9 == 4:
                out.append("not a url at all")  # unparseable: dropped
        return out

    # -- per-host derived properties -------------------------------------

    def is_hot(self, host: str) -> bool:
        i = int(host[4:9])
        return bool(self.hot_every) and i % self.hot_every == 0

    def pages_for(self, host: str) -> int:
        return self.pages_per_host * (self.hot_factor if self.is_hot(host) else 1)

    def layout(self, host: str) -> str:
        if self.is_hot(host):
            return "index"  # many child sitemaps -> parallel phase B
        return _LAYOUTS[stable_hash("layout", str(self.seed), host) % len(_LAYOUTS)]

    def crawl_delay(self, host: str) -> int | None:
        return _DELAYS[stable_hash("delay", str(self.seed), host) % len(_DELAYS)]

    def access(self, host: str) -> str:
        i = int(host[4:9])
        if i and i % 17 == 0:
            return "unreachable"
        if i and i % 13 == 0:
            return "unavailable"
        if i and i % 19 == 0:
            return "redirect"
        return "successful"

    # -- URL inventory ----------------------------------------------------

    def page_urls(self, host: str) -> list[str]:
        """All URLs this host's sitemaps advertise, in sitemap document
        order. Mix of allowed pages, /private/ pages (robots-blocked),
        an in-host duplicate and a cross-host link."""
        urls = []
        for j in range(self.pages_for(host)):
            if j % 10 == 7:
                urls.append(f"https://{host}/private/doc{j}.html")
            elif j % 10 == 3:
                urls.append(f"https://{host}/img/{j}.png?size=large")
            else:
                urls.append(f"https://{host}/p/{j}.html")
        # In-host duplicate: first page listed again near the end.
        if self.pages_per_host >= 5:
            urls.append(f"https://{host}/p/0.html")
        # Cross-host link: next host's page 1 (wraps around).
        i = int(host[4:9])
        nxt = f"host{(i + 1) % self.n_hosts:05d}.example"
        urls.append(f"https://{nxt}/p/1.html")
        return urls

    # -- robots.txt --------------------------------------------------------

    def sitemap_urls(self, host: str) -> list[str]:
        base = f"https://{host}"
        lay = self.layout(host)
        if lay == "plain":
            return [f"{base}/sitemap.txt"]
        if lay in ("index", "nested"):
            return [f"{base}/sitemap_index.xml"]
        if lay == "multi":
            return [f"{base}/sitemap_a.xml", f"{base}/sitemap_b.xml"]
        return [f"{base}/sitemap.xml"]

    def robots_txt(self, host: str) -> bytes:
        b = RobotsBuilder().header(f"synthetic corpus seed={self.seed}")
        delay = self.crawl_delay(host)

        def rules(g):
            g = g.disallow("/private/").disallow("/*.bin$").allow("/private/open/")
            if delay is not None:
                g = g.crawl_delay(delay)
            return g

        b = b.group([USER_AGENT], rules)
        b = b.group(["*"], lambda g: g.disallow("/"))
        for sm in self.sitemap_urls(host):
            b = b.sitemap(sm)
        return str(b).encode()

    # -- sitemap blobs -----------------------------------------------------

    def _entries(self, host: str, urls: list[str]) -> list[Entry]:
        out = []
        for u in urls:
            k = stable_hash("meta", str(self.seed), u)
            e = Entry(Url.parse(u))
            if k % 3 == 0:
                e.modified = datetime(
                    2023, 1 + k % 12, 1 + (k >> 8) % 28,
                    (k >> 16) % 24, (k >> 24) % 60, (k >> 32) % 60,
                    tzinfo=timezone.utc,
                )
            freq = _FREQS[(k >> 4) % len(_FREQS)]
            if freq:
                e.frequency = freq
            if k % 5 == 0:
                e.priority = round(((k >> 12) % 11) / 10.0, 1)
            out.append(e)
        return out

    def _chunks(self, urls: list[str]) -> list[list[str]]:
        n = self.urls_per_sitemap
        return [urls[i : i + n] for i in range(0, len(urls), n)] or [[]]

    def fetch(self, url: str) -> bytes | None:
        """The sitemap/robots 'network': URL -> blob, or None (404)."""
        try:
            u = Url.parse(url)
        except Exception:
            return None
        host, path = u.host, u.path
        if host not in set(self.hosts()):
            return None
        base = f"https://{host}"
        urls = self.page_urls(host)
        lay = self.layout(host)

        if path == "/robots.txt":
            return self.robots_txt(host) if self.access(host) == "successful" else None

        if lay == "plain" and path == "/sitemap.txt":
            return build_plain([Url.parse(x) for x in urls])

        if lay == "urlset" and path == "/sitemap.xml":
            return build_urlset(self._entries(host, urls))

        if lay in ("index", "nested") and path == "/sitemap_index.xml":
            chunks = self._chunks(urls)
            recs = [
                IndexRecord(Url.parse(f"{base}/sitemap_part{i}.xml"))
                for i in range(len(chunks))
            ]
            if lay == "nested":
                # A child that is itself an index — must be dropped.
                recs.insert(1, IndexRecord(Url.parse(f"{base}/sitemap_nested.xml")))
            return build_sitemapindex(recs)

        if lay in ("index", "nested") and path.startswith("/sitemap_part"):
            i = int(path[len("/sitemap_part") : -len(".xml")])
            chunks = self._chunks(urls)
            if i >= len(chunks):
                return None
            return build_urlset(self._entries(host, chunks[i]))

        if lay == "nested" and path == "/sitemap_nested.xml":
            return build_sitemapindex(
                [IndexRecord(Url.parse(f"{base}/sitemap_part0.xml"))]
            )

        if lay == "multi" and path in ("/sitemap_a.xml", "/sitemap_b.xml"):
            half = len(urls) // 2
            part = urls[:half] if path == "/sitemap_a.xml" else urls[half:]
            return build_urlset(self._entries(host, part))

        return None

    # -- page payloads -----------------------------------------------------

    def page(self, url: str) -> dict:
        """Fetch a page -> image+caption row (input_hint schema)."""
        return make_image_row(url, self.seed, self.image_scale)


def config_for_sf_dir(sf_dir: str) -> CorpusConfig:
    """Map a testdata scale-factor dir onto a corpus size so bench and
    driver runs scale with sf. Deterministic (seed fixed at 42)."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    table = {
        "sf0.001": CorpusConfig(seed=42, n_hosts=12, pages_per_host=40),
        "sf0.01": CorpusConfig(seed=42, n_hosts=40, pages_per_host=120),
        "sf0.1": CorpusConfig(seed=42, n_hosts=120, pages_per_host=400),
    }
    return table.get(name, CorpusConfig(seed=42, n_hosts=40, pages_per_host=120))
