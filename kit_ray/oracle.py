"""Single-process reference oracle for the crawl pipeline.

spire-rs/kit ships no executable — it is a protocol library whose
caller owns the frontier. This oracle IS the executable reference: a
straight-line transliteration of the intended caller behavior —
``Robots::from_access`` -> policy, ``AutoParser`` traversal
(kernels/traverse.py, shared with the engine because per-host traversal
is sequential by protocol), robots gate, first-occurrence URL-seen set,
and a deterministic virtual-clock politeness schedule.

The ordering contract (what "crawl order bit-match" means, SURVEY §3.2):

- hosts are processed in seed-list order; ``host_rank`` = seed index;
- within a host, entries carry ``(stack_rank, pos)`` from the LIFO
  traversal;
- discovery order key = ``(host_rank, stack_rank, pos)``;
- the URL-seen set keeps the FIRST occurrence of each canonical URL in
  discovery order;
- politeness: per OWN host (the URL's host, not the discovering host),
  surviving URLs are ordered by discovery key and scheduled at virtual
  ticks ``0, d, 2d, ...`` where ``d`` = that host's Crawl-Delay
  (parser.rs:99-111 minimum rule; no delay -> d=0);
- final crawl order = sort by ``(tick, host_rank, stack_rank, pos)``;
  ``fetch_seq`` enumerates it.

The Ray engine must reproduce ``crawl order``, the seen set, and every
fetched image row exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernels.robots import Robots
from .kernels.traverse import traverse_host
from .kernels.urlkit import canonical_url, try_parse
from .synth import USER_AGENT, CorpusConfig


@dataclass
class OracleResult:
    # discovery-ordered surviving rows:
    # url, host, host_rank, stack_rank, pos, tick, fetch_seq
    crawl_order: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    blocked: list[str] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    robots_cache: dict[str, dict] = field(default_factory=dict)


def run_oracle(cfg: CorpusConfig, with_images: bool = True,
               budget_per_host: int | None = None) -> OracleResult:
    res = OracleResult()
    hosts = cfg.hosts()

    # 1. robots fetch + parse per host (Robots::from_access semantics).
    policies: dict[str, Robots] = {}
    for host in hosts:
        access = cfg.access(host)
        blob = cfg.fetch(f"https://{host}/robots.txt") if access == "successful" else None
        policies[host] = Robots.from_access(access, blob, USER_AGENT)
        res.robots_cache[host] = policies[host].to_cache()

    # 2. per-host LIFO traversal, in seed order -> discovery stream.
    discovered: list[dict] = []
    for host_rank, host in enumerate(hosts):
        pol = policies[host]
        fetcher = lambda u: cfg.fetch(str(u))  # noqa: B023 — rebound per loop is fine
        for t in traverse_host(pol.sitemaps(), fetcher):
            u = t.entry.location
            discovered.append(
                {
                    "url": str(u),
                    "host": u.host_port(),
                    "host_rank": host_rank,
                    "stack_rank": t.stack_rank,
                    "pos": t.pos,
                }
            )

    # 3. robots gate by the URL's OWN host policy (unknown host -> no
    #    policy -> unreachable-equivalent disallow... no: a host outside
    #    the corpus cannot be fetched at all; treat as blocked).
    gated: list[dict] = []
    for row in discovered:
        pol = policies.get(row["host"])
        u = try_parse(row["url"])
        if pol is None or u is None or not pol.is_absolute_allowed(u):
            res.blocked.append(row["url"])
            continue
        gated.append(row)

    # 4. URL-seen: first occurrence in discovery order wins.
    surviving: list[dict] = []
    for row in gated:
        key = canonical_url(row["url"])
        if key is None or key in res.seen:
            continue
        res.seen.add(key)
        surviving.append(row)

    # 5. politeness virtual clock per own-host queue.
    by_host: dict[str, list[dict]] = {}
    for row in surviving:
        by_host.setdefault(row["host"], []).append(row)
    dropped_by_budget: set[int] = set()
    for host, rows in by_host.items():
        pol = policies.get(host)
        delay = pol.crawl_delay() if pol else None
        d = float(delay) if delay else 0.0
        rows.sort(key=lambda r: (r["host_rank"], r["stack_rank"], r["pos"]))
        if budget_per_host is not None:
            for row in rows[budget_per_host:]:
                dropped_by_budget.add(id(row))
            rows = rows[:budget_per_host]
        for i, row in enumerate(rows):
            row["tick"] = i * d
    if budget_per_host is not None:
        surviving = [r for r in surviving if id(r) not in dropped_by_budget]

    # 6. final crawl order.
    surviving.sort(key=lambda r: (r["tick"], r["host_rank"], r["stack_rank"], r["pos"]))
    for seq, row in enumerate(surviving):
        row["fetch_seq"] = seq
    res.crawl_order = surviving

    # 7. page fetch -> image rows.
    if with_images:
        for row in surviving:
            img = cfg.page(row["url"])
            img["url"] = row["url"]
            img["fetch_seq"] = row["fetch_seq"]
            res.images.append(img)

    return res
