"""Ray Data stages of the crawl pipeline — stateful map_batches actors.

Each stage is a callable CLASS: construction cost (corpus config,
policy compilation, broadcast lookup) is paid once per actor in
``__init__``; ``__call__`` handles one Arrow/pandas batch. This is the
actor-pool pattern the north rule mandates for stateful stages.

Partitioning contract (SURVEY §4): robots fetch/parse and traversal are
keyed by host (one host is processed by exactly one task — per-host
traversal is sequential in the protocol, parallelism is ACROSS hosts);
the gate/dedup stages are keyed by canonical-URL hash; politeness by
the URL's own host.

The small side (per-host policy cache) is broadcast once via
``ray.put`` and read per actor in ``__init__`` — never re-shipped per
batch. That mode is correct to ~10^6 hosts (~200 MB). At the 10^10-URL
design point (≫10^6 hosts) ``crawl(policy_mode="partitioned")``
switches to hash-partition co-location: entries are joined with their
``robots_cache`` row on ``host`` (``Dataset.join`` hash-partitions both
sides on the same key) and gated inside the co-located batches by
``CoPartitionedGate`` — the driver never materializes the host->policy
map at all. ``policy_mode="auto"`` picks by host count.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

import ray

from ..functions.imagegen import stable_hash
from ..kernels.robots import Robots
from ..kernels.traverse import traverse_host
from ..kernels.urlkit import canonical_url, try_parse
from ..synth import USER_AGENT, CorpusConfig

# ---------------------------------------------------------------------------
# Task-pool form of a stage class.
#
# Ray worker PROCESSES persist across tasks, so caching the constructed
# stage per worker gives the actor pool's parse-once/compile-once
# semantics with zero pool startup, no min/max tuning, and full
# elasticity (tasks use every free CPU; an actor pool is capped at its
# max and leaves its reserved cores idle between batches). Measured on
# the 443k-URL scaling corpus: robots stage 0.7 -> 0.2 s, traversal
# 10.6 -> 6.5 s (8 CPUs) / 4.6 -> 3.6 s (32), fetch 23.6 -> 14.8 s at
# 32 CPUs — the fetch win is structural: a TASK map fuses with the
# Write sink, so the 13 GB image payload goes generator -> parquet
# within one task instead of taking an extra object-store round trip.
#
# Actor pools remain where serialized AUTHORITY state demands them —
# the seen-set shards, politeness token buckets, CoPartitionedGate's
# per-partition policy cache, the sitemap sink's counters. Working
# CACHES (chunk LRUs, codec state, compiled policies) measured faster
# as per-worker task state than as bounded pools at bench scale
# (locality loss < startup + width cap); the comments at each call
# site carry the numbers, and every stage class stays pool-compatible
# if a future scale measurement flips the trade.
# ---------------------------------------------------------------------------

_WORKER_STAGES: dict = {}


def _state_key(v) -> str:
    if isinstance(v, ray.ObjectRef):
        return v.hex()  # identity of the broadcast, not its bytes
    r = repr(v)
    if " object at 0x" in r:
        # A default object repr keys by ADDRESS: after address reuse,
        # two different objects would collide and a worker would serve
        # a stage built from the other object's state. Require a
        # value-based repr (dataclass, primitive) or an ObjectRef.
        raise TypeError(
            f"stage_task ctor kwarg {type(v).__name__} has no value-based "
            "repr; pass a dataclass/primitive or broadcast it via ray.put")
    return r


def _run_stage_task(batch, *, _key, _cls, _ctor):
    st = _WORKER_STAGES.get(_key)
    if st is None:
        # Bounded FIFO cache: a worker interleaves tasks of several
        # stages of the same pipeline (plus other cfgs in tests);
        # evicting one entry — never clearing — keeps the hot stages'
        # compiled state resident.
        while len(_WORKER_STAGES) >= 8:
            _WORKER_STAGES.pop(next(iter(_WORKER_STAGES)))
        st = _WORKER_STAGES[_key] = _cls(**_ctor)
    return st(batch)


def stage_task(cls, **ctor_kwargs):
    """Return a plain-function form of stage ``cls`` for task-based
    ``map_batches``: construction runs once per worker process per
    distinct (class, ctor args) and is cached in ``_WORKER_STAGES``."""
    key = (cls.__qualname__,
           tuple(sorted((k, _state_key(v)) for k, v in ctor_kwargs.items())))
    return functools.partial(_run_stage_task, _key=key, _cls=cls,
                             _ctor=ctor_kwargs)

ENTRY_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("host_rank", pa.int64()),
        ("stack_rank", pa.int32()),
        ("pos", pa.int32()),
        ("lastmod", pa.timestamp("us", tz="UTC")),
        ("changefreq", pa.string()),
        ("priority", pa.float32()),
        ("source_sitemap", pa.string()),
    ]
)

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("bucket", pa.int32()),
        ("tick", pa.float64()),
        ("host_rank", pa.int64()),
        ("stack_rank", pa.int32()),
        ("pos", pa.int32()),
    ]
)


def host_bucket(host: str, n_buckets: int) -> int:
    """Stable host -> output-partition bucket (resume granularity)."""
    return stable_hash("bucket", host) % n_buckets


def canonicalize_seeds(batch: pa.Table) -> pa.Table:
    """Seed URLs -> (url, url_key, robots_url, host, seed_rank).

    The SURVEY §3.2 entry step: parse (WHATWG subset), canonicalize
    (fragment dropped), derive the robots.txt URL via ``create_url``
    (create.rs:15-37 — http/https only, credentials stripped); rows
    whose URL cannot yield a robots URL are dropped silently, matching
    the reference's skip-on-invalid idiom."""
    from ..kernels.robots import create_url
    from ..kernels.urlkit import UrlError

    urls = batch["url"].to_pylist()
    ranks = batch["seed_rank"].to_pylist()
    out = {"url": [], "url_key": [], "robots_url": [], "host": [], "seed_rank": []}
    for u, r in zip(urls, ranks):
        parsed = try_parse(u)
        if parsed is None:
            continue
        try:
            robots_url = create_url(parsed)
        except UrlError:
            continue
        out["url"].append(str(parsed))
        out["url_key"].append(canonical_url(u))
        out["robots_url"].append(str(robots_url))
        out["host"].append(parsed.host_port())
        out["seed_rank"].append(r)
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "url_key": pa.array(out["url_key"], pa.string()),
            "robots_url": pa.array(out["robots_url"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "seed_rank": pa.array(out["seed_rank"], pa.int64()),
        }
    )


class RobotsFetchParse:
    """(host, host_rank) -> robots_cache row.

    Fetch outcome -> policy via ``Robots::from_access`` semantics
    (exclusion/parse/mod.rs:144-151); the parsed policy is emitted in
    the serde cache shape (exclusion/parse/serde.rs:14-31) so any later
    stage can rehydrate it without reparsing robots bytes.
    """

    def __init__(self, cfg: CorpusConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        out = {k: [] for k in ("host", "host_rank", "always", "crawl_delay_s",
                               "sitemaps", "policy_json")}
        from ..kernels.robots import create_url
        from ..kernels.urlkit import Url

        for host, rank in zip(
            batch["host"].to_pylist(), batch["host_rank"].to_pylist()
        ):
            access = self.cfg.access(host)
            # create_url derives the robots.txt URL (create.rs:15-37).
            robots_url = str(create_url(Url.parse(f"https://{host}/")))
            blob = self.cfg.fetch(robots_url) if access == "successful" else None
            if blob is None and access == "successful":
                access = "unavailable"
            robots = Robots.from_access(access, blob, USER_AGENT)
            cache = robots.to_cache()
            out["host"].append(host)
            out["host_rank"].append(rank)
            out["always"].append(robots.is_always())
            out["crawl_delay_s"].append(robots.crawl_delay())
            out["sitemaps"].append([str(u) for u in robots.sitemaps()])
            out["policy_json"].append(json.dumps(cache))
        return pa.table(
            {
                "host": pa.array(out["host"], pa.string()),
                "host_rank": pa.array(out["host_rank"], pa.int64()),
                "always": pa.array(out["always"], pa.bool_()),
                "crawl_delay_s": pa.array(out["crawl_delay_s"], pa.float64()),
                "sitemaps": pa.array(out["sitemaps"], pa.list_(pa.string())),
                "policy_json": pa.array(out["policy_json"], pa.string()),
            }
        )


class HostTraverse:
    """(host, host_rank, sitemaps) -> entry rows in reference traversal
    order, tagged with the deterministic (stack_rank, pos) order key.

    The LIFO drive loop (kernels/traverse.py == auto.rs:169-207) runs
    inside the actor: per-host traversal is sequential by protocol, so
    the scalable axis is hosts-per-pool, not parallelism within a host.

    When constructed with ``policies_ref`` the robots gate is fused into
    the same actor (one pool, no extra hop): entries are emitted with
    their verdict already applied plus the ``url_key``/``crawl_delay_s``
    columns the dedup/politeness stages need.
    """

    def __init__(self, cfg: CorpusConfig, policies_ref=None):
        self.cfg = cfg
        self.gate = RobotsGate(policies_ref) if policies_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.urlkit import canonical_from_parsed

        gate = self.gate
        rows = {name: [] for name in ENTRY_SCHEMA.names}
        if gate is not None:
            # Same fusion as SitemapParse: verdict + canonical key on the
            # already-parsed Url, no serialize->re-parse round trip.
            rows["url_key"] = []
            rows["crawl_delay_s"] = []
        fetcher = lambda u: self.cfg.fetch(str(u))
        for host, rank, sitemaps in zip(
            batch["host"].to_pylist(),
            batch["host_rank"].to_pylist(),
            batch["sitemaps"].to_pylist(),
        ):
            urls = [try_parse(s) for s in (sitemaps or [])]
            urls = [u for u in urls if u is not None]
            for t in traverse_host(urls, fetcher):
                e = t.entry
                uhost = e.location.host_port()
                if gate is not None:
                    pol = gate._policy(uhost)
                    if pol is None or not pol.is_absolute_allowed(e.location):
                        continue  # unfetchable host / disallowed path
                    d = pol.crawl_delay()
                    rows["url_key"].append(canonical_from_parsed(e.location))
                    rows["crawl_delay_s"].append(float(d) if d else 0.0)
                rows["url"].append(str(e.location))
                rows["host"].append(uhost)
                rows["host_rank"].append(rank)
                rows["stack_rank"].append(t.stack_rank)
                rows["pos"].append(t.pos)
                rows["lastmod"].append(e.modified)
                rows["changefreq"].append(e.frequency)
                rows["priority"].append(e.priority)
                rows["source_sitemap"].append(t.source_sitemap)
        schema = ENTRY_SCHEMA
        if gate is not None:
            schema = pa.schema(
                list(ENTRY_SCHEMA)
                + [pa.field("url_key", pa.string()),
                   pa.field("crawl_delay_s", pa.float64())]
            )
        return pa.table(rows, schema=schema)


LEAF_SCHEMA = pa.schema(
    [
        ("sitemap_url", pa.string()),
        ("host_rank", pa.int64()),
        ("stack_rank", pa.int32()),
        ("blob", pa.binary()),
        ("child_of_index", pa.bool_()),
    ]
)


class HostExpand:
    """Phase A of the skew-resilient traversal: (host, host_rank,
    sitemaps) -> one row per LEAF sitemap with its deterministic
    listing-derived stack_rank (kernels/traverse.py::expand_sitemaps).

    Only root/index blobs are fetched here (cheap); leaf sitemaps —
    where the bytes and records are — become independent work items, so
    a skewed host with hundreds of child sitemaps fans out across the
    whole SitemapParse pool instead of serializing in one actor."""

    def __init__(self, cfg: CorpusConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.traverse import expand_sitemaps

        rows = {name: [] for name in LEAF_SCHEMA.names}
        fetcher = lambda u: self.cfg.fetch(str(u))
        for host, rank, sitemaps in zip(
            batch["host"].to_pylist(),
            batch["host_rank"].to_pylist(),
            batch["sitemaps"].to_pylist(),
        ):
            urls = [try_parse(s) for s in (sitemaps or [])]
            urls = [u for u in urls if u is not None]
            for leaf_url, srank, blob, child in expand_sitemaps(urls, fetcher):
                rows["sitemap_url"].append(str(leaf_url))
                rows["host_rank"].append(rank)
                rows["stack_rank"].append(srank)
                rows["blob"].append(blob)
                rows["child_of_index"].append(child)
        return pa.table(rows, schema=LEAF_SCHEMA)


class SitemapParse:
    """Phase B: one leaf sitemap row -> its entry rows (fetching the
    blob if phase A didn't carry it; nested-index children dropped at
    sniff, auto.rs:190-193). With ``policies_ref`` the robots gate is
    fused in, as in HostTraverse."""

    def __init__(self, cfg: CorpusConfig, policies_ref=None):
        self.cfg = cfg
        self.gate = RobotsGate(policies_ref) if policies_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.sitemap import sniff_format
        from ..kernels.traverse import iter_leaf_records
        from ..kernels.urlkit import canonical_from_parsed

        gate = self.gate
        rows = {name: [] for name in ENTRY_SCHEMA.names}
        if gate is not None:
            # Gate fused into the record loop: each record's location is
            # ALREADY a parsed Url here, so the verdict + canonical key
            # run on it directly — the separate RobotsGate pass would
            # serialize and re-parse every URL twice (measured ~40% of
            # this stage's CPU at 443k entries).
            rows["url_key"] = []
            rows["crawl_delay_s"] = []
        for url_s, rank, srank, blob, child in zip(
            batch["sitemap_url"].to_pylist(),
            batch["host_rank"].to_pylist(),
            batch["stack_rank"].to_pylist(),
            batch["blob"].to_pylist(),
            batch["child_of_index"].to_pylist(),
        ):
            if blob is None:
                blob = self.cfg.fetch(url_s)
                if blob is None:
                    continue  # fetch error -> skipped
            fmt = sniff_format(blob)
            if fmt == "index":
                continue  # nested index dropped
            for pos, rec in enumerate(iter_leaf_records(fmt, blob)):
                e = rec
                host = e.location.host_port()
                if gate is not None:
                    pol = gate._policy(host)
                    if pol is None or not pol.is_absolute_allowed(e.location):
                        continue  # unfetchable host / disallowed path
                    d = pol.crawl_delay()
                    rows["url_key"].append(canonical_from_parsed(e.location))
                    rows["crawl_delay_s"].append(float(d) if d else 0.0)
                rows["url"].append(str(e.location))
                rows["host"].append(host)
                rows["host_rank"].append(rank)
                rows["stack_rank"].append(srank)
                rows["pos"].append(pos)
                rows["lastmod"].append(e.modified)
                rows["changefreq"].append(e.frequency)
                rows["priority"].append(e.priority)
                rows["source_sitemap"].append(url_s)
        schema = ENTRY_SCHEMA
        if gate is not None:
            schema = pa.schema(
                list(ENTRY_SCHEMA)
                + [pa.field("url_key", pa.string()),
                   pa.field("crawl_delay_s", pa.float64())]
            )
        return pa.table(rows, schema=schema)


class RobotsGate:
    """Filter entries by the URL's OWN host policy; attach the canonical
    URL-seen key and that host's crawl-delay.

    The policy cache arrives as one broadcast object-store ref
    (``ray.put`` once on the driver); each actor rehydrates into
    compiled ``Robots`` lazily per host (LRU-ish dict — hosts per actor
    are bounded by the hash partition width). Verdict core:
    inner.rs:92-110 via kernels/robots.py.
    """

    def __init__(self, policies_ref):
        import json

        raw = ray.get(policies_ref)  # {host: policy_json}
        self._raw = raw
        self._json = json
        self._compiled: dict[str, Robots | None] = {}

    def _policy(self, host: str) -> Robots | None:
        if host not in self._compiled:
            j = self._raw.get(host)
            self._compiled[host] = (
                Robots.from_cache(self._json.loads(j)) if j is not None else None
            )
        return self._compiled[host]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        keep = np.zeros(len(urls), dtype=bool)
        delays = np.zeros(len(urls), dtype=np.float64)
        keys: list[str | None] = [None] * len(urls)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            pol = self._policy(h)
            if pol is None:
                continue  # host outside the corpus: unfetchable
            parsed = try_parse(u)
            if parsed is None:
                continue
            if pol.is_absolute_allowed(parsed):
                keep[i] = True
                keys[i] = canonical_url(u)
                d = pol.crawl_delay()
                delays[i] = float(d) if d else 0.0
        batch = batch.append_column("url_key", pa.array(keys, pa.string()))
        batch = batch.append_column("crawl_delay_s", pa.array(delays))
        return batch.filter(pa.array(keep))


class CoPartitionedGate:
    """Partitioned-mode robots gate — the ≫10^6-host scale path.

    Entries arrive already hash-co-located with their host's
    ``policy_json`` (``Dataset.join`` on ``host`` partitions both the
    entries and the robots_cache by the same key hash), so each batch
    carries the policies it needs as a column instead of every actor
    holding a broadcast of ALL policies. Policies compile once per host
    per actor (a hash partition holds a bounded host set, and one host's
    rows land in one partition — the distributed analogue of the
    parse-once/match-many ``Arc`` policy, exclusion/parse/mod.rs:67-70).
    Verdict core identical to RobotsGate (inner.rs:92-110)."""

    def __init__(self):
        import json

        self._json = json
        self._compiled: dict[str, Robots] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        pjs = batch["policy_json"].to_pylist()
        keep = np.zeros(len(urls), dtype=bool)
        delays = np.zeros(len(urls), dtype=np.float64)
        keys: list[str | None] = [None] * len(urls)
        for i, (u, h, pj) in enumerate(zip(urls, hosts, pjs)):
            if pj is None:
                continue  # no robots_cache row: unfetchable host
            pol = self._compiled.get(h)
            if pol is None:
                pol = Robots.from_cache(self._json.loads(pj))
                if len(self._compiled) >= 200_000:
                    # A hash partition's host set is bounded but can
                    # still be large at the 10^10 design point; recycle
                    # rather than grow without bound (entries arrive
                    # host-clustered after the join, so eviction cost
                    # is one recompile per ~200k hosts).
                    self._compiled.clear()
                self._compiled[h] = pol
            parsed = try_parse(u)
            if parsed is None:
                continue
            if pol.is_absolute_allowed(parsed):
                keep[i] = True
                keys[i] = canonical_url(u)
                d = pol.crawl_delay()
                delays[i] = float(d) if d else 0.0
        batch = batch.append_column("url_key", pa.array(keys, pa.string()))
        batch = batch.append_column("crawl_delay_s", pa.array(delays))
        batch = batch.filter(pa.array(keep))
        return batch.select(
            [n for n in batch.column_names if n != "policy_json"]
        )


class PageFetch:
    """(url rows) -> image+caption rows (input_hint schema).

    Deterministic synthetic fetch: pixels/caption/phash are pure
    functions of the URL (functions/imagegen.py). On a real cluster
    this actor holds the HTTP client + per-host connection state; here
    it holds the corpus config. Binary payloads are large — callers
    must use a small ``batch_size``.
    """

    def __init__(self, cfg: CorpusConfig, n_buckets: int = 16):
        self.cfg = cfg
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in IMAGE_SCHEMA.names}
        # The schedule carries the bucket column (assigned in stage 2);
        # recompute only if fed a pre-v2 schedule without it.
        if "bucket" in batch.column_names:
            buckets = batch["bucket"].to_pylist()
        else:  # pragma: no cover - legacy schedules only
            buckets = [host_bucket(h, self.n_buckets)
                       for h in batch["host"].to_pylist()]
        for url, host, bucket, tick, host_rank, stack_rank, pos in zip(
            batch["url"].to_pylist(),
            batch["host"].to_pylist(),
            buckets,
            batch["tick"].to_pylist(),
            batch["host_rank"].to_pylist(),
            batch["stack_rank"].to_pylist(),
            batch["pos"].to_pylist(),
        ):
            img = self.cfg.page(url)
            for k, v in img.items():
                rows[k].append(v)
            rows["payload_bytes"].append(len(img["bytes"]))  # countio parity
            rows["url"].append(url)
            rows["host"].append(host)
            rows["bucket"].append(bucket)
            rows["tick"].append(tick)
            rows["host_rank"].append(host_rank)
            rows["stack_rank"].append(stack_rank)
            rows["pos"].append(pos)
        return pa.table(rows, schema=IMAGE_SCHEMA)
