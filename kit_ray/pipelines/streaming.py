"""Incremental frontier loop — the SURVEY §3.2 driver while-loop.

The batch pipeline (pipelines/crawl.py) processes a fixed seed list in
one shot. This module is the round-based mode: seed hosts arrive in
waves, the URL-seen set persists ACROSS rounds in sharded filter actors
(state/seen.py), and per-host fetch ticks continue monotonically via
token-bucket authority actors (stages/politeness.py). New rounds only
fetch URLs never seen in any earlier round.

Determinism contract: within a round, duplicates resolve by the same
(host_rank, stack_rank, pos) discovery order as the batch mode (exact
sort-based dedup); across rounds, first-round-wins. The politeness
authority serializes per host (one shard actor owns a host), so ticks
are reproducible given the same round sequence.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data as rd

from ..kernels.urlkit import canonical_url
from ..stages.crawl_stages import HostTraverse, RobotsFetchParse
from ..stages.politeness import PolitenessPool
from ..state.seen import SeenSet
from ..synth import CorpusConfig
from .crawl import dedup_first_sorted


class FrontierState:
    """Cross-round state: seen shards + politeness authorities."""

    def __init__(self, n_seen_shards: int = 16, n_polite_shards: int = 8,
                 use_ray: bool = True, exact_seen: bool = True):
        self.seen = SeenSet(n_seen_shards, use_ray=use_ray, exact=exact_seen)
        self.polite = PolitenessPool(n_polite_shards, use_ray=use_ray)
        self.round = 0

    def checkpoint(self, dir_path: str):
        self.seen.checkpoint(dir_path)
        self.polite.checkpoint(dir_path)

    def restore(self, dir_path: str) -> bool:
        ok = self.seen.restore(dir_path)
        self.polite.restore(dir_path)  # optional (older checkpoints)
        return ok


def crawl_round(
    cfg: CorpusConfig,
    state: FrontierState,
    hosts: list[str],
    host_rank_offset: int = 0,
    concurrency: int = 4,
) -> pd.DataFrame:
    """One frontier round: robots -> traversal+gate -> in-round dedup ->
    cross-round seen filter -> politeness ticks. Returns the round's
    scheduled rows (url, host, tick, order keys) sorted by
    (tick, host_rank, stack_rank, pos)."""
    state.round += 1
    seeds = rd.from_items(
        [
            {"host": h, "host_rank": host_rank_offset + i}
            for i, h in enumerate(hosts)
        ]
    ).repartition(max(1, min(len(hosts), concurrency * 2)))

    robots = seeds.map_batches(
        RobotsFetchParse,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, concurrency),
        num_cpus=1,
    ).materialize()

    rdf = robots.select_columns(["host", "policy_json", "crawl_delay_s"]).to_pandas()
    policies_ref = ray.put(dict(zip(rdf["host"], rdf["policy_json"])))
    state.polite.set_delays(
        {h: float(d) if pd.notna(d) else 0.0
         for h, d in zip(rdf["host"], rdf["crawl_delay_s"])}
    )

    gated = robots.select_columns(["host", "host_rank", "sitemaps"]).map_batches(
        HostTraverse,
        fn_constructor_kwargs={"cfg": cfg, "policies_ref": policies_ref},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    deduped = dedup_first_sorted(gated)

    # Cross-round anti-join against the persistent seen set, then ticks
    # from the per-host authorities — per host group so each authority
    # sees one ordered request stream (deterministic).
    seen, polite = state.seen, state.polite

    def filter_and_tick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host_rank", "stack_rank", "pos"], kind="stable")
        new = seen.offer([canonical_url(u) or u for u in g["url"]])
        g = g[pd.Series(new, index=g.index)]
        if not len(g):
            return g.assign(tick=pd.Series(dtype="float64"))
        g = g.assign(tick=polite.schedule(list(g["host"])))
        return g

    out = (
        deduped.groupby("host")
        .map_groups(filter_and_tick, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return out
    return out.sort_values(
        ["tick", "host_rank", "stack_rank", "pos"], kind="stable"
    ).reset_index(drop=True)
