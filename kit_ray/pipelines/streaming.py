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
from ..stages.crawl_stages import HostTraverse, RobotsFetchParse, stage_task
from ..stages.politeness import PolitenessPool
from ..state.seen import SeenSet
from ..synth import CorpusConfig
from .crawl import (
    dedup_first_sorted,
    hash_partition_by_host,
    hosts_block_disjoint,
    widen_schedule_partitions,
)


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

    def shutdown(self):
        """Kill the state actors when the frontier's lifetime ends."""
        self.seen.shutdown()
        self.polite.shutdown()


# The round's schedule contract: a FIXED column set in BOTH policy
# modes (a consumer reading rounds written under different modes must
# see one schema), UNSORTED with order keys attached — same contract as
# the batch pipeline's crawl_order (crawl.py:20-27). Consumers needing
# global (tick, ...) order sort the small metadata at read time; a
# per-round global sort paid a fixed ~2.5 s sample/boundary/barrier
# cost regardless of CPUs, and a round can be most of the frontier at
# the 10^10 design point.
ROUND_SCHEDULE_COLUMNS = [
    "url", "host", "url_key", "tick",
    "host_rank", "stack_rank", "pos", "crawl_delay_s",
]


def crawl_round(
    cfg: CorpusConfig,
    state: FrontierState,
    hosts: list[str],
    host_rank_offset: int = 0,
    concurrency: int = 4,
    out_dir: str | None = None,
    policy_mode: str = "auto",
    broadcast_max_hosts: int = 1_000_000,
):
    """One frontier round: robots -> traversal+gate -> in-round dedup ->
    cross-round seen filter -> politeness ticks. Returns the round's
    schedule as a materialized ray.data.Dataset with the fixed
    ``ROUND_SCHEDULE_COLUMNS`` schema, UNSORTED with its order keys
    attached (sort-at-read contract, see above) — blocks stay in
    the object store; the driver never collects the round (a round can
    be most of the frontier at the 10^10 design point). With ``out_dir``
    the round is also written as ``round=K/`` parquet with a lineage
    manifest, like the batch pipeline's stage checkpoints.

    ``policy_mode`` mirrors the batch pipeline (crawl.py): "broadcast"
    ships the whole per-host policy cache once via ``ray.put`` and fuses
    the gate into the traversal pool; "partitioned" (the ≫10^6-host
    round path) never materializes the cache anywhere — entries
    hash-join their host's ``policy_json`` row and gate in
    ``CoPartitionedGate``, and per-host crawl delays reach the
    politeness authorities from each host-complete BLOCK rather than a
    driver-side dict. "auto" picks by round host count."""
    state.round += 1
    if policy_mode == "auto":
        policy_mode = ("broadcast" if len(hosts) <= broadcast_max_hosts
                       else "partitioned")
    seeds = rd.from_items(
        [
            {"host": h, "host_rank": host_rank_offset + i}
            for i, h in enumerate(hosts)
        ]
    ).repartition(max(1, min(len(hosts), concurrency * 2)))

    # Task pool with per-worker state cache (stages/crawl_stages.py):
    # actor-pool startup dominated this short per-round stage.
    robots = seeds.map_batches(
        stage_task(RobotsFetchParse, cfg=cfg),
        batch_format="pyarrow",
        batch_size=16,
        num_cpus=1,
    ).materialize()

    # Parallelism floor; corrected from measured bytes after the
    # shuffle (crawl.widen_schedule_partitions).
    nparts = max(2, min(concurrency, 16))
    delays_from_block = policy_mode == "partitioned"
    if policy_mode == "broadcast":
        rdf = robots.select_columns(
            ["host", "policy_json", "crawl_delay_s"]).to_pandas()
        policies_ref = ray.put(dict(zip(rdf["host"], rdf["policy_json"])))
        state.polite.set_delays(
            {h: float(d) if pd.notna(d) else 0.0
             for h, d in zip(rdf["host"], rdf["crawl_delay_s"])}
        )
        gated = robots.select_columns(
            ["host", "host_rank", "sitemaps"]).map_batches(
            stage_task(HostTraverse, cfg=cfg, policies_ref=policies_ref),
            batch_format="pyarrow",
            batch_size=2,
            num_cpus=1,
        )
    else:
        # Ungated traversal; the hash join below co-locates each entry
        # with its host's policy row AND leaves the output
        # host-complete, so the gate feeds the schedule with no second
        # shuffle and no broadcast of the policy cache.
        from ..stages.crawl_stages import CoPartitionedGate

        entries = robots.select_columns(
            ["host", "host_rank", "sitemaps"]).map_batches(
            stage_task(HostTraverse, cfg=cfg),
            batch_format="pyarrow",
            batch_size=2,
            num_cpus=1,
        )
        pol_side = robots.select_columns(["host", "policy_json"])
        gated = entries.join(
            pol_side, join_type="inner",
            num_partitions=nparts,
            on=("host",), right_on=("host",),
            # Aggregators route/buffer only; a CPU reservation stacks
            # on the pool minimums and can starve tasks (see crawl.py).
            aggregator_ray_remote_args={"num_cpus": 0},
        ).map_batches(
            CoPartitionedGate,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=(1, max(2, concurrency)),
            num_cpus=1,
        )

    # In-round dedup + cross-round anti-join + ticks in ONE host-hash
    # shuffle — the batch pipeline's schedule shape. A url_key embeds
    # its host, so a host-complete block computes all three exactly:
    #
    #   1. in-block sort on (url_key, order) + drop_duplicates = the
    #      in-round URL-seen dedup;
    #   2. one BATCHED offer RPC per block filters cross-round dupes
    #      (in-round dupes are already gone, so concurrent offers of
    #      distinct URLs commute; cross-round membership was fixed
    #      before the round — deterministic);
    #   3. ONE reserve() RPC per block atomically advances its hosts'
    #      cross-round counters (a host lives in exactly one block, so
    #      per-host reservation happens once; blocks reserve disjoint
    #      host sets — order-free). Ticks are then a block-local
    #      cumcount, no driver metadata, no range sort.
    #
    #   The stage materializes immediately: offer/reserve are
    #   at-least-once under task retry, exactly as the previous
    #   offer-then-materialize shape; checkpoint/restore owns
    #   crash-resume determinism.
    seen, polite = state.seen, state.polite
    order_cols = ["host", "host_rank", "stack_rank", "pos"]
    if delays_from_block:
        # The join already left each block host-complete; a second
        # keyed repartition would be a pure wasted shuffle.
        joined = gated.materialize()
    else:
        joined = hash_partition_by_host(gated, nparts)
    joined, nparts = widen_schedule_partitions(joined, concurrency, nparts)

    if joined.num_blocks() == nparts and hosts_block_disjoint(joined):
        def round_block(df: pd.DataFrame):
            # Returns ARROW for non-empty blocks (pandas blocks poison
            # downstream consumers — see crawl.py add_bucket note).
            import pyarrow as _pa

            if not len(df):
                return df.assign(tick=pd.Series(dtype="float64"))
            df = df.sort_values(
                ["url_key", "host_rank", "stack_rank", "pos"], kind="stable"
            )
            df = df.drop_duplicates(subset=["url_key"], keep="first")
            df = df.sort_values(order_cols, kind="stable")
            new = seen.offer(list(df["url_key"]))
            df = df[pd.Series(new, index=df.index)]
            if not len(df):
                return df.assign(tick=pd.Series(dtype="float64"))
            if delays_from_block:
                # Partitioned mode: a host lives in exactly one block,
                # so ITS block is the delay authority — per-host delays
                # flow to the politeness shards from here (bounded by
                # this block's host set), never as a driver-side dict
                # of every host in the round.
                polite.set_delays(
                    df.groupby("host", sort=False)["crawl_delay_s"]
                    .first().astype("float64").to_dict()
                )
            idx = df.groupby("host", sort=False).cumcount().to_numpy()
            counts = df["host"].value_counts()
            bases = polite.reserve({h: int(n) for h, n in counts.items()})
            base = df["host"].map({h: b for h, (b, _) in bases.items()}).to_numpy()
            delay = df["host"].map({h: d for h, (_, d) in bases.items()}).to_numpy()
            df = df.assign(tick=(base + idx).astype("float64") * delay)
            if not len(df):
                return df
            return _pa.Table.from_pandas(df, preserve_index=False)

        scheduled = joined.map_batches(
            round_block, batch_format="pandas", batch_size=None
        )
    else:  # pragma: no cover - split partition blocks (never observed)
        if delays_from_block:
            # The sorted fallback reads delays from the authorities:
            # feed them per-block first (distinct hosts per block, tiny
            # rows), not as one driver dict of the whole round.
            def _push_delays(df: pd.DataFrame) -> pd.DataFrame:
                if len(df):
                    polite.set_delays(
                        df.groupby("host", sort=False)["crawl_delay_s"]
                        .first().astype("float64").to_dict())
                return df.iloc[0:0][["host"]]

            joined.map_batches(
                _push_delays, batch_format="pandas", batch_size=None
            ).materialize()
        scheduled = _round_schedule_sorted(
            dedup_first_sorted(joined), state
        )

    # One materialize: the projection fuses onto the schedule map, the
    # seen-offer/reserve RPCs run exactly once per block here (as the
    # previous offer-then-materialize shape), and no global sort runs —
    # the round is returned unsorted with its order keys per the
    # ROUND_SCHEDULE_COLUMNS contract.
    out = scheduled.select_columns(ROUND_SCHEDULE_COLUMNS).materialize()
    return _finish_round(out, state, out_dir)


def _round_schedule_sorted(deduped, state: FrontierState):
    """Sort-based fallback round schedule (exact for any partitioning):
    host-sort pins block boundaries, a batched seen offer per block, a
    tiny per-(block, host) driver metadata frame for cross-block
    offsets, ONE reserve() per authority shard, then a vectorized tick
    pass. Kept for the (unobserved) case where the hash shuffle splits
    a partition across blocks."""
    seen, polite = state.seen, state.polite
    order_cols = ["host", "host_rank", "stack_rank", "pos"]
    ordered = deduped.sort(order_cols).materialize()

    def seen_filter(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        new = seen.offer([canonical_url(u) or u for u in df["url"]])
        return df[pd.Series(new, index=df.index)]

    survivors = ordered.map_batches(
        seen_filter, batch_format="pandas", batch_size=None
    ).materialize()

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", sort=False)
        return g.agg(
            n=("host", "size"), first_hr=("host_rank", "first"),
            first_sr=("stack_rank", "first"), first_pos=("pos", "first"),
        ).reset_index()

    meta = survivors.map_batches(
        block_counts, batch_format="pandas", batch_size=None
    ).to_pandas()  # per-(block, host) metadata only
    if not len(meta):
        return survivors.map_batches(
            lambda df: df.assign(tick=pd.Series(dtype="float64")),
            batch_format="pandas", batch_size=None,
        ).materialize()
    meta = meta.sort_values(
        ["host", "first_hr", "first_sr", "first_pos"], kind="stable"
    )
    meta["offset"] = meta.groupby("host")["n"].cumsum() - meta["n"]
    bases = polite.reserve(
        {h: int(n) for h, n in meta.groupby("host")["n"].sum().items()}
    )
    offsets = {
        (h, int(hr), int(sr), int(p)): int(o)
        for h, hr, sr, p, o in zip(
            meta["host"], meta["first_hr"], meta["first_sr"],
            meta["first_pos"], meta["offset"]
        )
    }
    broadcast = ray.put((offsets, bases))

    def ticks(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(tick=pd.Series(dtype="float64"))
        off_map, base_map = ray.get(broadcast)
        idx = df.groupby("host", sort=False).cumcount().to_numpy()
        firsts = df.drop_duplicates("host")
        hoff = {
            h: off_map[(h, int(hr), int(sr), int(p))]
            for h, hr, sr, p in zip(
                firsts["host"], firsts["host_rank"], firsts["stack_rank"],
                firsts["pos"]
            )
        }
        idx = idx + df["host"].map(hoff).to_numpy()
        base = df["host"].map({h: b for h, (b, _) in base_map.items()}).to_numpy()
        delay = df["host"].map({h: d for h, (_, d) in base_map.items()}).to_numpy()
        return df.assign(tick=(base + idx).astype("float64") * delay)

    return survivors.map_batches(
        ticks, batch_format="pandas", batch_size=None
    )


def fetch_round(round_ds, cfg: CorpusConfig, out_dir: str,
                round_no: int, n_buckets: int = 16,
                fetch_batch_size: int = 128, concurrency: int = 4):
    """Fetch a round's scheduled URLs into the image-table layout
    (``images_round=K/bucket=J/``) — the streaming counterpart of the
    batch pipeline's stage 3, reusing the same PageFetch task pool and
    hash(host) bucket partitioning (PageFetch derives the bucket when
    the schedule lacks the column). Returns (rows, dir)."""
    import os

    from ..stages.crawl_stages import PageFetch

    from ..stages.crawl_stages import stage_task as _stage_task

    rdir = os.path.join(out_dir, f"images_round={round_no}")
    # Count the incoming MATERIALIZED round first (free metadata read);
    # counting the lazy repartition below would re-run the shuffle.
    rows = round_ds.count()
    # Task pool: fuses with the Write sink (payload never takes an
    # extra object-store hop) — see the batch pipeline's stage-3 note.
    # concurrency*8 blocks for the same write-tail reason as batch
    # stage 3: a fused task's trailing parquet flush can't overlap its
    # own compute, so more/smaller waves shrink the pure-write tail.
    round_ds = round_ds.repartition(max(1, concurrency * 8))
    images = round_ds.map_batches(
        _stage_task(PageFetch, cfg=cfg, n_buckets=n_buckets),
        batch_format="pyarrow",
        batch_size=fetch_batch_size,  # binary payloads: small batches
        num_cpus=1,
    )
    from ..sources import storage

    storage.write_dataset(images, rdir, partition_cols=["bucket"])
    os.makedirs(rdir, exist_ok=True)
    import time

    storage.write_manifest(
        rdir, stage="round_images", digest=f"round-{round_no}", rows=rows,
        schema=["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "payload_bytes", "url"],
        started=time.time(), extra={"round": round_no},
    )
    return rows, rdir


def _finish_round(ds, state: FrontierState, out_dir: str | None):
    """Optionally checkpoint the round as parquet + lineage manifest;
    hand the (materialized, object-store-resident) Dataset back."""
    if out_dir is None:
        return ds
    import os
    import shutil
    import time

    from ..sources import storage

    round_dir = os.path.join(out_dir, f"round={state.round}")
    shutil.rmtree(round_dir, ignore_errors=True)
    t0 = time.time()
    ds.write_parquet(round_dir)
    os.makedirs(round_dir, exist_ok=True)  # zero-row writes create nothing
    storage.write_manifest(
        round_dir, stage="frontier_round", digest=f"round-{state.round}",
        rows=ds.count(), schema=ds.schema().names, started=t0,
        extra={"round": state.round},
    )
    return ds
