"""The flagship pipeline: seed hosts -> robots -> sitemap traversal ->
gate -> URL-seen dedup -> politeness schedule -> page fetch -> image
table, with per-stage checkpoints and per-partition lineage.

Ray-Data-first orchestration (SURVEY §3.2): every stage is a Dataset
transform; the only driver-side state is checkpoint bookkeeping. The
three checkpointed stage outputs are

  out_dir/robots_cache/   one row per host (policy in serde-cache shape)
  out_dir/crawl_order/    the deterministic schedule (order keys + tick)
  out_dir/images/bucket=K/  fetched image+caption rows, partitioned by
                            hash(host) bucket — the resume granularity
                            for the expensive fetch stage

Resume: a stage with a valid manifest (config-digest match) is skipped;
the images stage re-fetches only buckets whose manifest is missing.
Kill the job anywhere and re-run — output is byte-identical to an
uninterrupted run (pinned by tests/test_crawl_e2e.py).

Shuffles (exactly two, SURVEY §4): the range-sort on url_key for the
seen set (dedup_first_sorted) and the host-sort for politeness ticks
(politeness_ticks_sorted); partitioned policy mode adds the hash join
that co-locates entries with their robots_cache row. The schedule and
image rows are written UNSORTED with their order keys attached —
consumers needing global (tick, ...) order sort the small metadata at
read time, not the pipeline output (a third full sort paid a fixed
~2.5 s barrier regardless of CPU count).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..sources import storage
from ..stages.crawl_stages import (
    HostExpand,
    PageFetch,
    RobotsFetchParse,
    SitemapParse,
    host_bucket,
    stage_task,
)
from ..synth import CorpusConfig


def _seeds_fingerprint(seeds_parquet: str | None):
    """(path, size, mtime_ns) per file — the digest must capture the
    seed TABLE's identity, not just its path string, or a resume after
    the file is regenerated in place silently reuses a schedule built
    from the stale seeds. Size+mtime is the rsync-style fingerprint: a
    content hash of a ≫10^6-row seed table would read it twice per
    run."""
    if seeds_parquet is None:
        return None
    paths = [seeds_parquet]
    if os.path.isdir(seeds_parquet):
        paths = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(seeds_parquet) for f in fs
            if not f.startswith("_"))
    out = []
    for p in paths:
        st = os.stat(p)
        out.append((p, st.st_size, st.st_mtime_ns))
    return out


def _digest(cfg: CorpusConfig, n_buckets: int, budget_per_host=None,
            seeds_parquet: str | None = None) -> str:
    # "v" bumps when a stage's output schema changes (v2 added the
    # bucket column to crawl_order) so older checkpoints invalidate.
    payload = json.dumps(
        {"cfg": asdict(cfg), "n_buckets": n_buckets, "budget": budget_per_host,
         "seeds": _seeds_fingerprint(seeds_parquet), "v": 2},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _default_parallelism() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    except Exception:  # pragma: no cover
        return 4


def _drop_dup_urls(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(subset=["url_key"], keep="first")


def dedup_first_sorted(ds):
    """URL-seen semantics: first occurrence in discovery order wins.

    Fully vectorized sort-based dedup with NO single-block funnel (an
    earlier version coalesced to ``repartition(1)``, which made the
    whole post-dedup schedule tail serial — an Amdahl bottleneck that
    measurably inverted 8-vs-32-CPU scaling on a 443k-URL corpus):

      1. global range-sort on (url_key, discovery order) makes each
         key's rows contiguous; per-block ``drop_duplicates(keep=
         "first")`` keeps the min-order row per key per block;
      2. after the drop, a key can only straddle ADJACENT blocks, and
         its later-block rows are those blocks' FIRST rows (the sort
         puts a straddling key at block edges). Each block contributes
         its first+last rows' keys — 2 metadata rows per block, read on
         the driver in block order;
      3. the driver walks the edges: a block whose first key equals the
         previous non-empty block's last key flags that one row; the
         tiny drop-set is broadcast and pass B filters at most one
         leading row per block. Exact for chains spanning any number of
         blocks (each later block's first row is flagged in turn).

    Every pass is per-block parallel; driver state is O(blocks).
    """
    key_cols = ["url_key", "host_rank", "stack_rank", "pos"]
    sorted_ds = ds.sort(key_cols).materialize()
    try:
        multi = sorted_ds.num_blocks() > 1
    except Exception:  # pragma: no cover
        multi = True

    drop: set = set()
    if multi:
        # Edge metadata comes from the SORTED, pre-drop blocks: a
        # block's first row is its min-order row for its first key, so
        # it survives the in-block drop unchanged, and the last row's
        # KEY is the same pre/post drop — one metadata pass, then drop
        # and boundary-drop fuse into a single map.
        def edges(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df.iloc[0:0][key_cols]
            return df.iloc[[0, -1]][key_cols]

        meta = sorted_ds.map_batches(
            edges, batch_format="pandas", batch_size=None
        ).to_pandas()  # 2 rows per non-empty block, in block order

        prev_last = None
        for i in range(0, len(meta), 2):
            first, last = meta.iloc[i], meta.iloc[i + 1]
            if prev_last is not None and first["url_key"] == prev_last:
                drop.add((first["url_key"], int(first["host_rank"]),
                          int(first["stack_rank"]), int(first["pos"])))
            prev_last = last["url_key"]
    drop_ref = ray.put(drop)

    def drop_dups_and_boundary(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["url_key"], keep="first")
        d = ray.get(drop_ref)
        # Only a block's first row can be a boundary duplicate.
        if d and len(df):
            r = df.iloc[0]
            if (r["url_key"], int(r["host_rank"]), int(r["stack_rank"]),
                    int(r["pos"])) in d:
                df = df.iloc[1:]
        return df

    return sorted_ds.map_batches(
        drop_dups_and_boundary, batch_format="pandas", batch_size=None
    )


def politeness_ticks_sorted(ds, budget_per_host: int | None = None):
    """Vectorized politeness schedule: each host's i-th URL (in
    discovery order) gets tick ``i * crawl_delay_s``; ``budget_per_host``
    truncates each host's queue (the north rule's politeness budget).

    Two-pass distributed cumcount — no ``repartition(1)`` funnel and no
    per-group map_groups (~1 ms/group is fatal at >10^4 hosts):

      pass A: global range-sort on (host, order key), materialized so
              both passes see identical block boundaries; each block
              folds to per-(block, host) counts keyed by that host's
              FIRST order key in the block — tiny metadata
              (<= hosts + blocks rows, since a host spans only
              consecutive blocks after the sort);
      driver: exclusive prefix-sum of the counts per host in block
              order -> a broadcast offset map keyed by
              (host, first order key);
      pass B: per-block ``groupby.cumcount`` plus the block's broadcast
              offset for each host, then the budget filter and the tick
              arithmetic — all vectorized.
    """
    order_cols = ["host", "host_rank", "stack_rank", "pos"]
    sorted_ds = ds.sort(order_cols).materialize()

    offsets: dict = {}
    if sorted_ds.num_blocks() > 1:
        # Boundary hosts can only exist across >1 block; with a single
        # sorted block every cumcount is already global — skip pass A.
        def block_counts(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("host", sort=False)
            return g.agg(
                n=("host", "size"), first_hr=("host_rank", "first"),
                first_sr=("stack_rank", "first"), first_pos=("pos", "first"),
            ).reset_index()

        meta = sorted_ds.map_batches(
            block_counts, batch_format="pandas", batch_size=None
        ).to_pandas()  # per-(block, host) metadata only — never the rows
        if len(meta):
            meta = meta.sort_values(
                ["host", "first_hr", "first_sr", "first_pos"], kind="stable"
            )
            meta["offset"] = meta.groupby("host")["n"].cumsum() - meta["n"]
            offsets = {
                (h, int(hr), int(sr), int(p)): int(o)
                for h, hr, sr, p, o in zip(
                    meta["host"], meta["first_hr"], meta["first_sr"],
                    meta["first_pos"], meta["offset"]
                )
            }
    off_ref = ray.put(offsets)

    def ticks(df: pd.DataFrame) -> pd.DataFrame:
        off_map = ray.get(off_ref)
        idx = df.groupby("host", sort=False).cumcount().to_numpy()
        if off_map:  # empty when the sorted schedule is a single block
            firsts = df.drop_duplicates("host")
            hmap = {
                h: off_map[(h, int(hr), int(sr), int(p))]
                for h, hr, sr, p in zip(
                    firsts["host"], firsts["host_rank"], firsts["stack_rank"],
                    firsts["pos"]
                )
            }
            idx = idx + df["host"].map(hmap).to_numpy()
        if budget_per_host is not None:
            keep = idx < budget_per_host
            df = df[keep]
            idx = idx[keep]
        return df.assign(
            tick=idx.astype("float64") * df["crawl_delay_s"].to_numpy()
        )

    return sorted_ds.map_batches(ticks, batch_format="pandas", batch_size=None)


# Target bytes per hash-shuffle partition of schedule metadata: one
# partition must fit a worker heap with pandas expansion headroom
# (~3-4x Arrow bytes). 256 MB Arrow -> ~1 GB peak per schedule task.
SCHEDULE_PARTITION_BYTES = 256 * 1024 * 1024


def schedule_parts(size_bytes: int | None, par: int) -> int:
    """Schedule-shuffle width sized by DATA, floored by parallelism:
    small inputs keep min(par, 16) partitions (pure parallelism — the
    r3 constant, so small-scale timings are unchanged); large inputs
    grow so no host-complete partition exceeds
    ``SCHEDULE_PARTITION_BYTES`` regardless of cluster size (a fixed
    16 made one partition hold 1/16th of a 10^10-URL schedule — a
    worker-heap blowout)."""
    floor = max(2, min(par, 16))
    if not size_bytes or size_bytes <= 0:
        return floor
    by_bytes = -(-int(size_bytes) // SCHEDULE_PARTITION_BYTES)
    return max(floor, by_bytes)


def widen_schedule_partitions(joined, par: int, nparts: int):
    """Post-shuffle width correction, pipelining-free: the first keyed
    shuffle runs at the parallelism floor WITHOUT materializing its
    input (traversal/parse streams straight into the shuffle send —
    no extra barrier on the critical path), then the MEASURED bytes of
    the materialized shuffle output decide whether host-complete
    partitions are too fat for a worker heap. Small jobs never
    re-shuffle (width stays the floor, zero added cost); a 10^10-URL
    schedule pays one extra keyed exchange of already-compacted
    metadata — negligible against the job, and the alternative
    (pre-materializing to measure) taxes EVERY job's e2e time.
    Returns (dataset, width)."""
    need = schedule_parts(joined.size_bytes(), par)
    if need > nparts:  # pragma: no cover - beyond-sandbox data sizes
        return hash_partition_by_host(joined, need), need
    return joined, nparts


def hosts_block_disjoint(ds, cap: int = 2_000_000) -> bool:
    """Direct key-completeness proof for the host-hash partitioning
    (round-4 advice: the ``num_blocks() == nparts`` guard is a proxy —
    if Ray ever elided an empty partition while splitting another, the
    count would pass while a host straddles two blocks and every
    in-block exact op silently breaks).

    One vectorized metadata pass: each block contributes its DISTINCT
    hosts (bounded by total distinct hosts + straddle count, tiny next
    to the rows); a host appearing under two blocks is exactly a
    straddle. Above ``cap`` collected rows the driver-side set is no
    longer small and we fall back to trusting the block-count proxy
    (never reached in the sandbox; at the ≫10^6-host design point the
    partitioned policy join pins co-location structurally)."""
    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": df["host"].unique()})

    # select_columns is a one-to-one projection (block boundaries are
    # preserved), so per-block uniqueness over the pruned column still
    # proves per-block uniqueness of the full blocks — and the pass
    # never ships url/payload bytes.
    meta = ds.select_columns(["host"]).map_batches(
        uniq, batch_format="pandas", batch_size=None
    ).materialize()
    if meta.count() > cap:  # pragma: no cover - beyond-sandbox host counts
        return True
    hosts = meta.to_pandas()["host"]
    return not hosts.duplicated().any()


def hash_partition_by_host(ds, nparts: int):
    """Hash-partition ``ds`` into ``nparts`` host-complete blocks via
    Ray's keyed repartition (requires the HASH_SHUFFLE strategy, flipped
    only around this materialize and restored after). Cheaper than an
    inner self-join against the host dim (~0.8 s less fixed aggregator
    cost, no dim side shuffled) and semantically identical here: every
    post-gate row's host exists in robots_cache. Aggregators get 0 CPUs
    for the same reason as the join's override — they route/buffer, and
    any reservation stacks on actor-pool minimums and can starve the
    stage's tasks outright at small CPU counts."""
    from ray.data.context import ShuffleStrategy

    # A Dataset snapshots its DataContext at creation — flip the
    # SNAPSHOT the plan actually carries, not the process-global one.
    ctx = ds.context
    prev_strategy = ctx.shuffle_strategy
    prev_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0
    try:
        return ds.repartition(nparts, keys=["host"]).materialize()
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = prev_cpus


def schedule_block_fn(budget_per_host: int | None = None):
    """Per-partition scheduler: dedup + politeness ticks in ONE
    vectorized pandas pass over a HOST-COMPLETE block.

    The key insight: a canonical ``url_key`` embeds its host, so
    hash-partitioning by host also partitions url_keys — both the
    URL-seen dedup (first occurrence in discovery order wins) and the
    per-host politeness cumcount are exact within a host-complete
    partition. One hash shuffle replaces the two global range sorts the
    previous design paid (plus their sample/boundary barriers and
    driver-side offset metadata)."""
    order_cols = ["host", "host_rank", "stack_rank", "pos"]

    def schedule_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(tick=pd.Series(dtype="float64"))
        df = df.sort_values(["url_key", "host_rank", "stack_rank", "pos"],
                            kind="stable")
        df = df.drop_duplicates(subset=["url_key"], keep="first")
        df = df.sort_values(order_cols, kind="stable")
        idx = df.groupby("host", sort=False).cumcount().to_numpy()
        if budget_per_host is not None:
            keep = idx < budget_per_host
            df = df[keep]
            idx = idx[keep]
        return df.assign(
            tick=idx.astype("float64") * df["crawl_delay_s"].to_numpy()
        )

    return schedule_block


def ranked_hosts_from_seeds(seeds_ds, par: int = 4):
    """(url, seed_rank) Dataset -> (host, host_rank) Dataset, fully
    distributed: canonicalize -> per-host Min(seed_rank) -> DENSE
    first-appearance rank via a range sort plus two-pass block offsets
    (the politeness-cumcount pattern). The driver holds O(blocks)
    metadata only — at the ≫10^6-host design point neither the seed
    list nor the ranked host table round-trips through the driver
    (round-4 verdict #4: the previous path listed hosts via
    ``from_items`` and ``to_pandas``-ed the ranked table)."""
    import numpy as np
    from ray.data.aggregate import Min

    from ..stages.crawl_stages import canonicalize_seeds

    canon = seeds_ds.map_batches(canonicalize_seeds, batch_format="pyarrow")
    ranked = canon.groupby("host").aggregate(
        Min("seed_rank", alias_name="first_rank"))
    ordered = ranked.sort("first_rank").materialize()

    # Pass A: per-block (first first_rank, row count). first_rank is
    # unique per host (a seed_rank indexes ONE url -> one host), so a
    # block's first value keys its offset exactly.
    def edges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"first": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"first": [int(df["first_rank"].iloc[0])],
                             "n": [len(df)]})

    meta = ordered.map_batches(
        edges, batch_format="pandas", batch_size=None
    ).to_pandas()  # one row per non-empty block, in block order
    if meta.empty:  # every seed invalid -> empty host table
        return rd.from_items([]).map_batches(
            lambda df: pd.DataFrame({"host": pd.Series(dtype="object"),
                                     "host_rank": pd.Series(dtype="int64")}),
            batch_format="pandas")
    meta["offset"] = meta["n"].cumsum() - meta["n"]
    off_ref = ray.put(dict(zip(meta["first"], meta["offset"])))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"host": pd.Series(dtype="object"),
                                 "host_rank": pd.Series(dtype="int64")})
        base = int(ray.get(off_ref)[int(df["first_rank"].iloc[0])])
        return pd.DataFrame({
            "host": df["host"].to_numpy(),
            "host_rank": base + np.arange(len(df), dtype="int64"),
        })

    return ordered.map_batches(rank, batch_format="pandas", batch_size=None)


def hosts_from_seed_urls(seed_urls: list[str], par: int = 4) -> list[str]:
    """Driver-list convenience form of ``ranked_hosts_from_seeds`` for
    synthetic-config callers (small seed lists only — the crawl's
    parquet-seed path, ``crawl(seeds_parquet=...)``, never materializes
    this list)."""
    if not seed_urls:
        return []
    ds = rd.from_items(
        [{"url": u, "seed_rank": i} for i, u in enumerate(seed_urls)]
    ).repartition(max(1, min(par * 2, len(seed_urls))))
    df = ranked_hosts_from_seeds(ds, par).to_pandas()
    if df.empty:  # every seed invalid -> nothing to crawl
        return []
    return list(df.sort_values("host_rank")["host"])


def crawl(
    cfg: CorpusConfig,
    out_dir: str,
    *,
    resume: bool = True,
    n_buckets: int = 16,
    concurrency: int | None = None,
    fetch_batch_size: int = 128,
    only_buckets: list[int] | None = None,
    budget_per_host: int | None = None,
    policy_mode: str = "auto",
    broadcast_max_hosts: int = 1_000_000,
    seeds_parquet: str | None = None,
) -> dict:
    """Public entry: runs ``_crawl_impl`` and guarantees the overlapped
    checkpoint-writer threads never fail silently — if a stage raises
    first, each writer is joined (bounded wait; they are daemons, so a
    hung filesystem write cannot block interpreter exit) and any writer
    error is attached to the propagating exception as a note."""
    writers: list = []
    try:
        return _crawl_impl(
            cfg, out_dir, writers, resume=resume, n_buckets=n_buckets,
            concurrency=concurrency, fetch_batch_size=fetch_batch_size,
            only_buckets=only_buckets, budget_per_host=budget_per_host,
            policy_mode=policy_mode, broadcast_max_hosts=broadcast_max_hosts,
            seeds_parquet=seeds_parquet,
        )
    except BaseException as e:
        for th, box in writers:  # pragma: no cover - error-path forensics
            th.join(timeout=30)
            if box and box[0] is not e:  # e may BE this writer's error
                e.add_note(
                    f"overlapped checkpoint writer {th.name} also failed: "
                    f"{box[0]!r}")
            elif th.is_alive():
                e.add_note(
                    f"overlapped checkpoint writer {th.name} still running "
                    "after 30s (daemon; will not block exit)")
        raise


def _crawl_impl(
    cfg: CorpusConfig,
    out_dir: str,
    _writers: list,
    *,
    resume: bool = True,
    n_buckets: int = 16,
    concurrency: int | None = None,
    fetch_batch_size: int = 128,
    only_buckets: list[int] | None = None,
    budget_per_host: int | None = None,
    policy_mode: str = "auto",
    broadcast_max_hosts: int = 1_000_000,
    seeds_parquet: str | None = None,
) -> dict:
    """Run (or resume) the full crawl; returns a summary dict.

    ``policy_mode`` selects how the robots gate sees the per-host
    policy cache: ``"broadcast"`` ships the whole {host: policy} map
    once via ``ray.put`` (right up to ~10^6 hosts); ``"partitioned"``
    hash-co-locates entries with their robots_cache row via a
    ``Dataset.join`` on host and gates inside the co-located batches —
    the ≫10^6-host scale mode where a broadcast would not fit.
    ``"auto"`` (default) refuses broadcast above ``broadcast_max_hosts``
    and switches to partitioned. Output is bit-identical across modes
    (pinned by tests).

    ``seeds_parquet``: path to a (url, seed_rank) parquet seed table —
    the Dataset-native stage-1 input. Hosts and their dense
    first-appearance ranks derive fully distributed
    (``ranked_hosts_from_seeds``); the synthetic-config path
    (``cfg.hosts()`` via ``from_items``) remains for tests/benches."""
    if policy_mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"unknown policy_mode: {policy_mode!r}")
    par = concurrency or _default_parallelism()
    digest = _digest(cfg, n_buckets, budget_per_host, seeds_parquet)
    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {"digest": digest, "out_dir": out_dir, "format": storage.FORMAT}

    # ---- stage 1: robots fetch + parse (per host) -----------------------
    robots_dir = os.path.join(out_dir, "robots_cache")
    robots_mat = None  # materialized stage-1 output, reused by stage 2
    t0 = time.time()
    if not (resume and storage.valid_checkpoint(robots_dir, digest)):
        # Recomputing: clear stale output first — Ray's write_parquet
        # appends files, so leftovers from a previous run (resume=False
        # never consults valid_checkpoint) would double the rows.
        shutil.rmtree(robots_dir, ignore_errors=True)
        if seeds_parquet is not None:
            # Dataset-native seed input: (url, seed_rank) parquet ->
            # distributed canonicalize/rank; no host list on the driver.
            seeds = ranked_hosts_from_seeds(
                rd.read_parquet(seeds_parquet, columns=["url", "seed_rank"]),
                par,
            ).repartition(max(1, par))
        else:
            hosts = cfg.hosts()
            seeds = rd.from_items(
                [{"host": h, "host_rank": i} for i, h in enumerate(hosts)]
            ).repartition(max(1, min(len(hosts), max(8, par))))
        # Task pool (worker-process state cache, stages/crawl_stages.py):
        # the stage's only state is cfg, and an actor pool's startup
        # dominated this short stage (measured 0.7 -> 0.2 s at 32 CPUs).
        robots_mat = seeds.map_batches(
            stage_task(RobotsFetchParse, cfg=cfg),
            batch_format="pyarrow",
            batch_size=16,
            num_cpus=1,
        ).materialize()  # small (one row per host): pin and reuse
        _robots_ended = time.time()  # stage COMPUTE end: the manifest
        # stamp must not absorb the overlapped writer's runtime
        # The robots checkpoint write is pure resume insurance — stage
        # 2 consumes robots_mat from memory — so it runs in a
        # background thread OVERLAPPING stage 2 instead of as driver
        # dead time between the stages. Joined (and re-raised) before
        # the summary reads the written files; per-stage manifest
        # validity keeps crash-resume exact if the writer dies mid-run.
        # daemon=True: if stages 2-3 raise first, a hung filesystem
        # write in this thread must not block interpreter exit.
        robots_writer_err: list = []
        _robots_t0 = t0  # capture: t0 is REBOUND at stage-2 start, and
        # the thread may read it after that (wrong manifest wall time)

        def _write_robots():
            try:
                robots_mat.write_parquet(robots_dir)
                storage.write_manifest(
                    robots_dir, stage="robots_cache", digest=digest,
                    rows=pq_count(robots_dir),
                    schema=["host", "host_rank", "always", "crawl_delay_s",
                            "sitemaps", "policy_json"], started=_robots_t0,
                    ended=_robots_ended,
                )
            except BaseException as e:  # noqa: BLE001 - re-raised at join
                robots_writer_err.append(e)

        import threading

        robots_writer = threading.Thread(
            target=_write_robots, name="robots-ckpt-writer", daemon=True)
        robots_writer.start()
        _writers.append((robots_writer, robots_writer_err))
    else:
        robots_writer, robots_writer_err = None, []
    summary["robots_rows"] = (
        robots_mat.count() if robots_mat is not None else pq_count(robots_dir)
    )
    summary["robots_sec"] = round(time.time() - t0, 2)

    if policy_mode == "auto":
        policy_mode = (
            "broadcast" if summary["robots_rows"] <= broadcast_max_hosts
            else "partitioned"
        )
    summary["policy_mode"] = policy_mode

    policies_ref = None
    if policy_mode == "broadcast":
        # Ship the whole per-host policy cache once (small side); the
        # partitioned mode below never materializes this map anywhere.
        if robots_mat is not None:
            rdf = robots_mat.select_columns(["host", "policy_json"]).to_pandas()
        else:
            rdf = storage_read_parquet_table(robots_dir).select(
                ["host", "policy_json"]
            ).to_pandas()
        policies_ref = ray.put(dict(zip(rdf["host"], rdf["policy_json"])))

    # ---- stage 2: traversal -> gate -> dedup -> politeness -> schedule --
    order_dir = os.path.join(out_dir, "crawl_order")
    t0 = time.time()
    final_mat = None  # in-memory schedule when stage 2 ran this call
    if not (resume and storage.valid_checkpoint(order_dir, digest)):
        shutil.rmtree(order_dir, ignore_errors=True)  # see stage-1 note
        robots_ds = (robots_mat if robots_mat is not None else
             storage.strip_schema_metadata(rd.read_parquet(robots_dir)))
        # Two-phase skew-resilient traversal: phase A expands each
        # host's sitemap DAG into leaf work items (cheap, per host);
        # phase B fetches+parses LEAF sitemaps in parallel across all
        # hosts — a skewed host's hundred child sitemaps spread over
        # the whole pool instead of serializing in one actor. Order
        # stays exact: stack_rank derives from the listings alone
        # (kernels/traverse.py). The robots gate is fused into the
        # parse pool (one pool, one hop). Spread the tiny inputs first:
        # map parallelism is capped by input block count.
        robots_ds = robots_ds.repartition(
            max(1, min(summary["robots_rows"], par * 2))
        )
        # Task pools with per-worker state caches (stage_task): the
        # traversal's state is cfg + the broadcast policies ref, both
        # cheap to hydrate once per worker process; actor pools here
        # paid startup + a hard concurrency cap (measured 10.6 -> 6.5 s
        # at 8 CPUs, 4.6 -> 3.6 s at 32 on the 443k-URL corpus), and
        # their PENDING_CREATION leftovers could stall the next
        # pipeline's startup — a failure class tasks don't have.
        leaves = robots_ds.select_columns(["host", "host_rank", "sitemaps"]).map_batches(
            stage_task(HostExpand, cfg=cfg),
            batch_format="pyarrow",
            batch_size=4,
            num_cpus=1,
        )
        parsed = leaves.repartition(par * 2).map_batches(
            # Broadcast mode fuses the gate into the parse tasks (one
            # hop); partitioned mode parses ungated and gates after the
            # co-location join below.
            stage_task(SitemapParse, cfg=cfg, policies_ref=policies_ref),
            batch_format="pyarrow",
            batch_size=4,  # a batch is a unit of sitemap-parallelism
            num_cpus=1,
        )
        # ---- dedup + politeness in one host-hash shuffle ----
        # Hash-co-locate every entry with its host; a url_key embeds
        # its host, so host-complete partitions make BOTH the URL-seen
        # dedup and the politeness cumcount exact per block — one
        # shuffle, no global range sorts, no driver offset metadata.
        nparts = max(2, min(par, 16))  # parallelism floor; corrected
        # from measured bytes after the shuffle (widen_schedule_partitions)
        if policy_mode == "partitioned":
            # Hash-co-locate entries with their host's policy row: the
            # join partitions BOTH sides by hash(host), so each output
            # batch carries exactly the policies it needs — no broadcast
            # of the full cache anywhere (≫10^6-host mode). The gate map
            # runs one task per joined block, so its output KEEPS the
            # join's host-complete partitioning — the schedule below
            # reuses it with no second shuffle.
            from ..stages.crawl_stages import CoPartitionedGate

            pol_side = robots_ds.select_columns(["host", "policy_json"])
            joined = parsed.join(
                pol_side, join_type="inner",
                num_partitions=nparts,
                on=("host",), right_on=("host",),
                # Aggregator actors route/buffer (memory-bound, not
                # CPU-bound); any CPU reservation for them stacks on the
                # three actor pools' minimums and starves the stage's
                # Repartition/Sort TASKS outright at small CPU counts
                # (measured: startup deadlock at 4 CPUs even at 0.25).
                aggregator_ray_remote_args={"num_cpus": 0},
            ).map_batches(
                CoPartitionedGate,
                batch_format="pyarrow",
                batch_size=None,
                concurrency=(1, max(2, par // 2)),
                num_cpus=1,
            ).materialize()
        else:
            # Broadcast mode gated inside the parse pool; one keyed
            # repartition co-locates hosts for the schedule.
            joined = hash_partition_by_host(parsed, nparts)
        joined, nparts = widen_schedule_partitions(joined, par, nparts)
        if joined.num_blocks() == nparts and hosts_block_disjoint(joined):
            scheduled = joined.map_batches(
                schedule_block_fn(budget_per_host),
                batch_format="pandas", batch_size=None,
            )
        else:  # pragma: no cover - aggregator emitted split blocks
            # (not observed on Ray 2.49 even under a 1 MB block cap);
            # fall back to the sort-based exact path.
            deduped = dedup_first_sorted(joined)
            scheduled = politeness_ticks_sorted(deduped, budget_per_host)

        def add_bucket(df: pd.DataFrame):
            # Fetch-resume bucket assigned here (vectorized over the
            # block's unique hosts) so stage 3 never recomputes it.
            # Returns ARROW: pandas blocks poison every downstream
            # consumer (measured: the fetch stage over a pandas-block
            # schedule ran 92 s vs 55 s over the same rows as arrow
            # blocks — pickled DataFrame blocks re-convert per hop).
            hmap = {h: host_bucket(h, n_buckets) for h in df["host"].unique()}
            df = df.assign(bucket=df["host"].map(hmap).astype("int32"))
            if len(df):
                return pa.Table.from_pandas(df, preserve_index=False)
            return df  # empty: keep pandas dtypes (null-type arrow would
            # conflict with non-empty blocks' schema at unify time)

        # The schedule is written WITH its order keys but UNSORTED: the
        # politeness pass already left it host-ordered, stage 3 only
        # filters by bucket, and every consumer that needs global
        # (tick, ...) order sorts the small metadata at read time —
        # saving the third full sort of the stage (Ray sort costs a
        # fixed ~2.5 s sample/boundary/barrier regardless of CPUs).
        # Materialized once: the write streams from these blocks AND
        # stage 3 consumes them directly on a fresh run — the schedule
        # checkpoint is for RESUME, so the common path shouldn't pay a
        # disk round-trip + full re-read of what it just computed.
        final_mat = scheduled.map_batches(
            add_bucket, batch_format="pandas").materialize()
        _sched_ended = time.time()  # stage COMPUTE end (the manifest
        # stamp must not absorb stage-3 contention while the overlapped
        # writer runs — bench.py reads this as the schedule diagnostic)

        # Like the robots checkpoint: the schedule parquet is resume
        # insurance (stage 3 fetches from final_mat), so its write +
        # manifest overlap stage 3 in a thread. A crash before the
        # manifest lands just re-runs the deterministic stage 2 on
        # resume (per-stage digest validity). daemon=True so a hung
        # write can't block interpreter exit if stage 3 raises.
        sched_writer_err: list = []
        _sched_t0 = t0  # capture before stage-3 rebinds t0 (see robots)

        def _write_sched():
            try:
                final_mat.write_parquet(order_dir)
                os.makedirs(order_dir, exist_ok=True)  # zero-row writes
                storage.write_manifest(
                    order_dir, stage="crawl_order", digest=digest,
                    rows=pq_count(order_dir),
                    schema=["url", "host", "tick", "host_rank",
                            "stack_rank", "pos", "bucket"],
                    started=_sched_t0, ended=_sched_ended,
                )
            except BaseException as e:  # noqa: BLE001 - re-raised at join
                sched_writer_err.append(e)

        import threading

        sched_writer = threading.Thread(
            target=_write_sched, name="sched-ckpt-writer", daemon=True)
        sched_writer.start()
        _writers.append((sched_writer, sched_writer_err))
    else:
        sched_writer, sched_writer_err = None, []
    if robots_writer is not None:
        # The overlapped robots checkpoint must land (and its errors
        # surface) before anything trusts the on-disk stage layout.
        robots_writer.join()
        if robots_writer_err:
            raise robots_writer_err[0]
    summary["scheduled_rows"] = (
        final_mat.count() if final_mat is not None else pq_count(order_dir)
    )
    summary["schedule_sec"] = round(time.time() - t0, 2)

    # ---- stage 3: page fetch -> image table, bucket-resumable -----------
    images_dir = os.path.join(out_dir, "images")
    if not resume:
        # valid_checkpoint (which clears stale bucket dirs) is only
        # consulted on resume; a fresh run must not append onto leftovers.
        shutil.rmtree(images_dir, ignore_errors=True)
    os.makedirs(images_dir, exist_ok=True)
    # Distributed bucket accounting: per-block value_counts partials ->
    # tiny (bucket, n) driver sum. Never pulls the host/bucket column of
    # the whole schedule to the driver.
    rows_per_bucket: dict[int, int] = {}
    if final_mat is not None or _has_parquet(order_dir):
        def bucket_partial(t: pa.Table) -> pa.Table:
            vc = pa.compute.value_counts(t["bucket"].combine_chunks())
            return pa.table(
                {"bucket": vc.field("values"), "n": vc.field("counts")}
            )

        bucket_src = (
            final_mat.select_columns(["bucket"]) if final_mat is not None
            else rd.read_parquet(order_dir, columns=["bucket"])
        )
        counts = (
            bucket_src
            .map_batches(bucket_partial, batch_format="pyarrow")
            .to_pandas()  # <= n_buckets x n_blocks rows
        )
        rows_per_bucket = {
            int(b): int(n)
            for b, n in counts.groupby("bucket")["n"].sum().items()
        }

    todo = []
    for b in sorted(rows_per_bucket):
        bdir = os.path.join(images_dir, f"bucket={b}")
        if resume and storage.valid_checkpoint(bdir, digest):
            continue
        if only_buckets is not None and b not in only_buckets:
            continue
        todo.append(b)

    if todo:
        t0 = time.time()
        todo_set = set(todo)
        # The schedule is tiny metadata: spread it so fetch parallelism
        # isn't capped by source block count. Fresh runs feed the
        # in-memory blocks straight to the fetch tasks (the parquet
        # checkpoint is for RESUME — re-reading what was just computed
        # cost a disk round-trip on every run's critical path); resume
        # runs read the checkpoint.
        order_src = (final_mat if final_mat is not None else
                     storage.strip_schema_metadata(rd.read_parquet(order_dir)))
        # par*8, not par*2: each fused fetch->write task ends with its
        # parquet flush, which cannot overlap ITS OWN compute — at
        # par*2 the last wave's writes are ~half pure write tail
        # (measured 22.5 s at 64 blocks vs 15.8 s at 256, 32 CPUs,
        # 443k URLs / 13.5 GB). Eight waves keep the tail ~1/8 of the
        # write cost while blocks stay ~50 MB at the bench scale (well
        # above parquet's small-file overhead regime).
        order_ds = order_src.repartition(par * 8)
        todo_arr = pa.array(sorted(todo_set), pa.int32())
        pending = order_ds.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=todo_arr)),
            batch_format="pyarrow",
        )
        # Task pool, deliberately: the fetch map then FUSES with the
        # Write sink, so each task streams its image payload straight
        # from the generator into parquet — with an actor pool the
        # payload (the job's largest byte stream; ~13 GB on the scaling
        # corpus, ~everything at 100 TB) takes an extra object-store
        # round trip to separate write tasks, and the pool's max cap +
        # reserved write cores left CPUs idle (measured 23.6 -> 14.8 s
        # at 32 CPUs, 90 -> ~55 s at 8). PageFetch's state (cfg; on a
        # real cluster: connection pools) hydrates once per worker via
        # stage_task's worker-process cache.
        images = pending.map_batches(
            stage_task(PageFetch, cfg=cfg, n_buckets=n_buckets),
            batch_format="pyarrow",
            batch_size=fetch_batch_size,  # binary payloads: keep batches small
            num_cpus=1,
        )
        storage.write_dataset(images, images_dir, partition_cols=["bucket"])
        import pyarrow.dataset as pads

        for b in todo:
            bdir = os.path.join(images_dir, f"bucket={b}")
            try:
                bytes_out = pads.dataset(bdir, format="parquet",
                                         ignore_prefixes=[".", "_"]).to_table(
                    columns=["payload_bytes"]
                )["payload_bytes"]
                bytes_out = int(pa.compute.sum(bytes_out).as_py() or 0)
            except Exception:
                bytes_out = -1
            storage.write_manifest(
                bdir, stage="images", digest=digest, rows=rows_per_bucket[b],
                schema=[n for n in ("image_id", "bytes", "w", "h", "fmt",
                                     "caption", "phash", "payload_bytes", "url")],
                started=t0, extra={"bucket": b, "payload_bytes": bytes_out},
            )
        summary["fetch_sec"] = round(time.time() - t0, 2)
    summary["fetched_buckets"] = sorted(
        b for b in rows_per_bucket
        if storage.valid_checkpoint(os.path.join(images_dir, f"bucket={b}"), digest)
    )
    summary["image_rows"] = sum(
        rows_per_bucket[b] for b in summary["fetched_buckets"]
    )
    summary["complete"] = len(summary["fetched_buckets"]) == len(rows_per_bucket)
    if sched_writer is not None:
        # The overlapped schedule checkpoint must land (and its
        # errors surface) before the job reports success.
        sched_writer.join()
        if sched_writer_err:
            raise sched_writer_err[0]
    return summary


# -- small helpers -----------------------------------------------------------

def _pads(dir_path: str):
    import pyarrow.dataset as pads

    return pads.dataset(
        dir_path, format="parquet", partitioning="hive",
        ignore_prefixes=[".", "_"],
    )


def _has_parquet(dir_path: str) -> bool:
    for _root, _dirs, files in os.walk(dir_path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def pq_count(dir_path: str) -> int:
    # An empty pipeline output writes no files at all (e.g. a zero
    # politeness budget): treat as zero rows, not an error.
    if not _has_parquet(dir_path):
        return 0
    return _pads(dir_path).count_rows()


def storage_read_parquet_table(dir_path: str) -> pa.Table:
    if not _has_parquet(dir_path):
        return pa.table({})
    return _pads(dir_path).to_table()
