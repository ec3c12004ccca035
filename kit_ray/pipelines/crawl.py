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

Shuffles (exactly three, SURVEY §4): groupby(url_key) for the seen set,
groupby(host) for politeness, and the final sort of the (small)
schedule metadata. Image rows are written unsorted with their order
keys attached — consumers needing global order sort the metadata, not
the payload bytes.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..sources import storage
from ..stages.crawl_stages import (
    HostTraverse,
    PageFetch,
    RobotsFetchParse,
    RobotsGate,
    host_bucket,
)
from ..synth import CorpusConfig


def _digest(cfg: CorpusConfig, n_buckets: int) -> str:
    payload = json.dumps({"cfg": asdict(cfg), "n_buckets": n_buckets}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _default_parallelism() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    except Exception:  # pragma: no cover
        return 4


def _dedup_first(group: pd.DataFrame) -> pd.DataFrame:
    """URL-seen semantics: first occurrence in discovery order wins
    (hash-partition + per-group min order key, SURVEY §2.4)."""
    i = group[["host_rank", "stack_rank", "pos"]].apply(tuple, axis=1).idxmin()
    return group.loc[[i]]


def _politeness_ticks(group: pd.DataFrame) -> pd.DataFrame:
    """Virtual-clock token bucket for one host: i-th fetch at i*delay
    (Crawl-Delay seconds, parser.rs:99-111; no delay -> 0)."""
    group = group.sort_values(["host_rank", "stack_rank", "pos"], kind="stable")
    d = float(group["crawl_delay_s"].iloc[0] or 0.0)
    group["tick"] = d * pd.RangeIndex(len(group)).to_numpy(dtype="float64")
    return group


def crawl(
    cfg: CorpusConfig,
    out_dir: str,
    *,
    resume: bool = True,
    n_buckets: int = 16,
    concurrency: int | None = None,
    fetch_batch_size: int = 64,
    only_buckets: list[int] | None = None,
) -> dict:
    """Run (or resume) the full crawl; returns a summary dict."""
    par = concurrency or _default_parallelism()
    digest = _digest(cfg, n_buckets)
    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {"digest": digest, "out_dir": out_dir, "format": storage.FORMAT}

    # ---- stage 1: robots fetch + parse (per host) -----------------------
    robots_dir = os.path.join(out_dir, "robots_cache")
    t0 = time.time()
    if not (resume and storage.valid_checkpoint(robots_dir, digest)):
        hosts = cfg.hosts()
        seeds = rd.from_items(
            [{"host": h, "host_rank": i} for i, h in enumerate(hosts)]
        ).repartition(min(len(hosts), par * 2))
        robots_ds = seeds.map_batches(
            RobotsFetchParse,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, max(2, par // 2)),  # autoscaling pool: leave CPUs for shuffle tasks
            num_cpus=1,
        )
        robots_ds.write_parquet(robots_dir)
        rows = pq_count(robots_dir)
        storage.write_manifest(
            robots_dir, stage="robots_cache", digest=digest, rows=rows,
            schema=["host", "host_rank", "always", "crawl_delay_s", "sitemaps",
                    "policy_json"], started=t0,
        )
    summary["robots_rows"] = pq_count(robots_dir)

    # Broadcast the per-host policy cache once (small side; see
    # stages/crawl_stages.py for the >10^6-host partitioned alternative).
    robots_tbl = storage_read_parquet_table(robots_dir)
    policies = dict(
        zip(robots_tbl["host"].to_pylist(), robots_tbl["policy_json"].to_pylist())
    )
    policies_ref = ray.put(policies)

    # ---- stage 2: traversal -> gate -> dedup -> politeness -> schedule --
    order_dir = os.path.join(out_dir, "crawl_order")
    t0 = time.time()
    if not (resume and storage.valid_checkpoint(order_dir, digest)):
        robots_ds = rd.read_parquet(robots_dir)
        entries = robots_ds.select_columns(["host", "host_rank", "sitemaps"]).map_batches(
            HostTraverse,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=2,  # a batch is a unit of host-parallelism
            concurrency=(1, max(2, par // 2)),
            num_cpus=1,
        )
        gated = entries.map_batches(
            RobotsGate,
            fn_constructor_kwargs={"policies_ref": policies_ref},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, max(1, par // 4)),
            num_cpus=1,
        )
        deduped = gated.groupby("url_key").map_groups(
            _dedup_first, batch_format="pandas"
        )
        scheduled = deduped.groupby("host").map_groups(
            _politeness_ticks, batch_format="pandas"
        )
        final = scheduled.sort(["tick", "host_rank", "stack_rank", "pos"])
        final.write_parquet(order_dir)
        storage.write_manifest(
            order_dir, stage="crawl_order", digest=digest, rows=pq_count(order_dir),
            schema=["url", "host", "tick", "host_rank", "stack_rank", "pos"],
            started=t0,
        )
    summary["scheduled_rows"] = pq_count(order_dir)

    # ---- stage 3: page fetch -> image table, bucket-resumable -----------
    images_dir = os.path.join(out_dir, "images")
    os.makedirs(images_dir, exist_ok=True)
    order_tbl = storage_read_parquet_table(order_dir)
    hosts_all = order_tbl["host"].to_pylist()
    bucket_of = {h: host_bucket(h, n_buckets) for h in set(hosts_all)}
    rows_per_bucket: dict[int, int] = {}
    for h in hosts_all:
        rows_per_bucket[bucket_of[h]] = rows_per_bucket.get(bucket_of[h], 0) + 1

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
        order_ds = rd.read_parquet(order_dir)
        pending = order_ds.map_batches(
            lambda t: t.filter(
                pa.array(
                    [host_bucket(h, n_buckets) in todo_set
                     for h in t["host"].to_pylist()]
                )
            ),
            batch_format="pyarrow",
        )
        images = pending.map_batches(
            PageFetch,
            fn_constructor_kwargs={"cfg": cfg, "n_buckets": n_buckets},
            batch_format="pyarrow",
            batch_size=fetch_batch_size,  # binary payloads: keep batches small
            concurrency=(1, max(2, par // 2)),
            num_cpus=1,
        )
        storage.write_dataset(images, images_dir, partition_cols=["bucket"])
        for b in todo:
            bdir = os.path.join(images_dir, f"bucket={b}")
            storage.write_manifest(
                bdir, stage="images", digest=digest, rows=rows_per_bucket[b],
                schema=[n for n in ("image_id", "bytes", "w", "h", "fmt",
                                     "caption", "phash", "url")],
                started=t0, extra={"bucket": b},
            )
    summary["fetched_buckets"] = sorted(
        b for b in rows_per_bucket
        if storage.valid_checkpoint(os.path.join(images_dir, f"bucket={b}"), digest)
    )
    summary["image_rows"] = sum(
        rows_per_bucket[b] for b in summary["fetched_buckets"]
    )
    summary["complete"] = len(summary["fetched_buckets"]) == len(rows_per_bucket)
    return summary


# -- small helpers -----------------------------------------------------------

def _pads(dir_path: str):
    import pyarrow.dataset as pads

    return pads.dataset(
        dir_path, format="parquet", partitioning="hive",
        ignore_prefixes=[".", "_"],
    )


def pq_count(dir_path: str) -> int:
    return _pads(dir_path).count_rows()


def storage_read_parquet_table(dir_path: str) -> pa.Table:
    return _pads(dir_path).to_table()
