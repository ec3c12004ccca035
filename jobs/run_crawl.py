#!/usr/bin/env python
"""Crawl job entrypoint — the ``ray job submit`` target.

On a cluster:

    ray job submit --working-dir . -- python jobs/run_crawl.py \
        --n-hosts 100000 --pages-per-host 1000 --out /data/crawl_run1

In this sandbox (no dashboard/job server): run directly —

    python jobs/run_crawl.py --n-hosts 120 --pages-per-host 400 --out /tmp/run1

The job is resumable: re-submitting with the same --out and corpus
arguments skips completed stages/buckets via the lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Make the repo importable when launched as `python jobs/run_crawl.py`;
# Ray workers inherit the env, and `ray job submit --working-dir .`
# ships the same layout.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n-hosts", type=int, default=120)
    p.add_argument("--pages-per-host", type=int, default=400)
    p.add_argument("--image-scale", type=int, default=1)
    p.add_argument("--out", required=True)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--concurrency", type=int, default=None)
    p.add_argument("--budget-per-host", type=int, default=None,
                   help="politeness budget: max pages fetched per host")
    p.add_argument("--policy-mode", default="auto",
                   choices=["auto", "broadcast", "partitioned"],
                   help="robots-policy gate mode: broadcast the cache "
                        "(<=10^6 hosts) or hash-co-locate entries with "
                        "their robots_cache row (the >10^6-host path); "
                        "auto picks by host count")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only used when this process owns the Ray session")
    p.add_argument("--seed-urls", action="store_true",
                   help="derive the host list from the messy seed-URL list "
                        "(exercises the canonicalize/create_url entry stage)")
    p.add_argument("--seeds-parquet", default=None,
                   help="path to a (url, seed_rank) parquet seed table — "
                        "the Dataset-native stage-1 input: hosts and dense "
                        "first-appearance ranks derive fully distributed, "
                        "no seed/host list on the driver (the ≫10^6-host "
                        "path)")
    args = p.parse_args()

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kit_ray.pipelines.crawl import crawl, hosts_from_seed_urls
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(
        seed=args.seed,
        n_hosts=args.n_hosts,
        pages_per_host=args.pages_per_host,
        image_scale=args.image_scale,
    )
    if args.seed_urls:
        hosts = hosts_from_seed_urls(cfg.seed_urls())
        assert hosts == cfg.hosts(), "seed-derived host order must be stable"

    t0 = time.time()
    summary = crawl(
        cfg,
        args.out,
        resume=not args.no_resume,
        n_buckets=args.n_buckets,
        concurrency=args.concurrency,
        budget_per_host=args.budget_per_host,
        policy_mode=args.policy_mode,
        seeds_parquet=args.seeds_parquet,
    )
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0 if summary["complete"] else 1


if __name__ == "__main__":
    sys.exit(main())
