"""URL-seen filter shards, politeness authorities, and the incremental
frontier loop."""

import numpy as np
import pandas as pd
import pytest

from kit_ray.state.seen import CountingBloom, CuckooFilter, SeenSet, SeenShard
from kit_ray.stages.politeness import PolitenessPool, TokenBucketShard, salt_hot_hosts


class TestCountingBloom:
    def test_membership_and_remove(self):
        b = CountingBloom(1 << 14)
        keys = [k * 7919 + 13 for k in range(500)]
        for k in keys:
            b.add(k)
        assert all(b.might_contain(k) for k in keys)
        b.remove(keys[0])
        assert not b.might_contain(keys[0]) or True  # may still collide
        # No false negatives for remaining keys.
        assert all(b.might_contain(k) for k in keys[1:])

    def test_fp_rate_bounded(self):
        b = CountingBloom(1 << 16)
        for k in range(2000):
            b.add(k)
        fps = sum(b.might_contain(k) for k in range(10_000, 20_000))
        assert fps / 10_000 < 0.02


class TestCuckoo:
    def test_membership(self):
        c = CuckooFilter(1 << 12)
        keys = list(range(5000))
        for k in keys:
            c.add(k)
        assert all(c.might_contain(k) for k in keys)  # no false negatives
        fps = sum(c.might_contain(k) for k in range(100_000, 110_000))
        assert fps / 10_000 < 0.01

    def test_overfull_degrades_not_breaks(self):
        c = CuckooFilter(1 << 4)  # tiny: force stash usage
        keys = list(range(200))
        for k in keys:
            c.add(k)
        assert all(c.might_contain(k) for k in keys)


class TestSeenShard:
    def test_offer_first_wins(self):
        s = SeenShard(0)
        assert s.offer([1, 2, 1, 3, 2]) == [True, True, False, True, False]
        assert s.contains([1, 2, 3, 4]) == [True, True, True, False]

    def test_checkpoint_restore(self, tmp_path):
        s = SeenShard(3)
        s.offer(list(range(100)))
        s.checkpoint(str(tmp_path))
        s2 = SeenShard(3)
        assert s2.restore(str(tmp_path))
        assert s2.offer([5]) == [False]
        assert s2.offer([1000]) == [True]

    def test_filters_only_mode(self):
        s = SeenShard(0, exact=False)
        assert s.offer([10, 20, 10]) == [True, True, False]
        assert s.contains([10, 20]) == [True, True]

    def test_remove_absent_key_is_noop(self):
        # Removing a never-offered key must not corrupt shared Bloom
        # counters or cuckoo slots of present keys.
        for exact in (True, False):
            s = SeenShard(0, exact=exact)
            s.offer(list(range(50)))
            s.remove([10_000, 10_001])  # never added
            assert s.contains(list(range(50))) == [True] * 50

    def test_remove_then_reoffer_no_fp_accumulation(self):
        s = SeenShard(0, exact=False)
        s.offer([7])
        for _ in range(20):  # remove+re-offer cycles must not grow state
            s.remove([7])
            assert s.contains([7]) == [False]
            assert s.offer([7]) == [True]
        assert int((s.cuckoo.table != 0).sum()) + len(s.cuckoo.stash) == 1


class TestSeenSetLocal:
    def test_sharded_routing(self):
        ss = SeenSet(n_shards=4, use_ray=False)
        urls = [f"https://h{i}.example/p/{i}" for i in range(200)]
        first = ss.offer(urls)
        assert all(first)
        again = ss.offer(urls)
        assert not any(again)
        # Per-shard stats show a reasonable spread.
        adds = [st["added"] for st in ss.stats()]
        assert sum(adds) == 200 and max(adds) < 120

    def test_checkpoint_restore(self, tmp_path):
        ss = SeenSet(n_shards=4, use_ray=False)
        ss.offer([f"u{i}" for i in range(50)])
        ss.checkpoint(str(tmp_path))
        ss2 = SeenSet(n_shards=4, use_ray=False)
        assert ss2.restore(str(tmp_path))
        assert ss2.contains([f"u{i}" for i in range(50)]) == [True] * 50


class TestPoliteness:
    def test_token_bucket_monotone(self):
        t = TokenBucketShard(0)
        t.set_delays({"a": 2.0, "b": 0.0})
        assert t.schedule(["a", "a", "b", "a", "b"]) == [0.0, 2.0, 0.0, 4.0, 0.0]
        # Ticks continue across calls (cross-round monotonicity).
        assert t.schedule(["a"]) == [6.0]

    def test_pool_routing(self):
        p = PolitenessPool(n_shards=4, use_ray=False)
        p.set_delays({"x.example": 1.0, "y.example": 3.0})
        ticks = p.schedule(["x.example", "y.example", "x.example", "y.example"])
        assert ticks == [0.0, 0.0, 1.0, 3.0]

    def test_salt_hot_hosts(self):
        import pyarrow as pa

        t = pa.table({"host": ["hot"] * 10 + ["cold"] * 3,
                      "url": [f"u{i}" for i in range(13)]})
        out = salt_hot_hosts(t, {"hot": 10, "cold": 3}, threshold=5, n_salts=4)
        salts = out["salt"].to_pylist()
        assert set(salts[10:]) == {0}  # cold host unsalted
        assert len(set(salts[:10])) > 1  # hot host spread


def _stream_reference(cfg, waves):
    """Single-process replica of crawl_round semantics across waves:
    per-round policy map (gate by THIS round's policies only), in-round
    first-occurrence dedup, persistent cross-round seen set, persistent
    per-host tick counters (the reserve() contract)."""
    from kit_ray.kernels.robots import Robots
    from kit_ray.kernels.traverse import traverse_host
    from kit_ray.kernels.urlkit import canonical_url, try_parse
    from kit_ray.oracle import USER_AGENT

    seen, counters, rounds, offset = set(), {}, [], 0
    for wave in waves:
        policies = {}
        for h in wave:
            access = cfg.access(h)
            blob = (cfg.fetch(f"https://{h}/robots.txt")
                    if access == "successful" else None)
            policies[h] = Robots.from_access(access, blob, USER_AGENT)
        discovered = []
        for i, host in enumerate(wave):
            for t in traverse_host(policies[host].sitemaps(),
                                   lambda u: cfg.fetch(str(u))):
                u = t.entry.location
                discovered.append(
                    {"url": str(u), "host": u.host_port(),
                     "host_rank": offset + i, "stack_rank": t.stack_rank,
                     "pos": t.pos}
                )
        gated = []
        for row in discovered:
            pol = policies.get(row["host"])
            u = try_parse(row["url"])
            if pol is not None and u is not None and pol.is_absolute_allowed(u):
                gated.append(row)
        gated.sort(key=lambda r: (r["host_rank"], r["stack_rank"], r["pos"]))
        surv = []
        for row in gated:
            key = canonical_url(row["url"]) or row["url"]
            if key in seen:
                continue
            seen.add(key)
            surv.append(row)
        delays = {h: float(policies[h].crawl_delay() or 0.0) for h in wave}
        for row in sorted(surv, key=lambda r: (r["host"], r["host_rank"],
                                               r["stack_rank"], r["pos"])):
            i = counters.get(row["host"], 0)
            counters[row["host"]] = i + 1
            row["tick"] = i * delays.get(row["host"], 0.0)
        surv.sort(key=lambda r: (r["tick"], r["host_rank"], r["stack_rank"],
                                 r["pos"]))
        rounds.append(surv)
        offset += len(wave)
    return rounds


class TestIncrementalFrontier:
    @pytest.mark.parametrize("policy_mode", ["broadcast", "partitioned"])
    def test_rounds_bit_match_reference(self, ray_session, policy_mode):
        """Multi-round streaming e2e: every round's schedule (urls,
        hosts, ticks, order keys) bit-matches the single-process
        reference, including cross-round seen filtering and tick
        continuation for overlapping waves — in BOTH policy modes
        (broadcast gate fused into traversal; ≫10^6-host partitioned
        mode gating after a host-hash policy join)."""
        from kit_ray.pipelines.streaming import FrontierState, crawl_round
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=19, n_hosts=9, pages_per_host=24)
        hosts = cfg.hosts()
        waves = [hosts[:5], hosts[3:]]  # overlap: hosts 3-4 repeat
        want = _stream_reference(cfg, waves)

        from kit_ray.pipelines.streaming import ROUND_SCHEDULE_COLUMNS

        state = FrontierState(n_seen_shards=4, n_polite_shards=2)
        try:
            offset = 0
            for wave, wround in zip(waves, want):
                ds = crawl_round(cfg, state, wave, host_rank_offset=offset,
                                 concurrency=2, policy_mode=policy_mode)
                # Fixed cross-mode schema contract (ADVICE r4): rounds
                # written under broadcast and partitioned policy modes
                # must be column-identical.
                assert ds.schema().names == ROUND_SCHEDULE_COLUMNS
                # Sort-at-read: the round arrives unsorted w/ order keys.
                got = ds.to_pandas().sort_values(
                    ["tick", "host_rank", "stack_rank", "pos"], kind="stable")
                got_rows = list(zip(got["url"], got["host"], got["tick"],
                                    got["host_rank"], got["stack_rank"],
                                    got["pos"]))
                want_rows = [
                    (r["url"], r["host"], r["tick"], r["host_rank"],
                     r["stack_rank"], r["pos"])
                    for r in wround
                ]
                assert got_rows == want_rows
                offset += len(wave)
        finally:
            state.shutdown()

    def test_checkpoint_resume_round_bit_match(self, ray_session, tmp_path):
        """Kill-and-resume between rounds: round 2 run from a RESTORED
        state (seen shards + politeness counters) must be bit-identical
        to round 2 of the uninterrupted run — the per-partition
        checkpoint criterion for the streaming frontier."""
        from kit_ray.pipelines.streaming import FrontierState, crawl_round
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=29, n_hosts=8, pages_per_host=18)
        hosts = cfg.hosts()

        a = FrontierState(n_seen_shards=4, n_polite_shards=2)
        try:
            crawl_round(cfg, a, hosts[:5], host_rank_offset=0, concurrency=2)
            want = crawl_round(cfg, a, hosts[3:], host_rank_offset=5,
                               concurrency=2).to_pandas()
        finally:
            a.shutdown()

        b = FrontierState(n_seen_shards=4, n_polite_shards=2)
        try:
            crawl_round(cfg, b, hosts[:5], host_rank_offset=0, concurrency=2)
            b.checkpoint(str(tmp_path))
        finally:
            b.shutdown()
        c = FrontierState(n_seen_shards=4, n_polite_shards=2)  # "restart"
        try:
            assert c.restore(str(tmp_path))
            got = crawl_round(cfg, c, hosts[3:], host_rank_offset=5,
                              concurrency=2).to_pandas()
        finally:
            c.shutdown()

        cols = ["url", "host", "tick", "host_rank", "stack_rank", "pos"]
        key = ["tick", "host_rank", "stack_rank", "pos"]
        assert got[cols].sort_values(key).reset_index(drop=True).equals(
            want[cols].sort_values(key).reset_index(drop=True)
        )

    def test_two_rounds_and_restore(self, ray_session, tmp_path):
        from kit_ray.pipelines.streaming import FrontierState, crawl_round
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=11, n_hosts=8, pages_per_host=20)
        hosts = cfg.hosts()

        state = FrontierState(n_seen_shards=4, n_polite_shards=2)
        state2 = None
        try:
            r1 = crawl_round(cfg, state, hosts[:5], host_rank_offset=0,
                             concurrency=2).to_pandas()
            assert len(r1) > 0
            # Round 2 includes two repeat hosts: their URLs are already seen.
            r2 = crawl_round(cfg, state, hosts[3:], host_rank_offset=5,
                             concurrency=2).to_pandas()
            repeat_urls = set(r1["url"])
            assert not (set(r2["url"]) & repeat_urls)
            # Hosts 5..7 did get crawled in round 2.
            assert any(h in set(r2["host"]) for h in hosts[5:])

            # Checkpoint, rebuild state, restore: repeats still recognized.
            state.checkpoint(str(tmp_path))
            state2 = FrontierState(n_seen_shards=4, n_polite_shards=2)
            assert state2.restore(str(tmp_path))
            r3 = crawl_round(cfg, state2, hosts[:5], host_rank_offset=0,
                             concurrency=2).count()
            assert r3 == 0  # everything from round 1 is seen
        finally:
            state.shutdown()
            if state2 is not None:
                state2.shutdown()


class TestRoundCheckpointOutput:
    def test_round_written_as_parquet_with_manifest(self, ray_session, tmp_path):
        """out_dir mode: each round lands as round=K/ parquet plus a
        lineage manifest, and the returned Dataset matches the files —
        the streaming analogue of the batch pipeline's stage
        checkpoints (no full-round driver collect anywhere)."""
        import os

        import pyarrow.dataset as pads

        from kit_ray.pipelines.streaming import FrontierState, crawl_round
        from kit_ray.sources import storage
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=31, n_hosts=6, pages_per_host=12)
        hosts = cfg.hosts()
        state = FrontierState(n_seen_shards=4, n_polite_shards=2)
        try:
            ds = crawl_round(cfg, state, hosts, host_rank_offset=0,
                             concurrency=2, out_dir=str(tmp_path))
            rdir = os.path.join(str(tmp_path), "round=1")
            m = storage.valid_checkpoint(rdir, "round-1")
            assert m is not None and m["rows"] == ds.count() > 0
            filed = pads.dataset(
                rdir, format="parquet", ignore_prefixes=[".", "_"]
            ).to_table().to_pandas()
            cols = ["url", "host", "tick", "host_rank", "stack_rank", "pos"]
            got = ds.to_pandas()[cols]
            key = ["tick", "host_rank", "stack_rank", "pos"]
            assert filed[cols].sort_values(key).reset_index(drop=True).equals(
                got.sort_values(key).reset_index(drop=True)
            )
        finally:
            state.shutdown()

    def test_fetch_round_images_bit_match(self, ray_session, tmp_path):
        """Streaming fetch: images fetched for a round must carry the
        same deterministic payload rows (caption/phash/pixels) the
        batch fetch produces for those URLs."""
        import os

        import pyarrow.dataset as pads

        from kit_ray.functions.imagegen import make_image_row
        from kit_ray.pipelines.streaming import (
            FrontierState,
            crawl_round,
            fetch_round,
        )
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=37, n_hosts=5, pages_per_host=10)
        state = FrontierState(n_seen_shards=4, n_polite_shards=2)
        try:
            ds = crawl_round(cfg, state, cfg.hosts(), host_rank_offset=0,
                             concurrency=2)
            rows, rdir = fetch_round(ds, cfg, str(tmp_path), state.round,
                                     n_buckets=4, concurrency=2)
            assert rows == ds.count() > 0
            got = pads.dataset(
                rdir, format="parquet", partitioning="hive",
                ignore_prefixes=[".", "_"],
            ).to_table().to_pylist()
            assert len(got) == rows
            for r in got:
                want = make_image_row(r["url"], cfg.seed,
                                      getattr(cfg, "image_scale", 1))
                assert r["caption"] == want["caption"]
                assert r["phash"] == want["phash"]
                assert r["bytes"] == want["bytes"]
        finally:
            state.shutdown()
