"""Per-host politeness: token-bucket authority actors + skew salting.

The batch pipeline computes deterministic virtual-clock ticks with a
host-sorted cumcount (pipelines/crawl.py:politeness_ticks_sorted). This module is
the STREAMING counterpart from SURVEY §4: when URLs for one host arrive
incrementally across rounds, a single per-host authority must hand out
monotone fetch slots honoring Crawl-Delay — mutable state the Dataset
API can't express, so it lives in actors.

Sharding: hosts hash onto a fixed pool of authority actors; ONE actor
owns any given host (serialized politeness) while CPU-heavy work for a
skewed host is spread separately via :func:`salt_hot_hosts` — the salt
spreads fetch/parse compute across tasks, never the schedule authority.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.imagegen import stable_hash


class TokenBucketShard:
    """Authority for a subset of hosts: assigns the next virtual fetch
    tick per host, serialized by construction (one actor per host).

    Virtual clock: host h with delay d gets ticks 0, d, 2d, ... across
    ALL requests ever made for it (monotone across rounds/batches).
    """

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.next_idx: dict[str, int] = {}
        self.delay: dict[str, float] = {}

    def set_delays(self, delays: dict[str, float]):
        self.delay.update(delays)

    def schedule(self, hosts: list[str]) -> list[float]:
        """Assign one tick per request, in arrival order."""
        out = []
        for h in hosts:
            i = self.next_idx.get(h, 0)
            self.next_idx[h] = i + 1
            out.append(i * self.delay.get(h, 0.0))
        return out

    def reserve(self, counts: dict[str, int]) -> dict[str, tuple[int, float]]:
        """Atomically reserve ``counts[h]`` consecutive slots per host;
        returns (base index, delay) per host. Equivalent to
        ``schedule([h] * n)`` but one RPC for a whole round — the
        streaming loop assigns the per-row index distributedly (sorted
        cumcount) and only the counter advance needs the authority."""
        out = {}
        for h, n in counts.items():
            i = self.next_idx.get(h, 0)
            self.next_idx[h] = i + int(n)
            out[h] = (i, self.delay.get(h, 0.0))
        return out

    def state(self) -> dict:
        return {"shard": self.shard_id, "hosts": dict(self.next_idx)}

    def load_state(self, state: dict):
        self.next_idx.update(state.get("hosts", {}))


class PolitenessPool:
    """Fixed pool of token-bucket authorities; host -> one actor."""

    def __init__(self, n_shards: int = 8, use_ray: bool = True):
        self.n_shards = n_shards
        self.use_ray = use_ray
        if use_ray:
            import ray

            actor = ray.remote(TokenBucketShard)
            self.shards = [
                actor.options(num_cpus=0.1).remote(i) for i in range(n_shards)
            ]
        else:
            self.shards = [TokenBucketShard(i) for i in range(n_shards)]

    def _shard_of(self, host: str) -> int:
        return stable_hash("polite", host) % self.n_shards

    def set_delays(self, delays: dict[str, float]):
        per: dict[int, dict[str, float]] = {}
        for h, d in delays.items():
            per.setdefault(self._shard_of(h), {})[h] = d
        if self.use_ray:
            import ray

            ray.get([self.shards[s].set_delays.remote(d) for s, d in per.items()])
        else:
            for s, d in per.items():
                self.shards[s].set_delays(d)

    def checkpoint(self, dir_path: str):
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        if self.use_ray:
            import ray

            states = ray.get([s.state.remote() for s in self.shards])
        else:
            states = [s.state() for s in self.shards]
        tmp = os.path.join(dir_path, "politeness.json.tmp")
        with open(tmp, "w") as f:
            json.dump(states, f)
        os.replace(tmp, os.path.join(dir_path, "politeness.json"))

    def restore(self, dir_path: str) -> bool:
        import json
        import os

        p = os.path.join(dir_path, "politeness.json")
        if not os.path.exists(p):
            return False
        with open(p) as f:
            states = json.load(f)
        if self.use_ray:
            import ray

            ray.get(
                [self.shards[st["shard"]].load_state.remote(st) for st in states]
            )
        else:
            for st in states:
                self.shards[st["shard"]].load_state(st)
        return True

    def shutdown(self):
        """Kill the authority actors (tests / bounded-lifetime rounds:
        lingering actors reserve CPU slivers and can starve later actor
        pools on small clusters)."""
        if self.use_ray:
            import ray

            for s in self.shards:
                try:
                    ray.kill(s)
                except Exception:  # pragma: no cover - already dead
                    pass
        self.shards = []

    def reserve(self, counts: dict[str, int]) -> dict[str, tuple[int, float]]:
        """Reserve slot ranges for many hosts in one call per shard."""
        per: dict[int, dict[str, int]] = {}
        for h, n in counts.items():
            per.setdefault(self._shard_of(h), {})[h] = n
        out: dict[str, tuple[int, float]] = {}
        if self.use_ray:
            import ray

            futs = [self.shards[s].reserve.remote(c) for s, c in per.items()]
            for r in ray.get(futs):
                out.update(r)
        else:
            for s, c in per.items():
                out.update(self.shards[s].reserve(c))
        return out

    def schedule(self, hosts: list[str]) -> list[float]:
        """Ticks for a request list, preserving arrival order per host."""
        buckets: dict[int, list[int]] = {}
        for idx, h in enumerate(hosts):
            buckets.setdefault(self._shard_of(h), []).append(idx)
        out = [0.0] * len(hosts)
        if self.use_ray:
            import ray

            futs = {
                s: self.shards[s].schedule.remote([hosts[i] for i in idxs])
                for s, idxs in buckets.items()
            }
            for s, idxs in buckets.items():
                for i, t in zip(idxs, ray.get(futs[s])):
                    out[i] = t
        else:
            for s, idxs in buckets.items():
                for i, t in zip(idxs, self.shards[s].schedule([hosts[i] for i in idxs])):
                    out[i] = t
        return out


def salt_hot_hosts(
    batch: pa.Table, counts: dict[str, int], threshold: int, n_salts: int = 8
) -> pa.Table:
    """Add a ``salt`` column spreading CPU work for skewed hosts.

    Hosts with more than ``threshold`` pending URLs get
    ``salt = hash(url) % n_salts`` (splitting their rows across that
    many fetch/parse tasks); cold hosts get salt 0. The politeness
    authority is keyed by host only, so the schedule stays serialized
    per host — salting spreads compute, not fetch slots (SURVEY §4).
    """
    hosts = batch["host"].to_pylist()
    urls = batch["url"].to_pylist()
    salts = [
        stable_hash("salt", u) % n_salts if counts.get(h, 0) > threshold else 0
        for h, u in zip(hosts, urls)
    ]
    return batch.append_column("salt", pa.array(salts, pa.int32()))
