"""URL-seen set: sharded counting-Bloom + cuckoo filters.

kit has no seen set (the caller owns it); the north rule specifies a
10^10-entry seen set built from sharded counting-bloom + cuckoo filters
keyed by canonicalized URL hash. Design:

- key = stable 64-bit hash of the canonical URL (blake2b — identical on
  every node, unlike Python's builtin hash);
- shard = ``key % n_shards`` with a FIXED shard count (16 by default)
  so the membership set is cluster-size-invariant: resharding never
  happens when the cluster grows from N to 4N nodes;
- each shard actor holds a counting Bloom filter (fast membership with
  deletion support) plus a cuckoo filter (fingerprint-exact within its
  bucket, supports deletes, lower FP at the same memory) — the Bloom
  answers "definitely new", the cuckoo confirms inserts;
- at test scale an exact Python set rides along per shard so bit-match
  tests can compare against the oracle; at the 10^10 design point the
  exact set is dropped and the documented FP budget applies:
  counting-Bloom FP ~ (1-e^{-kn/m})^k — with m = 4 bits x 8 x 2^30 per
  shard and k = 7 at n = 6.25e8 keys/shard, FP ≈ 0.8%; the cuckoo
  filter at 16-bit fingerprints adds FP ≈ 2^-13 within its bucket, so
  a "seen" verdict is wrong ~1e-5 of the time — acceptable for crawl
  dedup (a false "seen" skips one URL; a false "new" is impossible).

Checkpointing: each shard dumps its arrays + exact set to ``.npz``;
restore is exact. Shards are Ray actors — the mutable index the
Dataset API can't express (SURVEY §2.4).
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

from ..functions.imagegen import stable_hash


def url_key_hash(canonical_url: str) -> int:
    return stable_hash("seen", canonical_url)


class CountingBloom:
    """Counting Bloom filter over uint8 counters (capped at 255)."""

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 0):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.counts = np.zeros(n_bits, dtype=np.uint8)

    def _positions(self, key: int) -> np.ndarray:
        # Kirsch–Mitzenmacher double hashing: h1 + i*h2 mod m.
        h1 = stable_hash("b1", str(self.seed), key.to_bytes(8, "little"))
        h2 = stable_hash("b2", str(self.seed), key.to_bytes(8, "little")) | 1
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.n_bits)

    def add(self, key: int):
        pos = self._positions(key)
        c = self.counts[pos]
        self.counts[pos] = np.minimum(c.astype(np.uint16) + 1, 255).astype(np.uint8)

    def remove(self, key: int):
        pos = self._positions(key)
        c = self.counts[pos]
        self.counts[pos] = np.maximum(c.astype(np.int16) - 1, 0).astype(np.uint8)

    def might_contain(self, key: int) -> bool:
        return bool((self.counts[self._positions(key)] > 0).all())


class CuckooFilter:
    """Cuckoo filter with 16-bit fingerprints, 4 slots per bucket."""

    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, seed: int = 0):
        assert n_buckets & (n_buckets - 1) == 0, "power of two"
        self.n_buckets = n_buckets
        self.seed = seed
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)  # 0 == empty
        self.stash: set[int] = set()  # overflow safety valve (rare)

    def _fp(self, key: int) -> int:
        f = stable_hash("cfp", str(self.seed), key.to_bytes(8, "little")) & 0xFFFF
        return f or 1  # 0 is the empty marker

    def _i1(self, key: int) -> int:
        return stable_hash("ci", str(self.seed), key.to_bytes(8, "little")) % self.n_buckets

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ stable_hash("cxor", fp.to_bytes(2, "little"))) % self.n_buckets

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            self.table[i, empty[0]] = fp
            return True
        return False

    def add(self, key: int) -> None:
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            return
        # Kick loop.
        rng = np.random.default_rng(key & 0xFFFFFFFF)  # deterministic per key
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(0, 4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            if self._insert_at(i, fp):
                return
        self.stash.add(fp)  # table overfull: keep correctness, degrade FP

    def might_contain(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        return (
            bool((self.table[i1] == fp).any())
            or bool((self.table[i2] == fp).any())
            or fp in self.stash
        )

    def remove(self, key: int) -> bool:
        """Delete one copy of the key's fingerprint (either candidate
        bucket, then the stash). Standard cuckoo-filter deletion: only
        call for keys known to have been added — removing an absent key
        could delete another key's colliding fingerprint."""
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            slots = np.nonzero(self.table[i] == fp)[0]
            if len(slots):
                self.table[i, slots[0]] = 0
                return True
        if fp in self.stash:
            self.stash.discard(fp)
            return True
        return False


class SeenShard:
    """One shard of the URL-seen set: Bloom + cuckoo (+ exact set at
    test scale). Plain class; wrap with @ray.remote for the actor."""

    def __init__(self, shard_id: int, n_bits: int = 1 << 20,
                 cuckoo_buckets: int = 1 << 16, exact: bool = True):
        self.shard_id = shard_id
        self.bloom = CountingBloom(n_bits, seed=shard_id)
        self.cuckoo = CuckooFilter(cuckoo_buckets, seed=shard_id)
        self.exact: set[int] | None = set() if exact else None
        self.n_added = 0

    def offer(self, keys: Sequence[int]) -> list[bool]:
        """For each key: True if NEW (and now marked seen), False if seen
        before. First-wins semantics within the batch too."""
        out = []
        for k in keys:
            if self.exact is not None:
                new = k not in self.exact
                if new:
                    self.exact.add(k)
            else:
                new = not (self.bloom.might_contain(k) and self.cuckoo.might_contain(k))
            if new:
                self.bloom.add(k)
                self.cuckoo.add(k)
                self.n_added += 1
            out.append(new)
        return out

    def contains(self, keys: Sequence[int]) -> list[bool]:
        if self.exact is not None:
            return [k in self.exact for k in keys]
        return [
            self.bloom.might_contain(k) and self.cuckoo.might_contain(k)
            for k in keys
        ]

    def remove(self, keys: Sequence[int]):
        """Remove keys KNOWN to be present; keys never offered are
        ignored — decrementing the counting-Bloom (or deleting a cuckoo
        fingerprint) for an absent key could zero counters/slots shared
        with other keys and create false 'new' verdicts."""
        for k in keys:
            if self.exact is not None:
                if k not in self.exact:
                    continue
                self.exact.remove(k)
            elif not (self.bloom.might_contain(k)
                      and self.cuckoo.might_contain(k)):
                continue
            self.bloom.remove(k)
            self.cuckoo.remove(k)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "added": self.n_added,
            "bloom_load": float((self.bloom.counts > 0).mean()),
            "cuckoo_load": float((self.cuckoo.table > 0).mean()),
        }

    # -- checkpointing -----------------------------------------------------

    def checkpoint(self, dir_path: str):
        os.makedirs(dir_path, exist_ok=True)
        path = os.path.join(dir_path, f"seen_shard_{self.shard_id}.npz")
        exact = (
            np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))
            if self.exact is not None
            else np.array([], dtype=np.uint64)
        )
        tmp = path + ".tmp.npz"
        np.savez_compressed(
            tmp,
            counts=self.bloom.counts,
            table=self.cuckoo.table,
            stash=np.fromiter(self.cuckoo.stash, dtype=np.uint32,
                              count=len(self.cuckoo.stash)),
            exact=exact,
            n_added=np.array([self.n_added]),
            has_exact=np.array([self.exact is not None]),
        )
        os.replace(tmp, path)  # atomic completion
        return path

    def restore(self, dir_path: str) -> bool:
        path = os.path.join(dir_path, f"seen_shard_{self.shard_id}.npz")
        if not os.path.exists(path):
            return False
        z = np.load(path)
        self.bloom.counts = z["counts"]
        self.cuckoo.table = z["table"]
        self.cuckoo.stash = set(int(x) for x in z["stash"])
        self.exact = set(int(x) for x in z["exact"]) if bool(z["has_exact"][0]) else None
        self.n_added = int(z["n_added"][0])
        return True


class SeenSet:
    """Sharded seen-set facade over Ray actors (or local shards for
    unit tests). Shard count is FIXED and independent of cluster size."""

    def __init__(self, n_shards: int = 16, use_ray: bool = True,
                 exact: bool = True, n_bits: int = 1 << 20,
                 cuckoo_buckets: int = 1 << 16):
        self.n_shards = n_shards
        self.use_ray = use_ray
        if use_ray:
            import ray

            actor = ray.remote(SeenShard)
            self.shards = [
                actor.options(num_cpus=0.1).remote(
                    i, n_bits, cuckoo_buckets, exact
                )
                for i in range(n_shards)
            ]
        else:
            self.shards = [SeenShard(i, n_bits, cuckoo_buckets, exact)
                           for i in range(n_shards)]

    def shutdown(self):
        """Kill the shard actors — bounded-lifetime states (tests, one
        query call) must not leave actors reserving CPU slivers that can
        starve later actor pools on small clusters."""
        if self.use_ray:
            import ray

            for s in self.shards:
                try:
                    ray.kill(s)
                except Exception:  # pragma: no cover - already dead
                    pass
        self.shards = []

    def _route(self, urls: Iterable[str]):
        buckets: dict[int, list[tuple[int, int]]] = {}
        for idx, u in enumerate(urls):
            k = url_key_hash(u)
            buckets.setdefault(k % self.n_shards, []).append((idx, k))
        return buckets

    def _call(self, method: str, urls: Sequence[str]) -> list[bool]:
        buckets = self._route(urls)
        out = [False] * len(urls)
        if self.use_ray:
            import ray

            futs = {
                s: getattr(self.shards[s], method).remote([k for _, k in pairs])
                for s, pairs in buckets.items()
            }
            for s, pairs in buckets.items():
                for (idx, _), v in zip(pairs, ray.get(futs[s])):
                    out[idx] = v
        else:
            for s, pairs in buckets.items():
                for (idx, _), v in zip(
                    pairs, getattr(self.shards[s], method)([k for _, k in pairs])
                ):
                    out[idx] = v
        return out

    def offer(self, urls: Sequence[str]) -> list[bool]:
        return self._call("offer", urls)

    def contains(self, urls: Sequence[str]) -> list[bool]:
        return self._call("contains", urls)

    def checkpoint(self, dir_path: str) -> list[str]:
        if self.use_ray:
            import ray

            return ray.get([s.checkpoint.remote(dir_path) for s in self.shards])
        return [s.checkpoint(dir_path) for s in self.shards]

    def restore(self, dir_path: str) -> bool:
        if self.use_ray:
            import ray

            return all(ray.get([s.restore.remote(dir_path) for s in self.shards]))
        return all(s.restore(dir_path) for s in self.shards)

    def stats(self) -> list[dict]:
        if self.use_ray:
            import ray

            return ray.get([s.stats.remote() for s in self.shards])
        return [s.stats() for s in self.shards]
