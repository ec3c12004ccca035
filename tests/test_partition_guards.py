"""The schedule's in-block exact path is guarded by a DIRECT
key-completeness proof (hosts_block_disjoint) — these tests pin both
verdicts of the guard and the stage_task worker cache semantics."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_hosts_block_disjoint_true_on_partitioned(ray_session):
    from kit_ray.pipelines.crawl import hash_partition_by_host, hosts_block_disjoint

    rows = [{"host": f"h{i % 7}", "v": i} for i in range(100)]
    ds = hash_partition_by_host(rd.from_items(rows).repartition(5), 4)
    assert hosts_block_disjoint(ds) is True


def test_hosts_block_disjoint_false_on_straddle(ray_session):
    """A host split across two blocks must FAIL the guard — this is the
    case the old num_blocks()==nparts proxy could not see."""
    from kit_ray.pipelines.crawl import hosts_block_disjoint

    a = pd.DataFrame({"host": ["h1", "h1", "h2"], "v": [1, 2, 3]})
    b = pd.DataFrame({"host": ["h2", "h3"], "v": [4, 5]})  # h2 straddles
    ds = rd.from_blocks([pa.Table.from_pandas(a), pa.Table.from_pandas(b)])
    assert hosts_block_disjoint(ds) is False


def test_hosts_block_disjoint_only_ships_host_column(ray_session):
    """The guard's metadata pass must not depend on (or ship) the
    payload columns — a block with a non-serializable-ish wide column
    still checks fine and quickly."""
    from kit_ray.pipelines.crawl import hosts_block_disjoint

    big = pd.DataFrame({
        "host": ["a"] * 50 + ["b"] * 50,
        "payload": [b"x" * 10_000] * 100,
    })
    ds = rd.from_blocks([
        pa.Table.from_pandas(big[big["host"] == "a"]),
        pa.Table.from_pandas(big[big["host"] == "b"]),
    ])
    assert hosts_block_disjoint(ds) is True


class _CountingStage:
    constructed = 0  # per-process; workers each see their own copy

    def __init__(self, tag: str):
        type(self).constructed += 1
        self.tag = tag

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.append_column("tag", pa.array([self.tag] * len(t)))


def test_stage_task_caches_per_ctor_args():
    """Same (class, ctor args) -> same cached instance within a worker
    process; different args -> a fresh instance."""
    from kit_ray.stages.crawl_stages import _WORKER_STAGES, stage_task

    _WORKER_STAGES.clear()
    base = _CountingStage.constructed
    fn_a = stage_task(_CountingStage, tag="a")
    fn_b = stage_task(_CountingStage, tag="b")
    t = pa.table({"x": [1, 2]})

    out = fn_a(t)
    assert out["tag"].to_pylist() == ["a", "a"]
    fn_a(t)
    assert _CountingStage.constructed == base + 1  # cached, not rebuilt
    out_b = fn_b(t)
    assert out_b["tag"].to_pylist() == ["b", "b"]
    assert _CountingStage.constructed == base + 2


def test_stage_task_cache_bounded():
    """The per-worker cache evicts FIFO past 8 entries instead of
    growing without bound."""
    from kit_ray.stages.crawl_stages import _WORKER_STAGES, stage_task

    _WORKER_STAGES.clear()
    t = pa.table({"x": [1]})
    for i in range(12):
        stage_task(_CountingStage, tag=f"t{i}")(t)
    assert len(_WORKER_STAGES) <= 8
