"""End-to-end: the distributed Ray crawl must bit-match the
single-process reference oracle — crawl order, URL-seen set, politeness
ticks, and every fetched image row (decoded pixels + caption + phash).
Also pins checkpoint/resume: a partially-fetched run resumed later is
identical to an uninterrupted run.
"""

import os
import shutil

import numpy as np
import pytest

from kit_ray.functions.imagegen import decode_image, psnr
from kit_ray.oracle import run_oracle
from kit_ray.pipelines.crawl import crawl, storage_read_parquet_table
from kit_ray.synth import CorpusConfig

CFG = CorpusConfig(seed=7, n_hosts=14, pages_per_host=30)
ORDER_KEYS = ["tick", "host_rank", "stack_rank", "pos"]


@pytest.fixture(scope="module")
def oracle():
    return run_oracle(CFG)


@pytest.fixture(scope="module")
def engine_out(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    summary = crawl(CFG, out, concurrency=3, n_buckets=8)
    assert summary["complete"]
    return out


def _engine_order(out):
    t = storage_read_parquet_table(os.path.join(out, "crawl_order"))
    df = t.to_pandas().sort_values(ORDER_KEYS, kind="stable").reset_index(drop=True)
    return df


def test_crawl_order_bit_match(engine_out, oracle):
    df = _engine_order(engine_out)
    oracle_rows = oracle.crawl_order
    assert len(df) == len(oracle_rows)
    got = list(zip(df["url"], df["tick"], df["host_rank"], df["stack_rank"], df["pos"]))
    want = [
        (r["url"], r["tick"], r["host_rank"], r["stack_rank"], r["pos"])
        for r in oracle_rows
    ]
    assert got == want


def test_url_seen_set_bit_match(engine_out, oracle):
    df = _engine_order(engine_out)
    assert set(df["url_key"]) == oracle.seen


def test_images_bit_match(engine_out, oracle):
    from kit_ray.functions.imagegen import make_pixels

    t = storage_read_parquet_table(os.path.join(engine_out, "images"))
    eng = {r["url"]: r for r in t.to_pylist()}
    assert len(eng) == len(oracle.images)
    fmts = set()
    for ref in oracle.images:
        row = eng[ref["url"]]
        assert row["caption"] == ref["caption"]
        assert row["phash"] == ref["phash"]
        assert (row["w"], row["h"], row["fmt"]) == (ref["w"], ref["h"], ref["fmt"])
        assert row["bytes"] == ref["bytes"]  # engine rows == reference rows
        fmts.add(row["fmt"])
        a = decode_image(row)
        b = decode_image(ref)
        assert np.array_equal(a, b)
        # Per-row invariant vs the SOURCE pixels: exact for lossless
        # formats, PSNR >= 40 dB for the lossy one (input_hint).
        src = make_pixels(ref["url"], CFG.seed)
        if row["fmt"] in ("raw", "png"):
            assert np.array_equal(a, src)
        else:
            assert psnr(a, src) >= 40.0
    assert {"raw", "png", "q6"} <= fmts  # all three codec paths exercised


def test_resume_is_byte_identical(ray_session, tmp_path, oracle):
    full = str(tmp_path / "full")
    partial = str(tmp_path / "partial")

    crawl(CFG, full, concurrency=3, n_buckets=8)

    # Simulate a crash after half the buckets were fetched ...
    s1 = crawl(CFG, partial, concurrency=3, n_buckets=8, only_buckets=[0, 1, 2, 3])
    assert not s1["complete"]
    # ... plus a partially-written bucket with no manifest (must be redone).
    victim = os.path.join(partial, "images", "bucket=0")
    if os.path.isdir(victim):
        os.remove(os.path.join(victim, "_lineage.json"))

    s2 = crawl(CFG, partial, concurrency=3, n_buckets=8)  # resume
    assert s2["complete"]

    ta = storage_read_parquet_table(os.path.join(full, "images"))
    tb = storage_read_parquet_table(os.path.join(partial, "images"))
    da = ta.to_pandas().sort_values("url").reset_index(drop=True)
    db = tb.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(da.columns) == list(db.columns)
    assert len(da) == len(db) == len(oracle.images)
    for col in da.columns:
        assert da[col].equals(db[col]), f"column {col} differs after resume"


def test_dedup_boundary_metadata_exact(ray_session):
    """The funnel-free dedup (per-block drop + block-edge metadata +
    broadcast boundary drop-set) must equal the single-process answer on
    a duplicate-heavy frame whose keys span many blocks — including
    keys hot enough to fill several consecutive blocks (the chain
    case), across several block widths."""
    import pandas as pd
    import ray.data as rd

    from kit_ray.pipelines.crawl import dedup_first_sorted

    rng = np.random.default_rng(23)
    n = 4000
    keys = [f"k{int(v):04d}" for v in rng.integers(0, 700, n)]
    keys[1000:1600] = ["khot"] * 600  # one key spanning many sorted blocks
    df = pd.DataFrame(
        {"url_key": keys,
         "host_rank": rng.integers(0, 50, n).astype("int64"),
         "stack_rank": rng.integers(0, 50, n).astype("int32"),
         "pos": np.arange(n, dtype="int32")}
    )
    want = (
        df.sort_values(["url_key", "host_rank", "stack_rank", "pos"])
        .drop_duplicates("url_key", keep="first")
        .sort_values(list(df.columns)).reset_index(drop=True)
    )
    for nblocks in (1, 16, 64):
        ds = rd.from_pandas(df).repartition(nblocks)
        out = dedup_first_sorted(ds).to_pandas()
        out = out.sort_values(list(out.columns)).reset_index(drop=True)
        assert out[want.columns.tolist()].equals(want), nblocks


def test_politeness_two_pass_multiblock(ray_session):
    """The distributed cumcount must be exact when hosts SPAN block
    boundaries (the offsets path): force many tiny blocks through the
    sort and compare every tick against the single-process answer."""
    import pandas as pd
    import ray.data as rd

    from kit_ray.pipelines.crawl import politeness_ticks_sorted

    rng = np.random.default_rng(13)
    n = 5000
    hosts = [f"h{i % 7}.example" for i in range(n)]
    df = pd.DataFrame(
        {"host": hosts,
         "host_rank": rng.permutation(n).astype("int64"),
         "stack_rank": rng.integers(0, 100, n).astype("int32"),
         "pos": np.arange(n, dtype="int32"),
         "crawl_delay_s": [float((i % 7) + 1) for i in range(n)],
         "url": [f"https://x/{i}" for i in range(n)]}
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # force multi-block sort output
    try:
        got = (
            politeness_ticks_sorted(rd.from_pandas(df).repartition(20))
            .to_pandas()
            .sort_values(["host", "host_rank", "stack_rank", "pos"],
                         kind="stable")
            .reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old
    want = df.sort_values(["host", "host_rank", "stack_rank", "pos"],
                          kind="stable").reset_index(drop=True)
    want["tick"] = (
        want.groupby("host", sort=False).cumcount().astype("float64")
        * want["crawl_delay_s"]
    )
    assert np.allclose(got["tick"].to_numpy(), want["tick"].to_numpy())


def test_no_resume_clears_stale_output(ray_session, tmp_path):
    """resume=False must not append onto a previous run's parquet in the
    same out_dir (Ray's write_parquet appends): row counts after a
    second fresh run equal a single run's, in every stage dir."""
    out = str(tmp_path / "fresh")
    s1 = crawl(CFG, out, concurrency=3, n_buckets=8)
    s2 = crawl(CFG, out, concurrency=3, n_buckets=8, resume=False)
    assert s2["robots_rows"] == s1["robots_rows"] == CFG.n_hosts
    assert s2["scheduled_rows"] == s1["scheduled_rows"]
    imgs = storage_read_parquet_table(os.path.join(out, "images"))
    assert len(imgs) == s1["scheduled_rows"]


def test_stage_checkpoints_skip(ray_session, tmp_path):
    out = str(tmp_path / "skip")
    crawl(CFG, out, concurrency=3, n_buckets=8)
    # Second run with resume must do no work (manifests all valid).
    import time

    t0 = time.time()
    s = crawl(CFG, out, concurrency=3, n_buckets=8)
    assert s["complete"]
    assert time.time() - t0 < 5.0  # pure bookkeeping, no Ray execution


def test_politeness_budget_bit_match(ray_session, tmp_path):
    """The north rule's politeness budget: per-host queue truncated to B
    — engine and oracle agree on who survives and on every tick."""
    from kit_ray.oracle import run_oracle

    B = 7
    out = str(tmp_path / "budget")
    crawl(CFG, out, concurrency=3, n_buckets=8, budget_per_host=B)
    df = _engine_order(out)
    o = run_oracle(CFG, with_images=False, budget_per_host=B)
    got = list(zip(df["url"], df["tick"], df["host_rank"], df["stack_rank"], df["pos"]))
    want = [(r["url"], r["tick"], r["host_rank"], r["stack_rank"], r["pos"])
            for r in o.crawl_order]
    assert got == want
    assert df.groupby("host").size().max() <= B


def test_skewed_corpus_bit_match(ray_session, tmp_path):
    """FIXTURES.md §5 skew: hot hosts carry 10x the URLs across many
    child sitemaps; the two-phase traversal must still bit-match the
    sequential oracle."""
    from kit_ray.oracle import run_oracle

    cfg = CorpusConfig(seed=21, n_hosts=10, pages_per_host=20,
                       hot_every=5, hot_factor=10)
    out = str(tmp_path / "skew")
    crawl(cfg, out, concurrency=3, n_buckets=8)
    t = storage_read_parquet_table(os.path.join(out, "crawl_order"))
    df = t.to_pandas().sort_values(ORDER_KEYS, kind="stable").reset_index(drop=True)
    o = run_oracle(cfg, with_images=False)
    got = list(zip(df["url"], df["tick"], df["host_rank"], df["stack_rank"], df["pos"]))
    want = [(r["url"], r["tick"], r["host_rank"], r["stack_rank"], r["pos"])
            for r in o.crawl_order]
    assert got == want
    # The skew is real: hot hosts dominate the row count.
    sizes = df.groupby("host").size()
    assert sizes.max() > 5 * sizes.median()


class TestPartitionedPolicyMode:
    """policy_mode="partitioned": the robots gate runs on batches
    hash-co-located with their robots_cache row (Dataset.join on host)
    instead of a broadcast {host: policy} dict — the >10^6-host scale
    mode. Output must be bit-identical to broadcast mode."""

    def test_partitioned_mode_bit_matches_oracle(self, ray_session, tmp_path,
                                                 oracle):
        out = str(tmp_path / "part")
        s = crawl(CFG, out, concurrency=3, n_buckets=8,
                  policy_mode="partitioned")
        assert s["policy_mode"] == "partitioned"
        assert s["complete"]
        df = _engine_order(out)
        got = list(zip(df["url"], df["tick"], df["host_rank"],
                       df["stack_rank"], df["pos"]))
        want = [(r["url"], r["tick"], r["host_rank"], r["stack_rank"],
                 r["pos"]) for r in oracle.crawl_order]
        assert got == want
        assert set(df["url_key"]) == oracle.seen

    def test_auto_refuses_broadcast_above_host_cap(self, ray_session,
                                                   tmp_path, engine_out):
        """At a host count above broadcast_max_hosts, auto mode must
        switch to partitioned — and produce the identical schedule the
        broadcast run produced."""
        out = str(tmp_path / "auto")
        s = crawl(CFG, out, concurrency=3, n_buckets=8,
                  broadcast_max_hosts=2)  # 14 hosts > 2: refuse broadcast
        assert s["policy_mode"] == "partitioned"
        want = _engine_order(engine_out)  # broadcast-mode run
        got = _engine_order(out)
        cols = ["url", "host", "url_key", "tick", "host_rank",
                "stack_rank", "pos", "crawl_delay_s", "bucket"]
        assert got[cols].equals(want[cols])


def test_schedule_parts_sizing():
    """Shuffle width: parallelism floor for small inputs (unchanged
    small-scale behavior), measured-bytes growth past the per-partition
    byte target so no host-complete partition outgrows a worker heap."""
    from kit_ray.pipelines.crawl import SCHEDULE_PARTITION_BYTES, schedule_parts

    assert schedule_parts(None, 32) == 16          # floor at high par
    assert schedule_parts(0, 4) == 4               # floor = min(par,16)
    assert schedule_parts(10_000, 8) == 8          # small data: floor
    assert schedule_parts(SCHEDULE_PARTITION_BYTES * 100, 32) == 100
    assert (schedule_parts(SCHEDULE_PARTITION_BYTES * 100 + 1, 32)
            == 101)                                # ceil division
    assert schedule_parts(SCHEDULE_PARTITION_BYTES * 3, 32) == 16  # floor wins
