"""Seed-URL canonicalization stage and host derivation."""

import pytest


def test_hosts_from_seed_urls_matches_host_order(ray_session):
    from kit_ray.pipelines.crawl import hosts_from_seed_urls
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(seed=3, n_hosts=15, pages_per_host=5)
    derived = hosts_from_seed_urls(cfg.seed_urls(), par=2)
    assert derived == cfg.hosts()


def test_ranked_hosts_from_seeds_dataset(ray_session):
    """Distributed dense first-appearance ranks == enumerate order."""
    import ray.data as rd

    from kit_ray.pipelines.crawl import ranked_hosts_from_seeds
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(seed=7, n_hosts=23, pages_per_host=4)
    ds = rd.from_items(
        [{"url": u, "seed_rank": i} for i, u in enumerate(cfg.seed_urls())]
    ).repartition(6)
    got = ranked_hosts_from_seeds(ds, par=4).to_pandas()
    got = got.sort_values("host_rank").reset_index(drop=True)
    assert list(got["host"]) == cfg.hosts()
    assert list(got["host_rank"]) == list(range(len(cfg.hosts())))


def test_crawl_from_parquet_seeds_bit_match(ray_session, tmp_path):
    """crawl(seeds_parquet=...) — the Dataset-native stage-1 input —
    must produce a byte-identical crawl_order and image table to the
    synthetic-config path over the same hosts (round-4 verdict #4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kit_ray.pipelines.crawl import crawl, storage_read_parquet_table
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(seed=13, n_hosts=10, pages_per_host=8)
    seeds_path = str(tmp_path / "seeds.parquet")
    urls = cfg.seed_urls()
    pq.write_table(
        pa.table({"url": urls,
                  "seed_rank": list(range(len(urls)))}), seeds_path)

    out_a = str(tmp_path / "from_cfg")
    out_b = str(tmp_path / "from_parquet")
    crawl(cfg, out_a, resume=False, n_buckets=4, concurrency=4)
    crawl(cfg, out_b, resume=False, n_buckets=4, concurrency=4,
          seeds_parquet=seeds_path)

    import os

    key = ["tick", "host_rank", "stack_rank", "pos"]
    for sub, cols in [
        ("crawl_order", ["url", "host", "url_key", "tick", "host_rank",
                         "stack_rank", "pos"]),
        ("images", ["image_id", "bytes", "caption", "phash", "url"]),
    ]:
        a = storage_read_parquet_table(os.path.join(out_a, sub)).to_pandas()
        b = storage_read_parquet_table(os.path.join(out_b, sub)).to_pandas()
        sort_by = key if sub == "crawl_order" else ["url"]
        a = a[cols].sort_values(sort_by if sub == "crawl_order" else ["url"],
                                kind="stable").reset_index(drop=True)
        b = b[cols].sort_values(sort_by if sub == "crawl_order" else ["url"],
                                kind="stable").reset_index(drop=True)
        assert a.equals(b), f"{sub} differs between seed paths"


def test_canonicalize_drops_and_strips(ray_session):
    import ray.data as rd

    from kit_ray.stages.crawl_stages import canonicalize_seeds

    urls = [
        "https://user:pw@a.example/x/y.html",   # creds stripped in robots_url
        "HTTPS://B.Example:443/",               # normalized
        "ftp://c.example/file",                 # wrong scheme: dropped
        "mailto:someone@d.example",             # cannot-be-base: dropped
        "garbage",                              # unparseable: dropped
        "https://e.example/p#frag",             # fragment dropped in url_key
    ]
    ds = rd.from_items([{"url": u, "seed_rank": i} for i, u in enumerate(urls)])
    out = ds.map_batches(canonicalize_seeds, batch_format="pyarrow").to_pandas()
    assert list(out["host"]) == ["a.example", "b.example", "e.example"]
    assert out.loc[0, "robots_url"] == "https://a.example/robots.txt"
    assert out.loc[1, "url"] == "https://b.example/"
    assert out.loc[2, "url_key"] == "https://e.example/p"
    assert list(out["seed_rank"]) == [0, 1, 5]


def test_all_invalid_seeds_yield_empty_host_table(ray_session):
    """Every seed invalid -> empty list, not a KeyError (regression:
    the distributed rank path crashed on a zero-block edges table)."""
    from kit_ray.pipelines.crawl import hosts_from_seed_urls

    assert hosts_from_seed_urls(["not a url", "::::", "ftp//x"], par=2) == []
    assert hosts_from_seed_urls([], par=2) == []


def test_seeds_digest_tracks_file_contents(tmp_path):
    """Regenerating the seed table in place must invalidate the crawl
    digest (resume correctness): the fingerprint covers size+mtime,
    not just the path string."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kit_ray.pipelines.crawl import _digest
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(seed=1, n_hosts=2, pages_per_host=2)
    p = str(tmp_path / "seeds.parquet")
    pq.write_table(pa.table({"url": ["https://a.example/"],
                             "seed_rank": [0]}), p)
    d1 = _digest(cfg, 4, seeds_parquet=p)
    pq.write_table(pa.table({"url": ["https://b.example/", "https://c.example/"],
                             "seed_rank": [0, 1]}), p)
    os.utime(p, ns=(1, 1))  # force distinct mtime even on coarse clocks
    d2 = _digest(cfg, 4, seeds_parquet=p)
    assert d1 != d2
    assert _digest(cfg, 4) != d1  # with-seeds differs from without
