"""Seed-URL canonicalization stage and host derivation."""

import pytest


def test_hosts_from_seed_urls_matches_host_order(ray_session):
    from kit_ray.pipelines.crawl import hosts_from_seed_urls
    from kit_ray.synth import CorpusConfig

    cfg = CorpusConfig(seed=3, n_hosts=15, pages_per_host=5)
    derived = hosts_from_seed_urls(cfg.seed_urls(), par=2)
    assert derived == cfg.hosts()


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
