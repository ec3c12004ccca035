"""Sitemap sink round-trip (EntryBuilder parity as a Ray sink) and the
recrawl predicate over traversal entries."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


def test_sitemap_roundtrip_preserves_urls(entry_mod, tmp_path):
    sf = "/root/testdata/sf0.001"
    entries = entry_mod._q_sitemap_entries(sf).to_pandas()
    back = entry_mod._q_sitemap_roundtrip(sf).to_pandas()
    # Every traversal entry URL appears in the rebuilt sitemaps (count
    # preserved including duplicates).
    assert sorted(back["url"]) == sorted(entries["url"])
    # changefreq survives where present.
    a = entries.dropna(subset=["changefreq"]).groupby("url")["changefreq"].first()
    b = back.dropna(subset=["changefreq"]).groupby("url")["changefreq"].first()
    common = a.index.intersection(b.index)
    assert len(common) > 0 and (a[common] == b[common]).all()


def test_sitemap_sink_respects_record_limit(ray_session, tmp_path):
    import ray.data as rd

    from kit_ray.kernels.sitemap import RECORD_LIMIT, parse_urlset
    from kit_ray.pipelines.sitemap_sink import write_urlset_sitemaps

    n = 1000
    ds = rd.from_items([{"url": f"https://e.com/p/{i}"} for i in range(n)])
    m = write_urlset_sitemaps(ds, str(tmp_path / "maps"))
    assert m["records"].sum() == n
    assert (m["records"] <= RECORD_LIMIT).all()
    total = 0
    for p in m["path"]:
        with open(p, "rb") as f:
            total += sum(1 for _ in parse_urlset(f.read()))
    assert total == n


def test_recrawl_due_semantics(entry_mod):
    df = entry_mod.queries()["recrawl_due"]("/root/testdata/sf0.001")
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    assert set(df.columns) == {"url", "changefreq", "lastmod", "due"}
    # 'never' is never due; 'always' is always due.
    never = df[df.changefreq == "never"]
    always = df[df.changefreq == "always"]
    assert len(never) and not never["due"].any()
    assert len(always) and always["due"].all()
    # Unknown metadata -> conservative recrawl.
    unknown = df[df.changefreq.isna()]
    assert len(unknown) and unknown["due"].all()
    # Dated hourly entries from 2023 are overdue by 2024-01-01.
    hourly = df[(df.changefreq == "hourly") & df.lastmod.notna()]
    if len(hourly):
        assert hourly["due"].all()
