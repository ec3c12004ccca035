"""Sitemap emission as a Ray sink — EntryBuilder/IndexBuilder parity.

The reference's builders (inclusion/build/entry.rs, index.rs, plain.rs)
write one sitemap file with hard caps (50,000 records / 50 MB). The
distributed counterpart: partition entry rows into <=50k-record chunks
and emit one XML (or TXT) blob per chunk via ``map_batches`` with
``batch_size=RECORD_LIMIT`` — the natural mirror of the reference's
unimplemented ``AutoBuilder`` sharding (build/auto.rs ``todo!()``),
which our block-parallel writer realizes for free (SURVEY §2.1).
"""

from __future__ import annotations

import os

import pandas as pd

from ..kernels.sitemap import RECORD_LIMIT, Entry, build_plain, build_urlset
from ..kernels.urlkit import try_parse


class UrlsetShardWriter:
    """entry rows -> one <urlset> XML blob per batch (<=50k records)."""

    def __init__(self, out_dir: str, fmt: str = "xml"):
        self.out_dir = out_dir
        self.fmt = fmt
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        entries = []
        for r in df.itertuples(index=False):
            u = try_parse(r.url)
            if u is None:
                continue
            e = Entry(u)
            if getattr(r, "lastmod", None) is not None and pd.notna(r.lastmod):
                e.modified = pd.Timestamp(r.lastmod).to_pydatetime()
            cf = getattr(r, "changefreq", None)
            if cf is not None and pd.notna(cf):
                e.frequency = cf
            pr = getattr(r, "priority", None)
            if pr is not None and pd.notna(pr):
                e.priority = float(pr)
            entries.append(e)
        if self.fmt == "txt":
            blob = build_plain([e.location for e in entries])
            ext = "txt"
        else:
            blob = build_urlset(entries)
            ext = "xml"
        # Deterministic shard name from the first record.
        from ..functions.imagegen import stable_hash

        name = f"sitemap_{stable_hash('shard', entries[0].location.__str__() if entries else 'empty'):016x}.{ext}"
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "records": [len(entries)],
                             "bytes": [len(blob)]})


def write_urlset_sitemaps(ds, out_dir: str, fmt: str = "xml"):
    """Write a Dataset of entry rows (url[, lastmod, changefreq,
    priority]) as sharded sitemap files; returns a manifest DataFrame
    (path, records, bytes per shard). Caps enforced per file by
    construction (batch_size=RECORD_LIMIT)."""
    out = ds.map_batches(
        UrlsetShardWriter,
        fn_constructor_kwargs={"out_dir": out_dir, "fmt": fmt},
        batch_format="pandas",
        batch_size=RECORD_LIMIT,
        concurrency=(1, 4),
    )
    return out.to_pandas()