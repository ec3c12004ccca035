"""Training-data pipelines over the testdata tables — one function per
``queries()`` entry in ``__ray_entry__``.

Every function takes ``sf_dir`` and returns a Dataset / DataFrame /
Table. Column names match the paired ``oracle_sql()`` strings exactly
(the driver's value-hash compares by sorted column name). Shapes follow
the scale rules: prune columns at the read, pre-aggregate inside
``map_batches`` before any groupby, broadcast small sides with
``ray.put``, keep binary/nested columns in Arrow format.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import dedup as D
from ..functions import text as T
from ..stages.data_stages import (
    BruteForceTopK,
    LangId,
    MinHasher,
    SimHasher,
    TextFeatures,
)


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def token_counts(sf_dir: str):
    """doc_id, text_len, n_tokens (whitespace), n_bpeish (BPE-ish regex)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["text_len"] = df["text"].str.len().astype("int64")
        out["n_tokens"] = T.whitespace_token_count(df["text"])
        out["n_bpeish"] = T.bpeish_token_count(df["text"])
        return out

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def char_class_counts(sf_dir: str):
    """doc_id, punct_cnt, digit_cnt — integer counts (exact vs SQL)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["punct_cnt"] = df["text"].str.count(T.PUNCT_RE).astype("int64")
        out["digit_cnt"] = df["text"].str.count(T.DIGIT_RE).astype("int64")
        return out

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_quality(sf_dir: str):
    """Full quality features (stopword ratio + composite score) — not
    SQL-expressible; rows-only check + pytest."""
    return _read(sf_dir, "documents").map_batches(
        TextFeatures, batch_format="pandas", concurrency=(1, 4)
    )


def lang_id_preds(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=(1, 4)
    )


def fingerprints(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["fingerprint"] = T.rolling_fingerprint(df["text"])
        return out

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """Exact dedup: doc_id of the first (min doc_id) document per exact
    text. hash-partition (groupby content hash) + per-group min."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "text"]].copy()
        df["h"] = D.content_hash(df["text"])
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # Same 64-bit hash, distinct text is possible in principle:
        # resolve per exact text within the hash group.
        return (
            g.sort_values("doc_id").groupby("text", sort=False).head(1)[["doc_id"]]
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add_key, batch_format="pandas"
    )
    return ds.groupby("h").map_groups(keep_first, batch_format="pandas")


def minhash_lsh_pairs(sf_dir: str, num_perm=128, bands=16, threshold=0.8):
    """MinHash+LSH near-dup: shingle -> signature -> band buckets ->
    groupby(band, band_key) -> candidate pairs -> Jaccard verify.

    The verify step re-reads the two texts via a broadcast id->text map
    (documents is the small side at test scale; at 100 TB the verify is
    a second co-partitioned pass keyed by doc_id instead)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    texts_ref = ray.put(texts)

    banded = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pandas",
        concurrency=(1, 4),
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # Vectorized per-block pair generation over contiguous buckets
        # (blocks are sorted by (band, band_key); see note below).
        out_a, out_b = [], []
        for (_, _), g in df.groupby(["band", "band_key"], sort=False):
            ids = sorted(set(g["doc_id"]))
            for i, x in enumerate(ids):
                for y in ids[i + 1 :]:
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame(
            {"doc_id_a": pd.Series(out_a, dtype="int64"),
             "doc_id_b": pd.Series(out_b, dtype="int64")}
        )

    # Sort makes buckets contiguous; the single-block coalesce keeps every
    # bucket whole (exact pairs). Ray's groupby().map_groups costs ~1 ms
    # per group — fatal with one group per band bucket. At cluster scale
    # the coalesce is replaced by a hash-partitioned self-join on
    # (band, band_key) (Dataset.join) — buckets are tiny by construction.
    cands = (
        banded.sort(["band", "band_key"])
        .repartition(1)
        .map_batches(bucket_pairs, batch_format="pandas", batch_size=None)
    )

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"doc_id_a": pd.Series([], dtype="int64"),
                     "doc_id_b": pd.Series([], dtype="int64"),
                     "jaccard": pd.Series([], dtype="float64")}
                )
            df = df.drop_duplicates()
            sims = [
                D.ngram_jaccard(self.texts[a], self.texts[b])
                for a, b in zip(df["doc_id_a"], df["doc_id_b"])
            ]
            df = df.assign(jaccard=np.round(sims, 6))
            return df[df["jaccard"] >= threshold]

    verified = cands.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))
    # Candidate pairs can surface from several bands: global dedup.
    return verified.to_pandas().drop_duplicates(
        subset=["doc_id_a", "doc_id_b"]
    ).reset_index(drop=True)


def simhashes(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", concurrency=(1, 4)
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.5):
    """Embedding-cosine near-dup pairs (vec_id_a < vec_id_b,
    cosine >= threshold). Blocked matmul per batch against the broadcast
    full matrix — the verify-everything shape valid while the embedding
    table fits the object store; the LSH-bucketed variant is the scale
    path (ann_ivf).

    Production near-dup uses ~0.95; the synthetic embeddings are
    near-orthogonal (max off-diagonal cosine ~0.51), so the default
    here is 0.5 to keep the demo output non-degenerate."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    ref = ray.put({"ids": ids, "vecs": D.normalize_rows(vecs)})

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        full = ray.get(ref)
        bids = df["vec_id"].to_numpy()
        bvecs = D.normalize_rows(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        sims = bvecs @ full["vecs"].T
        rows = {"vec_id_a": [], "vec_id_b": [], "cosine": []}
        for r in range(len(bids)):
            js = np.nonzero(sims[r] >= threshold)[0]
            for j in js:
                if full["ids"][j] > bids[r]:
                    rows["vec_id_a"].append(int(bids[r]))
                    rows["vec_id_b"].append(int(full["ids"][j]))
                    rows["cosine"].append(round(float(sims[r, j]), 6))
        return pd.DataFrame(rows).astype(
            {"vec_id_a": "int64", "vec_id_b": "int64", "cosine": "float64"}
        )

    return emb.map_batches(score_block, batch_format="pandas", batch_size=256)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Brute-force cosine top-k for the first ``n_queries`` vectors:
    per-batch partial top-k against broadcast queries, then a tiny
    global merge. Ties broken by neighbor_id asc; score rounded to 6dp
    to make the DuckDB comparison exact."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(emb.take(n_queries * 4), key=lambda r: r["vec_id"])[:n_queries]
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    ref = ray.put({"ids": q_ids, "vecs": q_vecs})

    partials = emb.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pandas",
        batch_size=512,
        concurrency=(1, 4),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64),
                     score=np.round(g["score"], 6))
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ann_ivf(sf_dir: str, n_queries: int = 8, k: int = 10, n_cells: int = 16,
            nprobe: int = 4):
    """IVF variant: k-means cells fitted on a sample (driver-side, tiny),
    candidates restricted to the nprobe nearest cells. Returns the same
    schema as ann_topk (recall < 1.0 by design — pinned by pytest)."""
    from ..functions.ann import ivf_assign, ivf_probe_cells, kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    cents = kmeans_fit(vecs[: max(2000, n_cells * 50)], n_cells)
    assign = ivf_assign(vecs, cents)

    order = np.argsort(ids, kind="stable")
    qsel = order[:n_queries]
    probe = ivf_probe_cells(vecs[qsel], cents, nprobe)

    out = {"query_id": [], "neighbor_id": [], "score": [], "rank": []}
    qn = D.normalize_rows(vecs)
    for qi, gq in enumerate(qsel):
        cells = set(probe[qi].tolist())
        mask = np.isin(assign, list(cells)) & (ids != ids[gq])
        sims = qn[gq] @ qn[mask].T
        cand_ids = ids[mask]
        sel = np.lexsort((cand_ids, -sims))[:k]
        for rank, j in enumerate(sel, 1):
            out["query_id"].append(int(ids[gq]))
            out["neighbor_id"].append(int(cand_ids[j]))
            out["score"].append(round(float(sims[j]), 6))
            out["rank"].append(rank)
    return pd.DataFrame(out).astype(
        {"query_id": "int64", "neighbor_id": "int64", "score": "float64",
         "rank": "int64"}
    )


# ---------------------------------------------------------------------------
# Relational / events (groupby, join, sort, windows)
# ---------------------------------------------------------------------------

def docs_by_lang(sf_dir: str):
    """lang, n_docs, sum_chars — partial aggregate inside map_batches,
    then a tiny groupby over per-batch partials (pre-agg pattern)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False)["n_chars"].agg(["count", "sum"]).reset_index()
        return g.rename(columns={"count": "n_docs", "sum": "sum_chars"})

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    from ray.data.aggregate import Sum

    out = ds.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
    )
    return out


def tpch_q1(sf_dir: str):
    """Pricing summary (TPC-H Q1 shape) over lineitem with vectorized
    Arrow pre-aggregation; monetary sums rounded to 2dp for exact
    float comparison with the oracle."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(
            pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc).append_column("charge", charge)
        df = t.select(["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "disc_price", "charge"]).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            count_order=("l_quantity", "count"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(sf_dir, "lineitem", cols).map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("count_order", alias_name="count_order"),
    )
    df = agg.to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        df[c] = df[c].round(2)
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def top_customers(sf_dir: str, n: int = 10):
    """Top-N customers by total order value: broadcast-join the (small)
    customer dim into an orders aggregate — no shuffle join."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent")
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).to_pandas()
    df = per_cust.to_pandas().merge(
        cust, left_on="o_custkey", right_on="c_custkey", how="inner"
    )
    df["total_spent"] = df["total_spent"].round(2)
    df = df.sort_values(["total_spent", "c_custkey"], ascending=[False, True]).head(n)
    return df[["c_custkey", "c_name", "c_mktsegment", "total_spent"]].reset_index(
        drop=True
    )


def order_revenue_by_priority(sf_dir: str):
    """Large-x-large distributed hash join (Dataset.join, hash-partitioned
    on the key) of lineitem with orders, then partial-agg by priority
    inside map_batches before a 5-group final aggregate."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        g = df.groupby("o_orderpriority", sort=False)["rev"].agg(["sum", "count"])
        g = g.reset_index().rename(columns={"sum": "revenue", "count": "n_items"})
        return g

    from ray.data.aggregate import Sum

    out = joined.map_batches(partial, batch_format="pandas").groupby(
        "o_orderpriority"
    ).aggregate(
        Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items")
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out


def orders_by_priority(sf_dir: str):
    """Plain distributed count per priority (pre-agg pattern)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", sort=False).size().rename("n")
        return g.reset_index()

    from ray.data.aggregate import Sum

    out = _read(sf_dir, "orders", ["o_orderpriority"]).map_batches(
        partial, batch_format="pandas"
    ).groupby("o_orderpriority").aggregate(Sum("n", alias_name="n")).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


def supplier_by_region(sf_dir: str):
    """Three-way dimension join (region ⋈ nation ⋈ supplier) via
    broadcast pandas merges — dims are the small side; no shuffle."""
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim_ref = ray.put(dim[["n_nationkey", "r_name"]])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        m = df.merge(d, left_on="s_nationkey", right_on="n_nationkey")
        g = m.groupby("r_name", sort=False)["s_acctbal"].agg(["count", "sum"])
        return g.reset_index().rename(columns={"count": "n_suppliers",
                                               "sum": "sum_acctbal"})

    from ray.data.aggregate import Sum

    out = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]).map_batches(
        partial, batch_format="pandas"
    ).groupby("r_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers"),
        Sum("sum_acctbal", alias_name="sum_acctbal"),
    ).to_pandas()
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    return out


def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: partial per-batch agg ->
    small groupby. n int64; sum_value rounded to 3dp."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.floor("h"))
        g = df.groupby(["event_type", "hour"], sort=False)["value"].agg(
            ["count", "sum"]
        ).reset_index()
        return g.rename(columns={"count": "n", "sum": "sum_value"})

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pandas"
    )
    from ray.data.aggregate import Sum

    out = ds.groupby(["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(3)
    out["n"] = out["n"].astype("int64")
    return out


def recrawl_due(sf_dir: str, now: str = "2024-01-01T00:00:00+00:00"):
    """Recrawl-scheduling predicate over the traversal's sitemap entries
    (Frequency::is_outdated arithmetic, frequency.rs:69-100): an entry is
    due iff changefreq says it may have changed since lastmod, evaluated
    against a fixed virtual 'now'. Unknown lastmod/changefreq -> due
    (conservative). Vectorized pyarrow/pandas timestamp arithmetic."""
    import numpy as np

    from ..kernels.sitemap import iso8601_parse

    now_ts = pd.Timestamp(iso8601_parse(now))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        delta = df["changefreq"].map(
            {"hourly": pd.Timedelta(hours=1), "daily": pd.Timedelta(days=1),
             "weekly": pd.Timedelta(days=7), "monthly": pd.Timedelta(days=30),
             "yearly": pd.Timedelta(days=365)}
        )
        lastmod = pd.to_datetime(df["lastmod"], utc=True)
        nxt = lastmod + delta
        due = pd.Series(True, index=df.index)  # default: due
        due[df["changefreq"] == "never"] = False
        known = delta.notna() & lastmod.notna()
        due[known] = nxt[known] <= now_ts
        out = df[["url", "changefreq"]].copy()
        out["lastmod"] = lastmod.astype("datetime64[us, UTC]")
        out["due"] = due.astype(bool)
        return out

    import __ray_entry__ as entry_mod  # reuse the traversal query

    entries = entry_mod.queries()["sitemap_entries"](sf_dir)
    return entries.map_batches(fn, batch_format="pandas")


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per user, a new session starts after a >30 min
    gap. groupby(user).map_groups over ts-sorted events — the
    stream-shaped workload pattern (ordered log per key)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        new_s = (g["ts"].diff() > gap).sum()
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]],
             "n_events": [len(g)],
             "n_sessions": [int(new_s) + 1]}
        ).astype({"user_id": "int64", "n_events": "int64", "n_sessions": "int64"})

    return _read(sf_dir, "events", ["user_id", "ts"]).groupby("user_id").map_groups(
        sess, batch_format="pandas"
    )
