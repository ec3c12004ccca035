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
from ..stages.crawl_stages import stage_task
from ..stages.data_stages import (
    BruteForceTopK,
    LangId,
    MinHasher,
    SimHasher,
    TextFeatures,
)


def _par() -> int:
    """Usable CPU count (pool sizing; a couple reserved for shuffle)."""
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    except Exception:  # pragma: no cover
        return 4


def _read(sf_dir: str, table: str, columns=None, split: bool = False):
    """Pruned parquet read. ``split=True`` overrides the read's block
    count to ~2x the CPU count: the testdata tables are single files
    (one block), which would cap a downstream actor pool's parallelism
    at 1 (parallelism = input block count, not pool size). A production
    corpus is many files/row-groups and needs no override."""
    kw = {}
    if split:
        kw["override_num_blocks"] = _par() * 2
    return _clean(rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, **kw
    ))


def _clean(ds):
    """Zero-copy strip of file-footer schema metadata right after a
    parquet read. Pandas-written parquet (the testdata tables AND our
    own checkpoints written from pandas batches) carries ``b'pandas'``
    schema metadata whose nested dict makes ``pa.Schema`` unhashable;
    blocks read from such files then make every downstream hash join /
    sort / repartition log ``Failed to hash the schemas (for
    deduplication)`` per block and lose the shuffle's schema dedup
    (redundant schema bytes shipped with each block). The kit_ray
    monkeypatch covers pandas->arrow conversions in-process; this
    covers the read boundary (delegates to the storage seam)."""
    from ..sources.storage import strip_schema_metadata

    return strip_schema_metadata(ds)


def _table_rows(sf_dir: str, table: str) -> int:
    """Exact row count from parquet footer metadata — no Dataset pass
    over the corpus (a ``ds.count()`` would re-read every block just to
    size partitions)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _join_parts(requested: int | None = None) -> int:
    """Hash-join partition count bounded by the cluster CPU count: each
    partition pins a HashShuffleAggregator actor, and more aggregators
    than CPUs deadlocks the streaming executor on small clusters
    (measured: num_partitions=8 at 4 CPUs hangs; 4 works)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # pragma: no cover
        cpus = 4
    return max(2, min(requested or 8, cpus))


def _rename_clean(mapping: dict):
    """Zero-copy arrow column rename that also strips the ``b'pandas'``
    schema metadata pandas-derived blocks carry (its nested dict makes
    pa.Schema unhashable, so every shuffle aggregator logs a warning
    and loses schema dedup). Cheaper than the pandas rename it
    replaces — no data copy at all."""
    def f(t: pa.Table) -> pa.Table:
        out = t.rename_columns([mapping.get(c, c) for c in t.column_names])
        return out.replace_schema_metadata(None)

    return f


def sorted_dedup(ds, sort_keys, subset, coalesce=None, nparts=None):
    """First-row-per-key with NO single-block funnel and NO global
    sort: ONE keyed hash repartition on the partitionable subset
    columns co-locates every key's rows in exactly one block, so an
    in-block ``sort_values(order) + drop_duplicates(subset,
    keep="first")`` is globally exact — the kept row is the min-order
    row per key. (An earlier version range-sorted then coalesced
    through ``repartition(1)``; at 100 TB that funnels the whole
    deduped corpus through one worker. The hash form is one all-to-all
    with per-block parallel finish — the minimum any exact dedup
    pays.)

    ``sort_keys`` keeps the historical signature: columns in
    ``sort_keys`` but not in ``subset`` are the tie-break order
    (which duplicate wins); partition columns are
    ``subset ∩ sort_keys`` (equal-subset rows always agree on them,
    so one hash shuffle co-locates each dup group even when
    ``subset`` contains unsortable payloads like full text).
    ``coalesce`` is accepted for call-site compatibility and ignored.
    Never uses ``groupby().map_groups`` — ~1 ms/group is fatal with
    ~one group per row."""
    part_cols = [c for c in sort_keys if c in subset]
    order_cols = [c for c in sort_keys if c not in subset]
    assert part_cols, "subset must share at least one column with sort_keys"
    ds = hash_partition(ds, part_cols, nparts or _join_parts())

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        if order_cols:
            df = df.sort_values(order_cols, kind="stable")
        return df.drop_duplicates(subset=subset, keep="first")

    return ds.map_batches(drop, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def token_counts(sf_dir: str):
    """doc_id, text_len, n_tokens (whitespace), n_bpeish (BPE-ish regex).

    Arrow-native: ``pyarrow.compute`` regex kernels straight over the
    zero-copy read batch — no pandas hop in either direction, and the
    RE2 engine matches the DuckDB oracle's (both RE2; Python ``re``'s
    unicode classes only coincide on ASCII corpora)."""
    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "text_len": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(text, r"\S+"), pa.int64()),
            "n_bpeish": pc.cast(
                pc.count_substring_regex(text, T.BPEISH_RE.pattern),
                pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def char_class_counts(sf_dir: str):
    """doc_id, punct_cnt, digit_cnt — integer counts (exact vs SQL).
    Arrow-native regex count kernels (see token_counts)."""
    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "punct_cnt": pc.cast(
                pc.count_substring_regex(text, T.PUNCT_RE.pattern),
                pa.int64()),
            "digit_cnt": pc.cast(
                pc.count_substring_regex(text, T.DIGIT_RE.pattern),
                pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def doc_quality(sf_dir: str):
    """Full quality features (ratios, mean word length, stopword ratio,
    composite score). Every column is DuckDB-expressible (regex counts,
    list_filter stopword hits, least/greatest clipping) — float columns
    rounded to 6dp on both sides for the exact value-hash."""
    # Task pool (stage_task): the stage's only state is module imports
    # (cached per worker process); the actor pool's startup dominated
    # this ~2 s stage (1.92 -> 1.16 s at sf0.1/32 CPUs together with
    # the vectorized stopword kernel).
    ds = _read(sf_dir, "documents").map_batches(
        stage_task(TextFeatures), batch_format="pandas",
    )

    def round6(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("punct_ratio", "digit_ratio", "stopword_ratio",
                  "mean_word_len", "quality"):
            df[c] = df[c].round(6)
        return df

    return ds.map_batches(round6, batch_format="pandas")


def lang_id_preds(sf_dir: str):
    # Task pool + vectorized stopword vote (see doc_quality note).
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stage_task(LangId), batch_format="pandas"
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
    text. Sort-based first-per-key — sorting on (h, doc_id) makes each
    content hash contiguous with rows in doc_id order; the per-block
    drop on (h, text) keeps the min-doc_id row per exact text (hash
    collisions resolved by the carried text column). No per-group
    map_groups (~1 ms/group is one group per document here)."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "text"]].copy()
        df["h"] = D.content_hash(df["text"])
        return df

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add_key, batch_format="pandas"
    )
    ds = sorted_dedup(ds, ["h", "doc_id"], ["h", "text"])
    return ds.map_batches(
        lambda df: df[["doc_id"]], batch_format="pandas"
    )


def _copartition_attach(pairs, docs, key_col, carry, text_out, nparts,
                        dedup_carry=None):
    """Attach each pair's document text via ONE keyed exchange: tag-union
    the pair rows with the (doc_id, text) rows, hash-partition on the
    shared key, and merge in-block — key-complete blocks make both the
    merge and the optional candidate dedup exact. Replaces a
    ``Dataset.join`` whose per-partition aggregator fleet is pure fixed
    cost at candidate-pair row counts, and folds the band-duplicate
    collapse into the SAME exchange (all (key, *) rows co-locate, so
    dropping duplicates on key+``dedup_carry`` in-block is complete) —
    two exchanges total for dedup + both text sides instead of three.

    ``carry``: [(name, pyarrow type)] pair columns to thread through.
    ``dedup_carry``: carry columns that, with ``key_col``, identify a
    candidate (enables the in-exchange dedup); None disables it."""
    carry_names = [n for n, _ in carry]
    schema = pa.schema(
        [pa.field("__key", pa.int64()), pa.field("__text", pa.string()),
         pa.field("__is_doc", pa.bool_())]
        + [pa.field(n, t) for n, t in carry])

    def tag_pairs(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key_col].cast(pa.int64()),
                "__text": pa.nulls(len(t), pa.string()),
                "__is_doc": pa.array(np.zeros(len(t), dtype=bool))}
        for n, ty in carry:
            cols[n] = t[n].cast(ty)
        return pa.table(cols, schema=schema)

    def tag_docs(t: pa.Table) -> pa.Table:
        cols = {"__key": t["doc_id"].cast(pa.int64()),
                "__text": t["text"].cast(pa.string()),
                "__is_doc": pa.array(np.ones(len(t), dtype=bool))}
        for n, ty in carry:
            cols[n] = pa.nulls(len(t), ty)
        return pa.table(cols, schema=schema)

    tagged = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        docs.map_batches(tag_docs, batch_format="pyarrow"))
    parts = hash_partition(tagged, ["__key"], nparts)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        is_doc = df["__is_doc"].to_numpy(bool)
        p = df[~is_doc]
        d = df[is_doc]
        if dedup_carry is not None and len(p):
            p = p.drop_duplicates(subset=["__key"] + list(dedup_carry))
        m = p.merge(
            d[["__key", "__text"]].rename(columns={"__text": text_out}),
            on="__key", how="inner")
        out = m.rename(columns={"__key": key_col})
        return out[[key_col] + carry_names + [text_out]]

    return parts.map_batches(merge, batch_format="pandas", batch_size=None)


def minhash_lsh_pairs(sf_dir: str, num_perm=128, bands=16, threshold=0.8,
                      num_partitions: int | None = None):
    """MinHash+LSH near-dup, fully partitioned end to end (no driver
    materialization anywhere in the plan):

      1. shingle -> signature -> exploded (doc_id, band, band_key) rows
         (MinHasher task pool; materialized once, reused by both join
         sides so the signatures aren't computed twice);
      2. candidate pairs via a hash-partitioned SELF-JOIN on
         (band, band_key) — buckets are tiny by construction, so the
         per-bucket cross product is bounded;
      3. TWO keyed exchanges finish the query (_copartition_attach):
         the first hash-partitions candidates by doc_id_a together
         with the doc texts — a-complete blocks collapse multi-band
         duplicate candidates AND attach text_a in the same exchange;
         the second does text_b by doc_id_b. No broadcast id->text
         map, no separate dedup shuffle, no join aggregator fleets.

    Returns the verified pair Dataset (doc_id_a < doc_id_b, jaccard
    rounded to 6dp)."""
    par = _par()
    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)
    if num_partitions is None:
        # Size-aware: each hash-join partition pins an aggregator actor
        # whose startup is pure overhead on small inputs; target ~2M
        # banded rows per partition, capped by the CPU count. Row count
        # comes from parquet footers — no extra pass over the corpus.
        rows = _table_rows(sf_dir, "documents") * bands
        num_partitions = max(2, min(_join_parts(None), rows // 2_000_000 + 1))

    banded = docs.map_batches(
        # Task pool: MinHasher's permutation params are seeded (same
        # per worker) and cheap to derive once per process; the actor
        # pool's startup dominated the short sf-bench stage.
        stage_task(MinHasher, num_perm=num_perm, bands=bands),
        batch_format="pyarrow",
    ).materialize()  # small int rows (bands per doc); reused twice below

    left = banded.map_batches(
        _rename_clean({"doc_id": "doc_id_a"}), batch_format="pyarrow"
    )
    right = banded.map_batches(
        _rename_clean({"doc_id": "doc_id_b"}), batch_format="pyarrow"
    )
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions,
        on=("band", "band_key"), right_on=("band", "band_key"),
    )

    def keep_lt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.loc[df["doc_id_a"] < df["doc_id_b"], ["doc_id_a", "doc_id_b"]]
        # Partial dedup: same-block repeats collapse here; cross-block
        # (multi-band) repeats collapse exactly inside the first
        # attach exchange below.
        out = out.drop_duplicates()
        return out.astype({"doc_id_a": "int64", "doc_id_b": "int64"})

    cands = joined.map_batches(keep_lt, batch_format="pandas")
    with_a = _copartition_attach(
        cands, docs, "doc_id_a", carry=[("doc_id_b", pa.int64())],
        text_out="text_a", nparts=num_partitions,
        dedup_carry=["doc_id_b"],
    )
    with_ab = _copartition_attach(
        with_a, docs, "doc_id_b",
        carry=[("doc_id_a", pa.int64()), ("text_a", pa.string())],
        text_out="text_b", nparts=num_partitions,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id_a": pd.Series([], dtype="int64"),
                 "doc_id_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        sims = [
            D.ngram_jaccard(ta, tb)
            for ta, tb in zip(df["text_a"], df["text_b"])
        ]
        out = df[["doc_id_a", "doc_id_b"]].astype("int64").assign(
            jaccard=np.round(sims, 6)
        )
        return out[out["jaccard"] >= threshold]

    return with_ab.map_batches(verify, batch_format="pandas")


def simhashes(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"], split=True).map_batches(
        stage_task(SimHasher), batch_format="pandas"
    )


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array."""
    u = np.ascontiguousarray(v).view(np.uint8).reshape(len(v), 8)
    return np.unpackbits(u, axis=1).sum(axis=1).astype(np.int64)


def hamming_pairs_64(sh, id_col: str, hash_col: str, max_hamming: int,
                     chunks: int, num_partitions: int,
                     id_dtype: str = "int64"):
    """Near-dup pairs over a (id, 64-bit hash) Dataset: chunk-bucket
    LSH with GUARANTEED recall — two 64-bit hashes within Hamming
    distance < ``chunks`` share at least one identical bit-chunk
    (pigeonhole), so the hash-partitioned self-join on
    (chunk, chunk_val) is a COMPLETE candidate generator for
    ``max_hamming < chunks``. Fully partitioned like minhash_lsh_pairs;
    the verify is a vectorized popcount on the pair itself (the hash
    rides along through the join — no second lookup pass). Shared by
    simhash_neardup (documents) and phash_copy_pairs (images).

    Returns (``{id_col}_a``, ``{id_col}_b``, hamming) with a < b."""
    a_col, b_col = f"{id_col}_a", f"{id_col}_b"
    w = 64 // chunks
    mask = np.uint64((1 << w) - 1)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=id_dtype),
                 hash_col: pd.Series([], dtype="int64"),
                 "chunk": pd.Series([], dtype="int32"),
                 "chunk_val": pd.Series([], dtype="int64")}
            )
        v = df[hash_col].to_numpy(np.int64).view(np.uint64)
        vals = np.stack(
            [(v >> np.uint64(i * w)) & mask for i in range(chunks)], axis=1
        )
        return pd.DataFrame(
            {id_col: np.repeat(df[id_col].to_numpy(), chunks),
             hash_col: np.repeat(df[hash_col].to_numpy(np.int64), chunks),
             "chunk": np.tile(np.arange(chunks, dtype=np.int32), n),
             "chunk_val": vals.ravel().view(np.int64)}
        )

    exploded = sh.map_batches(explode, batch_format="pandas")
    left = exploded.map_batches(
        _rename_clean({id_col: a_col, hash_col: "h_a"}), batch_format="pyarrow"
    )
    right = exploded.map_batches(
        _rename_clean({id_col: b_col, hash_col: "h_b"}), batch_format="pyarrow"
    )
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions,
        on=("chunk", "chunk_val"), right_on=("chunk", "chunk_val"),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_schema = {a_col: id_dtype, b_col: id_dtype, "hamming": "int64"}
        df = df.loc[df[a_col] < df[b_col]]
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in out_schema.items()}
            )
        ham = _popcount64(
            df["h_a"].to_numpy(np.int64) ^ df["h_b"].to_numpy(np.int64)
        )
        out = df[[a_col, b_col]].assign(hamming=ham)
        return out[out["hamming"] <= max_hamming].astype(out_schema)

    pairs = joined.map_batches(verify, batch_format="pandas")
    # A pair can match in several chunks: collapse duplicates.
    return sorted_dedup(pairs, [a_col, b_col], [a_col, b_col])


def simhash_neardup(sf_dir: str, max_hamming: int = 3, chunks: int = 4,
                    num_partitions: int | None = None):
    """SimHash near-dup pairs (hamming <= max_hamming) over documents —
    ``hamming_pairs_64`` applied to the SimHasher stage; exactness for
    ``max_hamming < chunks`` pinned by pytest against the all-pairs
    scan."""
    sh = simhashes(sf_dir).materialize()  # (doc_id, simhash), reused twice
    return hamming_pairs_64(
        sh, "doc_id", "simhash", max_hamming, chunks,
        _join_parts(num_partitions or 2),
    )


def phash_copy_pairs(images_dir: str, max_hamming: int = 7, chunks: int = 8,
                     num_partitions: int | None = None):
    """Perceptual-hash copy detection over the crawl's image table: each
    stored row contributes its source phash AND the phash of its
    DECODED payload (``image_id#re``) — for lossy formats (q6) the two
    differ by a few bits, for lossless they are identical — and
    ``hamming_pairs_64`` finds every (original, re-encoded copy) pair.
    This is the image-payload near-dup shape: detecting re-encoded
    copies of the same picture across a corpus by phash proximity, with
    pigeonhole-complete recall for hamming < chunks."""
    import ray.data as rd

    from ..stages.data_stages import PhashVariants

    imgs = _clean(rd.read_parquet(
        images_dir, file_extensions=["parquet"],
        columns=["image_id", "bytes", "fmt", "w", "h", "phash"],
    ))
    variants = imgs.map_batches(
        stage_task(PhashVariants), batch_format="pyarrow", batch_size=128,
    )
    return hamming_pairs_64(
        variants, "img_key", "ph", max_hamming, chunks,
        _join_parts(num_partitions or 2), id_dtype="object",
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.5,
                      chunk_rows: int = 512):
    """EXACT embedding-cosine near-dup pairs (vec_id_a < vec_id_b,
    cosine >= threshold), as a distributed block-pair cross product:

      1. the table is chunked once to parquet (chunk = vec_id mod C,
         C sized so a chunk matrix fits a worker's heap);
      2. one task per chunk PAIR (i <= j) loads exactly two chunks and
         emits its pairs via one matmul — C(C+1)/2 bounded-memory tasks,
         no ``take_all()``, no full-matrix broadcast.

    O(N^2) compute is inherent to the exact threshold join (the oracle
    is exact all-pairs, and the synthetic embeddings have no planted
    near-dups — the >=0.5 hits are borderline random pairs any bucketed
    scheme can split). The subquadratic scale path is
    ``embedding_neardup_ivf``.

    Production near-dup uses ~0.95; the synthetic embeddings are
    near-orthogonal (max off-diagonal cosine ~0.6), so the default here
    is 0.5 to keep the demo output non-degenerate."""
    import shutil
    import tempfile

    from ..sources.storage import shared_scratch_dir
    from ..stages.data_stages import CrossChunkScore

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = _table_rows(sf_dir, "embeddings")  # parquet footers, no pass
    n_chunks = max(1, (n + chunk_rows - 1) // chunk_rows)

    # Chunk store lives on the storage seam: a directory every node can
    # read ($KIT_RAY_SHARED_DIR on a real cluster; /tmp single-node),
    # since CrossChunkScore actors re-open chunks by path off-driver.
    chunk_dir = tempfile.mkdtemp(
        prefix="run_", dir=shared_scratch_dir("neardup_chunks")
    )

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["chunk"] = (df["vec_id"] % n_chunks).astype("int32")
        return df

    try:
        emb.map_batches(add_chunk, batch_format="pandas").write_parquet(
            chunk_dir, partition_cols=["chunk"]
        )

        tasks = rd.from_items(
            [{"ci": i, "cj": j}
             for i in range(n_chunks) for j in range(i, n_chunks)]
        )
        n_tasks = n_chunks * (n_chunks + 1) // 2
        tasks = tasks.repartition(n_tasks)  # one chunk pair per block/task
        # Materialize the (small) pair result so the chunk store can be
        # deleted here instead of leaking one table copy per call.
        # Task pool, MEASURED over the actor-pool alternative: the
        # (1,8) pool cost 2.37 s vs 1.02 s here and 10.3 s vs 3.5 s in
        # ngram_jaccard_pairs at sf0.1/32 CPUs (startup + the 8-actor
        # cap outweigh its cache locality at this scale). The
        # per-worker stage cache still gives LRU(4) chunk hits when a
        # worker draws overlapping pairs; residency after the chunk
        # store's deletion is bounded (≤4 chunks × ≤8 cached stages
        # per worker, FIFO-evicted). At ≫100 chunk counts, re-reads
        # grow O(pairs) and a bounded pool with task-affinity becomes
        # the right form again — revisit with a measurement then.
        return tasks.map_batches(
            stage_task(CrossChunkScore, chunk_dir=chunk_dir,
                       threshold=threshold),
            batch_format="pandas",
            batch_size=1,
        ).materialize()
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3,
                        chunk_rows: int = 512):
    """EXACT n-gram Jaccard near-dup pairs over the documents table
    (doc_id_a < doc_id_b, jaccard >= threshold) — the same distributed
    block-pair cross product as ``embedding_neardup``:

      1. the table is chunked once to parquet (chunk = doc_id mod C, C
         sized so a chunk's shingle sets fit a worker's heap);
      2. one task per chunk PAIR (i <= j) loads exactly two chunks,
         shingles each once (cached per actor), and emits its
         thresholded pairs — C(C+1)/2 bounded-memory tasks, no
         ``take_all()``, no broadcast of the corpus.

    O(N^2) compute is inherent to the exact threshold join; this is the
    exact-oracle baseline whose subquadratic scale path is
    ``minhash_lsh_pairs`` (identical similarity, LSH-bucketed)."""
    import shutil
    import tempfile

    from ..sources.storage import shared_scratch_dir
    from ..stages.data_stages import CrossChunkJaccard

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = _table_rows(sf_dir, "documents")  # parquet footers, no pass
    n_chunks = max(1, (n + chunk_rows - 1) // chunk_rows)

    chunk_dir = tempfile.mkdtemp(
        prefix="run_", dir=shared_scratch_dir("jaccard_chunks")
    )

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["chunk"] = (df["doc_id"] % n_chunks).astype("int32")
        return df

    try:
        docs.map_batches(add_chunk, batch_format="pandas").write_parquet(
            chunk_dir, partition_cols=["chunk"]
        )
        tasks = rd.from_items(
            [{"ci": i, "cj": j}
             for i in range(n_chunks) for j in range(i, n_chunks)]
        )
        n_tasks = n_chunks * (n_chunks + 1) // 2
        tasks = tasks.repartition(n_tasks)  # one chunk pair per block/task
        # Task pool — same measured decision as embedding_neardup's
        # chunk-pair stage (10.3 s actor pool vs 3.5 s tasks here).
        return tasks.map_batches(
            stage_task(CrossChunkJaccard, chunk_dir=chunk_dir,
                       threshold=threshold, k=k),
            batch_format="pandas",
            batch_size=1,
        ).materialize()
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def embedding_neardup_ivf(sf_dir: str, threshold: float = 0.45,
                          n_cells: int = 16, n_assign: int = 4,
                          sample_rows: int = 2000):
    """Bucketed near-dup — the subquadratic scale path: k-means
    centroids fit on a bounded sample, every vector multi-assigned to
    its ``n_assign`` nearest cells inside ``map_batches`` (broadcast
    centroids), pairs generated only within cells, multi-assign
    duplicate pairs collapsed by hash-partitioned dedup. The per-cell group
    count is ``n_cells`` (small), so ``map_groups`` is the right tool
    here — unlike per-document grouping. Approximate by design (a pair
    split across disjoint cell sets is missed); recall on planted
    near-dups is pinned by pytest."""
    from ..functions.ann import kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = emb.take(sample_rows)
    svecs = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sample]
    )
    cents_ref = ray.put(kmeans_fit(svecs, n_cells))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cents_ref)
        v = D.normalize_rows(
            np.stack(df["embedding"].to_numpy()).astype(np.float64)
        )
        top = np.argsort(-(v @ cents.T), axis=1)[:, :n_assign]
        return pd.DataFrame(
            {"cell": top.ravel().astype(np.int32),
             "vec_id": np.repeat(df["vec_id"].to_numpy(np.int64), n_assign),
             "embedding": np.repeat(df["embedding"].to_numpy(), n_assign)}
        )

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        v = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        hits = D.cosine_pairs(ids, v, threshold)
        rows = {"vec_id_a": [], "vec_id_b": [], "cosine": []}
        for a, b, c in hits:
            lo, hi = (a, b) if a < b else (b, a)
            if lo == hi:
                continue
            rows["vec_id_a"].append(lo)
            rows["vec_id_b"].append(hi)
            rows["cosine"].append(round(c, 6))
        return pd.DataFrame(rows).astype(
            {"vec_id_a": "int64", "vec_id_b": "int64", "cosine": "float64"}
        )

    pairs = emb.map_batches(assign, batch_format="pandas").groupby(
        "cell"
    ).map_groups(cell_pairs, batch_format="pandas")
    return sorted_dedup(
        pairs, ["vec_id_a", "vec_id_b"], ["vec_id_a", "vec_id_b"]
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Brute-force cosine top-k for the first ``n_queries`` vectors:
    per-batch partial top-k against broadcast queries, then a tiny
    global merge. Ties broken by neighbor_id asc; score rounded to 6dp
    to make the DuckDB comparison exact."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # True global min-k of vec_id (file row order is NOT assumed sorted).
    qrows = emb.sort("vec_id").take(n_queries)
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    ref = ray.put({"ids": q_ids, "vecs": q_vecs})

    partials = emb.map_batches(
        stage_task(BruteForceTopK, queries_ref=ref, k=k),
        batch_format="pandas",
        batch_size=512,
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
    """IVF top-k, distributed: k-means centroids fit on a bounded SAMPLE
    (driver-side, tiny — the only non-Dataset step), then broadcast;
    cell assignment, probing and scoring all happen inside
    ``map_batches`` (IvfTopK task pool) with a tiny per-query merge —
    the BruteForceTopK shape restricted to probed cells. Same schema as
    ann_topk; recall < 1.0 by design (pinned by pytest)."""
    from ..functions.ann import ivf_probe_cells, kmeans_fit
    from ..stages.data_stages import IvfTopK

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = emb.take(max(2000, n_cells * 50))
    svecs = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sample]
    )
    cents = kmeans_fit(svecs, n_cells)

    qrows = emb.sort("vec_id").take(n_queries)
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_vecs = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in qrows]
    )
    probe = ivf_probe_cells(q_vecs, cents, nprobe)
    ref = ray.put({"ids": q_ids, "vecs": q_vecs, "cents": cents, "probe": probe})

    partials = emb.map_batches(
        stage_task(IvfTopK, ref=ref, k=k),
        batch_format="pandas",
        batch_size=512,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64),
                     score=np.round(g["score"], 6))
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


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
    """Top-N customers by total order value, fully distributed: groupby
    aggregate per customer, then the per-block partial top-N combiner
    (the ``top_revenue_items`` shape — each block emits at most N rows
    before the tiny single-block merge). Only the N-row result and the
    N matching dim rows (predicate-pruned read) ever reach the driver —
    no O(customers) materialization."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent")
    )

    def select_top(df: pd.DataFrame) -> pd.DataFrame:
        # Round before ordering so ties at 2dp rank exactly like the
        # oracle's ORDER BY round(...) DESC, c_custkey.
        df = df.assign(total_spent=df["total_spent"].round(2))
        df = df.sort_values(["total_spent", "o_custkey"],
                            ascending=[False, True], kind="stable")
        return df.head(n)

    top = per_cust.map_batches(
        select_top, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(
        select_top, batch_format="pandas", batch_size=None
    ).to_pandas()  # <= n rows

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"],
        filter=pc.field("c_custkey").isin(top["o_custkey"].tolist()),
    ).to_pandas()  # <= n rows (row groups pruned at the read)
    df = top.merge(cust, left_on="o_custkey", right_on="c_custkey", how="inner")
    df = df.sort_values(["total_spent", "c_custkey"], ascending=[False, True])
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
        orders, join_type="inner", num_partitions=_join_parts(),
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


def part_type_revenue(sf_dir: str):
    """Revenue by part type (TPC-H Q14 flavor): lineitem x part — part
    is the small dimension (SF x 2k rows), so it broadcasts once via
    ``ray.put`` as a partkey->type lookup applied inside ``map_batches``
    (no shuffle join), followed by the partial-agg -> tiny-groupby
    pattern over the 6 p_type groups."""
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    dim_ref = ray.put(pd.Series(
        part["p_type"].to_numpy(), index=part["p_partkey"].to_numpy()
    ))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        g = pd.DataFrame(
            {"p_type": df["l_partkey"].map(d),
             "rev": df["l_extendedprice"] * (1.0 - df["l_discount"])}
        ).groupby("p_type", sort=False)["rev"].agg(["sum", "count"])
        return g.reset_index().rename(
            columns={"sum": "revenue", "count": "n_items"}
        )

    out = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pandas").groupby("p_type").aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"),
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
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


def top_revenue_items(sf_dir: str, n: int = 20):
    """Distributed top-N over a large table WITHOUT a global sort:
    per-block partial top-N inside ``map_batches`` (each block emits at
    most N rows), then a tiny single-block merge re-applies the same
    selection — the classic combiner shape for order-by-limit. Ties
    broken by (l_orderkey, l_linenumber) on both sides."""
    def select_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        df = df.sort_values(["revenue", "l_orderkey", "l_linenumber"],
                            ascending=[False, True, True], kind="stable")
        return df.head(n)

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
        split=True,
    )
    partials = ds.map_batches(select_top, batch_format="pandas",
                              batch_size=None)
    out = partials.repartition(1).map_batches(
        select_top, batch_format="pandas", batch_size=None
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return out[["l_orderkey", "l_linenumber", "revenue"]].reset_index(drop=True)


def unique_users_per_type(sf_dir: str):
    """COUNT(DISTINCT) at scale: per-block pair dedup (combiner) ->
    sort-based global dedup of (event_type, user_id) pairs -> per-block
    partial counts -> tiny groupby. No global set on the driver, no
    per-pair groups."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "user_id"], split=True)
    pre = ds.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas",
        batch_size=None,
    )
    uniq = sorted_dedup(
        pre, ["event_type", "user_id"], ["event_type", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).size().rename("n_users")
        return g.reset_index()

    out = uniq.map_batches(partial, batch_format="pandas").groupby(
        "event_type"
    ).aggregate(Sum("n_users", alias_name="n_users")).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out


def first_event_per_user(sf_dir: str):
    """Argmin-per-key (each user's earliest event) via the
    hash-partitioned first-per-key machinery — no per-user map_groups.
    event_id breaks exact-timestamp ties deterministically on both
    sides."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"], split=True)
    first = sorted_dedup(ds, ["user_id", "ts", "event_id"], ["user_id"])
    return first.map_batches(
        lambda df: df[["user_id", "ts", "event_id", "event_type"]].astype(
            {"user_id": "int64", "event_id": "int64"}
        ),
        batch_format="pandas",
    )


def events_sliding(sf_dir: str, size_minutes: int = 60, step_minutes: int = 30):
    """Hopping (sliding) window aggregate: size-minute windows every
    step minutes, so each event belongs to size/step windows — exploded
    vectorized inside ``map_batches`` (the combiner shape: per-batch
    partial aggregates over the exploded rows), then a small groupby.
    Window [w, w+size) contains t iff w in {floor_step(t) - i*step}."""
    from ray.data.aggregate import Sum

    k = size_minutes // step_minutes
    step = pd.Timedelta(minutes=step_minutes)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor(f"{step_minutes}min")
        frames = [
            pd.DataFrame(
                {"event_type": df["event_type"],
                 "win_start": base - i * step,
                 "value": df["value"]}
            )
            for i in range(k)
        ]
        e = pd.concat(frames, ignore_index=True)
        g = e.groupby(["event_type", "win_start"], sort=False)["value"].agg(
            ["count", "sum"]
        ).reset_index()
        return g.rename(columns={"count": "n", "sum": "sum_value"})

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"], split=True)
    out = ds.map_batches(partial, batch_format="pandas").groupby(
        ["event_type", "win_start"]
    ).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(3)
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
    gap. Sort-based (no per-user map_groups — ~1 ms/group is fatal at
    10^7 users): global sort on (user_id, ts) makes each user's events
    contiguous and ordered; each block folds to one partial per user
    (count, session count, first/last ts); order-preserving coalesce
    rounds merge adjacent partials — two partials of one user merge by
    summing counts and subtracting one session when the boundary gap is
    within the threshold (associative for time-ordered partials)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # Rows arrive sorted by (user_id, ts); a session break is a
        # > gap jump within the same user.
        brk = (df["ts"].diff() > gap) & (df["user_id"] == df["user_id"].shift())
        g = df.assign(brk=brk).groupby("user_id", sort=False)
        out = g.agg(n_events=("ts", "size"), n_brk=("brk", "sum"),
                    first_ts=("ts", "min"), last_ts=("ts", "max")).reset_index()
        out["n_sessions"] = out.pop("n_brk").astype("int64") + 1
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "first_ts"], kind="stable")
        prev_last = df.groupby("user_id", sort=False)["last_ts"].shift()
        merged = ((df["first_ts"] - prev_last) <= gap).fillna(False)
        df = df.assign(merged=merged)
        g = df.groupby("user_id", sort=False)
        out = g.agg(n_events=("n_events", "sum"),
                    n_sessions=("n_sessions", "sum"),
                    n_merged=("merged", "sum"),
                    first_ts=("first_ts", "min"),
                    last_ts=("last_ts", "max")).reset_index()
        out["n_sessions"] = (out["n_sessions"] - out.pop("n_merged")).astype(
            "int64"
        )
        return out

    ds = _read(sf_dir, "events", ["user_id", "ts"]).sort(["user_id", "ts"])
    ds = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    for n in (4, 1):  # cluster scale: multi-level, ending at 1 block
        # per user-range (e.g. (64, 8, 1)) — the last round must hold
        # each user's partials in one block, like sorted_dedup.
        ds = ds.repartition(n).map_batches(
            combine, batch_format="pandas", batch_size=None
        )
    return ds.map_batches(
        lambda df: df[["user_id", "n_events", "n_sessions"]].astype(
            {"user_id": "int64", "n_events": "int64", "n_sessions": "int64"}
        ),
        batch_format="pandas",
    )


def hash_partition(ds, keys, nparts: int):
    """Key-complete blocks via Ray's keyed hash repartition — the
    generic form of crawl.hash_partition_by_host: flip the dataset
    snapshot's shuffle strategy to HASH_SHUFFLE around the one op (a
    Dataset snapshots its DataContext at creation) and zero out the
    per-partition aggregator CPU reservation (the aggregators only
    route/buffer; any reservation stacks on actor-pool minimums and
    can starve the stage's tasks at small CPU counts). After this,
    every row with the same ``keys`` value lives in exactly one block,
    so per-key logic (as-of merge, running windows, final per-key
    sums) is exact in-block with no further shuffle."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    prev_strategy = ctx.shuffle_strategy
    prev_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0
    try:
        out = ds.repartition(nparts, keys=list(keys)).materialize()
        # Split-block guard: every in-block per-key op downstream
        # (dedup, as-of merge, windows, schedule) is exact ONLY if a
        # partition is one block. Ray 2.49 has not been observed to
        # split hash-shuffle output blocks (even under a 1 MB block-
        # size cap), but a partition larger than the block-size target
        # COULD split; retry with more, smaller partitions (the
        # already-shuffled output re-partitions cheaply) rather than
        # silently returning blocks that break key-completeness.
        for _ in range(3):  # pragma: no branch
            if out.num_blocks() <= nparts:
                return out
            nparts *= 2  # pragma: no cover - split never observed
            out = out.repartition(nparts, keys=list(keys)).materialize()
        if out.num_blocks() > nparts:  # pragma: no cover
            raise RuntimeError(
                "hash_partition: partitions still split after retries; "
                "refusing to return non-key-complete blocks")
        return out  # pragma: no cover
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = prev_cpus


def asof_purchase_attribution(sf_dir: str):
    """As-of join (an operator Ray Data lacks natively): each purchase
    event is attributed to the same user's most recent view event at or
    before the purchase timestamp (inner as-of, backward direction —
    the DuckDB ``ASOF JOIN`` semantics exactly).

    Scale shape: ONE keyed hash repartition on ``user_id`` makes every
    block user-complete; the merge itself is then an in-block
    vectorized ``pd.merge_asof`` (sorted on ts, grouped by user) with
    no cross-block state. At 10^10 events this is a single all-to-all
    keyed by user — the minimum any exact as-of join pays — and the
    per-block work is O(n log n) in the block, memory-bounded by the
    partition count."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"], split=True)
    ev = ev.filter(
        expr="event_type == 'purchase' or event_type == 'view'"
    )
    ev = hash_partition(ev, ["user_id"], _join_parts())

    out_cols = {"purchase_id": "int64", "user_id": "int64",
                "purchase_ts": "datetime64[us]", "view_id": "int64",
                "lag_s": "float64"}

    def block(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        v = df[df["event_type"] == "view"]
        if p.empty or v.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()}
            )
        p = p.sort_values("ts", kind="stable")[
            ["event_id", "user_id", "ts"]]
        # Tie-break pin: merge_asof(backward) takes the LAST matching
        # view row, so sorting views by (ts, event_id) makes the
        # max-event_id view win when several share the as-of
        # timestamp — deterministic across shuffle orders and matched
        # by the oracle's ORDER BY v.ts DESC, v.event_id DESC rn=1.
        v = v.sort_values(["ts", "event_id"], kind="stable")[
            ["event_id", "user_id", "ts"]].assign(view_ts=lambda d: d["ts"])
        m = pd.merge_asof(p, v, on="ts", by="user_id",
                          direction="backward", suffixes=("", "_v"))
        m = m.dropna(subset=["event_id_v"])
        # Integer-microsecond half-away rounding (see user_event_gaps).
        us = (m["ts"].to_numpy("datetime64[us]")
              - m["view_ts"].to_numpy("datetime64[us]")).astype("int64")
        return pd.DataFrame({
            "purchase_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "purchase_ts": m["ts"],
            "view_id": m["event_id_v"].astype("int64"),
            "lag_s": ((us + 500) // 1000) / 1000.0,
        })

    return ev.map_batches(block, batch_format="pandas", batch_size=None)


def user_running_value(sf_dir: str):
    """Windowed aggregate: per-user running (cumulative) sum of
    ``value`` in (ts, event_id) order — SQL's
    ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)``.

    Same scale shape as the as-of join: one keyed hash repartition on
    ``user_id`` -> user-complete blocks -> in-block vectorized sort +
    grouped ``cumsum``. Output is one row per input event (10^10-row
    output at the design point), streamed block-by-block — nothing
    materializes beyond the keyed shuffle itself."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"],
               split=True)
    ev = hash_partition(ev, ["user_id"], _join_parts())

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cum = df.groupby("user_id", sort=False)["value"].cumsum()
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "cum_value": cum.round(6),
        })

    return ev.map_batches(block, batch_format="pandas", batch_size=None)


def q3_top_unshipped(sf_dir: str, segment: str = "BUILDING",
                     cutoff: str = "1998-01-01", n: int = 10):
    """TPC-H Q3 shape: the classic 3-table analytical join
    (customer ⋈ orders ⋈ lineitem) with per-order revenue and top-N.

    Scale shape: two distributed hash joins (customer⋈orders on
    custkey, then ⋈lineitem on orderkey — both large-x-large at the
    design point, so no broadcast), per-block partial revenue sums,
    then ONE keyed hash repartition of the small per-(order, block)
    partial table so each block holds a disjoint set of complete
    orderkeys -> in-block final sums + per-block top-N -> tiny
    (N x nparts)-row merge. The full join output is never re-shuffled;
    only the partial-sum table (|qualifying orders| rows) moves."""
    cut = pa.scalar(pd.Timestamp(cutoff).to_pydatetime())
    # Row filters passed to the parquet read prune whole row groups
    # before their bytes leave storage (statistics-based), not after.
    cust = _clean(rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == segment,
    ))
    orders = _clean(rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cut,
    ))
    li = _clean(rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cut,
    ))
    parts = _join_parts()
    qualified = orders.join(
        cust, join_type="inner", num_partitions=parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = li.join(
        qualified, join_type="inner", num_partitions=parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        g = df.groupby(["l_orderkey", "o_orderdate"], sort=False)["rev"].sum()
        return g.rename("revenue").reset_index()

    part_sums = joined.map_batches(partial, batch_format="pandas")
    part_sums = hash_partition(part_sums, ["l_orderkey"], parts)

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "o_orderdate"], sort=False)[
            "revenue"].sum().reset_index()
        g = g.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True], kind="stable")
        return g.head(n)

    out = part_sums.map_batches(
        block_top, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(
        block_top, batch_format="pandas", batch_size=None
    ).to_pandas()  # <= n rows
    out["revenue"] = out["revenue"].round(2)
    return out.reset_index(drop=True)


def top_spenders_per_type(sf_dir: str, k: int = 3):
    """Ranked window over a grouped aggregate: for each event_type the
    top-k users by total ``value``, with their rank — SQL's
    ``row_number() OVER (PARTITION BY event_type ORDER BY total DESC)``.

    Scale shape: per-block partial (event_type, user_id) sums shrink
    the 10^10-row event log to ~|users x types| partial rows BEFORE
    anything moves; one keyed hash repartition of the partials on the
    pair key gives exact totals in-block; a second tiny repartition on
    event_type alone (key cardinality = #types) co-locates each type's
    totals for the in-block sort + head(k). Only aggregate rows ever
    shuffle."""

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"],
               split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "user_id"], sort=False)["value"].sum()
        return g.rename("total_value").reset_index()

    partials = ev.map_batches(partial, batch_format="pandas")
    partials = hash_partition(
        partials, ["event_type", "user_id"], _join_parts())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "user_id"], sort=False)[
            "total_value"].sum().reset_index()
        return g

    totals = partials.map_batches(
        finalize, batch_format="pandas", batch_size=None)
    # #event_type values is tiny; each block holds complete types.
    totals = hash_partition(totals, ["event_type"], 4)

    def rank_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "event_type": pd.Series(dtype="object"),
                "user_id": pd.Series(dtype="int64"),
                "total_value": pd.Series(dtype="float64"),
                "rnk": pd.Series(dtype="int64"),
            })
        df = df.sort_values(
            ["event_type", "total_value", "user_id"],
            ascending=[True, False, True], kind="stable")
        df["rnk"] = df.groupby("event_type", sort=False).cumcount() + 1
        df = df[df["rnk"] <= k]
        df["total_value"] = df["total_value"].round(6)
        return df.reset_index(drop=True)

    return totals.map_batches(
        rank_block, batch_format="pandas", batch_size=None)


def user_event_gaps(sf_dir: str):
    """Lead/lag window: for every event (except each user's first),
    the previous event id of the same user and the gap in seconds —
    SQL's ``lag(...) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` with the first-row NULLs dropped.

    Scale shape: one keyed hash repartition on ``user_id`` -> in-block
    sort + vectorized shift per user. Output is one row per event,
    streamed block-by-block."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"],
               split=True)
    ev = hash_partition(ev, ["user_id"], _join_parts())

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)
        prev_id = g["event_id"].shift(1)
        prev_ts = g["ts"].shift(1)
        keep = (prev_id.notna()).to_numpy()
        # Integer-microsecond half-away rounding: float64
        # total_seconds().round(3) double-rounds (binary seconds, then
        # numpy half-even), which can disagree with an exact decimal
        # round by 1 ulp of a millisecond. Deltas are non-negative
        # (sorted by ts), so (us + 500) // 1000 is exact half-away.
        us = (df["ts"].to_numpy("datetime64[us]")
              - prev_ts.to_numpy("datetime64[us]")).astype("int64")
        gap = ((us[keep] + 500) // 1000) / 1000.0
        return pd.DataFrame({
            "event_id": df.loc[keep, "event_id"].astype("int64"),
            "user_id": df.loc[keep, "user_id"].astype("int64"),
            "prev_event_id": prev_id[keep].astype("int64"),
            "gap_s": gap,
        })

    return ev.map_batches(block, batch_format="pandas", batch_size=None)


def customers_without_urgent_orders(sf_dir: str,
                                    priority: str = "1-URGENT"):
    """Anti-join: customers that never placed an order of the given
    priority (``NOT EXISTS`` with a pushed-down predicate).

    Scale shape: the orders side is row-filtered at the parquet read
    (row-group pruning) and collapses to per-block DISTINCT custkeys
    before moving (partial dedup — at the design point this is the
    classic bitmap/semi-join reduction); both sides then share ONE
    keyed hash repartition via a tagged union, so each block holds a
    disjoint, complete set of custkeys and the anti-join is an
    in-block isin(). No broadcast (both sides are large at scale), one
    all-to-all over keys + names only."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"], split=True)
    orders = _clean(rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == priority,
    ))

    def tag_cust(t: pa.Table) -> pa.Table:
        out = pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"],
            "side": pa.array(["c"] * len(t), type=pa.string()),
        })
        return out

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = pc.unique(t["o_custkey"].combine_chunks())
        return pa.table({
            "c_custkey": keys,
            "c_name": pa.array([None] * len(keys), type=pa.string()),
            "side": pa.array(["o"] * len(keys), type=pa.string()),
        })

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow"))
    both = hash_partition(both, ["c_custkey"], _join_parts())

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        have = set(df.loc[df["side"] == "o", "c_custkey"])
        out = df[(df["side"] == "c") & ~df["c_custkey"].isin(have)]
        return out[["c_custkey", "c_name"]].reset_index(drop=True)

    return both.map_batches(anti, batch_format="pandas", batch_size=None)


def value_quartiles_by_type(sf_dir: str):
    """Exact per-group quantiles: 25th/50th/75th percentile of
    ``value`` per event_type (linear interpolation — matches SQL
    ``percentile_cont``).

    Scale shape: one keyed hash repartition on event_type co-locates
    each group, then numpy computes the three quantiles in-block.
    Exactness requires each group's values in one place — valid while
    per-key volume fits a worker (true for low-cardinality type keys);
    a high-cardinality/heavy-key variant would swap in a t-digest
    sketch combiner at the cost of exactness."""
    ev = _read(sf_dir, "events", ["event_type", "value"], split=True)
    ev = hash_partition(ev, ["event_type"], 4)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            q1, med, q3 = np.percentile(
                grp["value"].to_numpy(), [25, 50, 75])
            rows.append((et, round(q1, 6), round(med, 6), round(q3, 6)))
        return pd.DataFrame(
            rows, columns=["event_type", "q1", "median", "q3"])

    return ev.map_batches(block, batch_format="pandas", batch_size=None)


def purchase_context_events(sf_dir: str, window_s: int = 3600):
    """Bounded interval (range) join: for every purchase, all events of
    the same user in the ``window_s`` seconds strictly before it — SQL
    ``e.ts >= p.ts - INTERVAL .. AND e.ts < p.ts`` with equality on
    ``user_id``.

    Scale shape: one keyed hash repartition on ``user_id`` co-locates
    each user's events, then the in-block expansion is fully
    vectorized: per-user timestamp streams are packed onto one int64
    axis (user index x padded span, so one ``searchsorted`` serves
    every user at once) and the irregular [lo, hi) ranges are
    flattened with the standard multi-arange construction — no Python
    loop over purchases or users. Output size is bounded by
    sum-of-window-occupancy, streamed block-by-block."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"],
               split=True)
    ev = hash_partition(ev, ["user_id"], _join_parts())

    out_cols = {"purchase_id": "int64", "user_id": "int64",
                "ctx_event_id": "int64", "ctx_type": "object",
                "lead_s": "float64"}

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or not (df["event_type"] == "purchase").any():
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = df["ts"].to_numpy("datetime64[us]").view("int64")
        uidx = pd.factorize(df["user_id"].to_numpy())[0]
        w = np.int64(window_s) * 1_000_000
        # Pack all users on one axis so ONE searchsorted serves every
        # user. Shifting each user's timestamps to its own origin
        # (the user's first ts) keeps per-user values in [0, span_u],
        # so the stride only needs the max per-user span + window —
        # not the block's full time range — keeping n_users * stride
        # far from int64 even at ~10^6 users x year-scale spans.
        # uidx is sorted (block sorted by user): the first row of each
        # run is the user's min ts.
        run_start = np.flatnonzero(np.r_[True, uidx[1:] != uidx[:-1]])
        user_first = ts[run_start]
        rel = ts - user_first[uidx]
        span = np.int64(rel.max()) if len(rel) else np.int64(0)
        stride = span + 2 * w + 2
        n_users = np.int64(uidx.max()) + 1 if len(uidx) else np.int64(1)
        is_p = (df["event_type"] == "purchase").to_numpy()
        if int(n_users) * int(stride) < 2 ** 62:
            axis = uidx * stride + rel
            p_axis = axis[is_p]
            lo = np.searchsorted(axis, p_axis - w, side="left")
            hi = np.searchsorted(axis, p_axis, side="left")  # strict <
        else:
            # Overflow guard: the packed axis would exceed int64
            # (pathological span x user count). Fall back to
            # per-user-run searchsorted — still vectorized within
            # each run, one Python iteration per distinct user.
            run_end = np.r_[run_start[1:], len(ts)]
            lo_l, hi_l = [], []
            for s, e in zip(run_start, run_end):
                seg = ts[s:e]
                pm = is_p[s:e]
                if not pm.any():
                    continue
                pt = seg[pm]
                lo_l.append(s + np.searchsorted(seg, pt - w, side="left"))
                hi_l.append(s + np.searchsorted(seg, pt, side="left"))
            lo = (np.concatenate(lo_l) if lo_l
                  else np.empty(0, dtype=np.int64))
            hi = (np.concatenate(hi_l) if hi_l
                  else np.empty(0, dtype=np.int64))
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in out_cols.items()})
        # multi-arange: ctx[i] spans lo[j]..hi[j] for each purchase j
        shift = np.repeat(np.cumsum(cnt) - cnt - lo, cnt)
        ctx = np.arange(total, dtype=np.int64) - shift
        pj = np.repeat(np.arange(len(p_axis)), cnt)
        eid = df["event_id"].to_numpy()
        p_eid = eid[is_p]
        p_ts = ts[is_p]
        return pd.DataFrame({
            "purchase_id": p_eid[pj],
            "user_id": df["user_id"].to_numpy()[is_p][pj],
            "ctx_event_id": eid[ctx],
            "ctx_type": df["event_type"].to_numpy()[ctx],
            # Integer-us half-away rounding (see user_event_gaps);
            # p_ts >= ts[ctx] by construction so + 500 // is exact.
            "lead_s": ((p_ts[pj] - ts[ctx] + 500) // 1000) / 1000.0,
        })

    return ev.map_batches(block, batch_format="pandas", batch_size=None)


def price_qty_corr_by_flag(sf_dir: str):
    """Pearson correlation of (l_quantity, l_extendedprice) per
    l_returnflag via an ALGEBRAIC combiner: each block reduces to
    (n, sx, sy, sxx, syy, sxy) per flag — six numbers — so the
    10^10-row table collapses before anything moves; the tiny partial
    table coalesces to one block for the closed-form merge. Sums use
    extended precision (longdouble) so the raw-moment formula stays
    well inside the 1e-6 comparison tolerance."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"], split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=False):
            x = g["l_quantity"].to_numpy(np.longdouble)
            y = g["l_extendedprice"].to_numpy(np.longdouble)
            rows.append((flag, len(x), float(x.sum()), float(y.sum()),
                         float((x * x).sum()), float((y * y).sum()),
                         float((x * y).sum())))
        return pd.DataFrame(
            rows, columns=["l_returnflag", "n", "sx", "sy",
                           "sxx", "syy", "sxy"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        n = g["n"].to_numpy(np.longdouble)
        sx, sy = g["sx"].to_numpy(np.longdouble), g["sy"].to_numpy(np.longdouble)
        sxx, syy = g["sxx"].to_numpy(np.longdouble), g["syy"].to_numpy(np.longdouble)
        sxy = g["sxy"].to_numpy(np.longdouble)
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = (num / den).astype(np.float64)
        return pd.DataFrame({
            "l_returnflag": g["l_returnflag"],
            "corr_qty_price": np.round(corr, 6),
        })

    return li.map_batches(
        partial, batch_format="pandas"
    ).repartition(1).map_batches(merge, batch_format="pandas",
                                 batch_size=None)


def jaccard_dup_clusters(sf_dir: str, threshold: float = 0.8):
    """Connected components over the exact n-gram Jaccard near-dup
    graph: every document that appears in a >=threshold pair, labeled
    with its component's minimum doc_id (the canonical "keep one copy
    per duplicate cluster" reduction that follows any pair-generating
    dedup).

    Distributed min-label propagation on the edge list (the map-reduce
    CC shape): labels start as node ids; each round hash-joins labels
    to edge sources, propagates them to destinations, and takes the
    per-node min under ONE keyed hash repartition; a per-round changed
    counter (computed in the same reduce, no extra pass) stops at the
    fixpoint, reached in O(component diameter) rounds. Every round
    moves only |edges| + |nodes| rows — independent of corpus size —
    which is the point: near-dup graphs are sparse even at 10^10
    documents."""
    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": df["doc_id_a"], "dst": df["doc_id_b"]})
        rev = pd.DataFrame({"src": df["doc_id_b"], "dst": df["doc_id_a"]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.map_batches(
        to_edges, batch_format="pandas"
    ).map_batches(_rename_clean({}), batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "cluster_id": pd.Series(dtype="int64"),
        })

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["src"].unique()
        return pd.DataFrame({
            "node": nodes.astype("int64"),
            "label": nodes.astype("int64"),
            "is_old": np.ones(len(nodes), dtype="int64"),
        })

    # src-keyed blocks => per-block unique() dedups nodes completely.
    labels = hash_partition(edges, ["src"], _join_parts(4)).map_batches(
        init_labels, batch_format="pandas", batch_size=None).materialize()

    nparts = _join_parts(4)
    for _round in range(64):
        lab = labels.map_batches(
            _rename_clean({"node": "src", "label": "label"}),
            batch_format="pyarrow",
        ).drop_columns(["is_old"])
        prop = edges.join(
            lab, join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("src",),
        ).map_batches(
            lambda df: pd.DataFrame({
                "node": df["dst"].astype("int64"),
                "label": df["label"].astype("int64"),
                "is_old": np.zeros(len(df), dtype="int64"),
            }),
            batch_format="pandas",
        )
        cand = labels.union(prop)
        cand = hash_partition(cand, ["node"], nparts)

        def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False)
            new = g["label"].min()
            old = df[df["is_old"] == 1].set_index("node")["label"]
            old = old.reindex(new.index)
            changed = (new != old).astype("int64")
            out = new.reset_index()
            out["is_old"] = 1
            out["changed"] = changed.to_numpy()
            return out

        labels = cand.map_batches(
            reduce_min, batch_format="pandas", batch_size=None).materialize()
        if labels.sum("changed") == 0:
            break
        labels = labels.drop_columns(["changed"])
    else:
        # Exhausted the round budget without reaching the fixpoint: a
        # component with diameter > 64 would silently get wrong labels.
        # Fail loudly — the caller can raise the budget (or switch the
        # propagation to pointer-doubling) rather than trust bad output.
        raise RuntimeError(
            "jaccard_dup_clusters: min-label propagation did not "
            "converge within 64 rounds (component diameter too large)")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["node"].astype("int64"),
            "cluster_id": df["label"].astype("int64"),
        })

    return labels.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Sketches + deterministic sampling (the 100-TB scale paths of the
# exact quantile / distinct-count / sampling ops above)
# ---------------------------------------------------------------------------

def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      max_centroids: int):
    """Equal-weight re-compression of a sorted centroid list — the
    mergeable core of a simplified t-digest (Dunning & Ertl's digest
    with a uniform size bound instead of the q-scaled one; error is
    O(1/max_centroids) at every quantile rather than tighter at the
    tails, which is enough for pipeline stats)."""
    if len(means) <= max_centroids:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights)
    total = cum[-1]
    # target bucket per centroid: equal cumulative weight
    bucket = np.minimum(
        (cum - weights / 2) / total * max_centroids, max_centroids - 1e-9
    ).astype(np.int64)
    out_w = np.bincount(bucket, weights=weights, minlength=max_centroids)
    out_m = np.bincount(bucket, weights=weights * means,
                        minlength=max_centroids)
    keep = out_w > 0
    return out_m[keep] / out_w[keep], out_w[keep]


def _tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                      qs: list[float]) -> list[float]:
    """Quantile estimate by linear interpolation over centroid
    midpoints (standard t-digest query)."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights) - weights / 2
    total = weights.sum()
    return [float(np.interp(q * total, cum, means)) for q in qs]


def approx_quantiles_by_type(sf_dir: str, max_centroids: int = 256):
    """Approximate per-group quantiles via a MERGEABLE centroid sketch
    — the scale path of ``value_quartiles_by_type``: where the exact op
    needs each group's full value set in one block (only viable for
    low-cardinality keys), this one reduces every block to <=K
    (mean, weight) centroids per group, so a 10^10-row group costs
    K numbers per block on the wire and the merge is associative.
    Accuracy is pinned by pytest against the exact quantiles
    (O(1/K) bound, K=256 -> well under 1% of the value range)."""
    ev = _read(sf_dir, "events", ["event_type", "value"], split=True)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            m, w = _tdigest_compress(v, np.ones_like(v), max_centroids)
            rows.append((et, m.tolist(), w.tolist()))
        return pd.DataFrame(rows, columns=["event_type", "means", "weights"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            m = np.concatenate([np.asarray(x) for x in g["means"]])
            w = np.concatenate([np.asarray(x) for x in g["weights"]])
            m, w = _tdigest_compress(m, w, max_centroids)
            q1, med, q3 = _tdigest_quantile(m, w, [0.25, 0.5, 0.75])
            rows.append((et, round(q1, 6), round(med, 6), round(q3, 6)))
        return pd.DataFrame(
            rows, columns=["event_type", "q1", "median", "q3"])

    partials = ev.map_batches(sketch, batch_format="pandas")
    # Keyed shuffle of the per-(block, group) sketches: each group's
    # centroids land in one block, so the merge is in-block and the
    # op never funnels through a single block — at 10^6 groups the
    # repartition(1) alternative would collect blocks x groups sketch
    # rows in one place.
    return hash_partition(
        partials, ["event_type"], nparts=min(_par(), 8)
    ).map_batches(merge, batch_format="pandas", batch_size=None)


_HLL_P = 12  # 4096 registers; standard error 1.04/sqrt(4096) ~ 1.6%


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a well-mixed vectorized 64-bit hash."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _hll_registers(ids: np.ndarray) -> np.ndarray:
    """Per-value HLL register updates: returns the max rho per register
    for this batch (a 2^p uint8 array — the mergeable sketch)."""
    h = _splitmix64(ids)
    reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rho = leading zeros of rest + 1, via bit_length
    lz = np.uint64(64) - np.uint64(_HLL_P) \
        - _bit_length_u64(rest >> np.uint64(_HLL_P)) + np.uint64(1)
    sk = np.zeros(1 << _HLL_P, dtype=np.uint8)
    np.maximum.at(sk, reg, lz.astype(np.uint8))
    return sk


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (log2 floor + 1; 0 -> 0)."""
    out = np.zeros_like(x, dtype=np.uint64)
    nz = x > 0
    # float64 log2 is exact enough for bit_length up to 2^52; the HLL
    # rest-bits value fits in 52 bits (64 - p - 1 guard below).
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(
        np.uint64) + np.uint64(1)
    return out


def _hll_estimate(sk: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction (Flajolet et al. 2007)."""
    m = float(len(sk))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -sk.astype(np.float64)))
    zeros = float(np.count_nonzero(sk == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_users_per_type(sf_dir: str):
    """Approximate distinct-count per group via HyperLogLog — the scale
    path of ``unique_users_per_type``: the exact op's pair-dedup
    combiner still moves one row per DISTINCT (type, user) pair, which
    at 10^9 users is itself a heavy shuffle; the HLL sketch is a fixed
    4 KiB per (block, group) regardless of cardinality, merged by
    elementwise max. ~1.6% standard error (p=12), pinned by pytest
    against the exact counts."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"], split=True)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            sk = _hll_registers(g["user_id"].to_numpy(np.int64))
            rows.append((et, sk.tobytes()))
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            sk = np.zeros(1 << _HLL_P, dtype=np.uint8)
            for b in g["sketch"]:
                np.maximum(sk, np.frombuffer(b, dtype=np.uint8), out=sk)
            rows.append((et, int(round(_hll_estimate(sk)))))
        return pd.DataFrame(rows, columns=["event_type", "approx_users"])

    partials = ev.map_batches(sketch, batch_format="pandas")
    # Keyed shuffle, same rationale as approx_quantiles_by_type: the
    # 4 KiB-per-(block, group) sketches merge in-block per group — no
    # single-block funnel at high group cardinality.
    return hash_partition(
        partials, ["event_type"], nparts=min(_par(), 8)
    ).map_batches(merge, batch_format="pandas", batch_size=None)


_SPLIT_MULT = 2654435761  # Knuth multiplicative constant


def train_test_split_docs(sf_dir: str, train_pct: int = 80):
    """Deterministic train/test split tag per document — the standard
    reproducible-split op of a training-data pipeline. The tag derives
    from integer arithmetic on doc_id (Knuth multiplicative hash mod
    2^32), so it is stable across runs, machines, and engines — the
    SQL oracle computes the identical expression. Embarrassingly
    parallel: no shuffle at all, one vectorized map over blocks."""
    docs = _read(sf_dir, "documents", ["doc_id"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy(np.uint64)
             * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "split": np.where((h % 100) < train_pct, "train", "test"),
        })

    return docs.map_batches(tag, batch_format="pandas")


def sample_events_per_type(sf_dir: str, n: int = 5):
    """Deterministic per-group sampling: the n events of each
    event_type with the smallest hashed ids — a reproducible uniform
    group sample (hash order is pseudorandom in event_id but identical
    in any engine).

    Scale shape: per-block partial top-n-by-hash per group (the
    top_revenue_items combiner), so each block contributes at most
    n x |types| rows; the partials then merge under a GROUP-KEYED
    hash shuffle (each group's candidates land in one block for the
    final in-block top-n) — no single-block funnel at high group
    cardinality, no full shuffle or sort of the corpus."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "user_id"],
               split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["event_id"].to_numpy(np.uint64)
             * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
        df = df.assign(h=h.astype("int64"))
        df = df.sort_values(["event_type", "h", "event_id"], kind="stable")
        return df.groupby("event_type", sort=False).head(n)

    partials = ev.map_batches(partial, batch_format="pandas")
    return hash_partition(
        partials, ["event_type"], nparts=min(_par(), 8)
    ).map_batches(
        partial, batch_format="pandas", batch_size=None
    ).drop_columns(["h"])


# ---------------------------------------------------------------------------
# Term statistics (inverted-index building blocks: TF top-k, DF/IDF)
# ---------------------------------------------------------------------------

_TERM_SPLIT_RE = "[^a-z0-9]+"


def _explode_terms(df: pd.DataFrame, unique_per_doc: bool = False
                   ) -> pd.DataFrame:
    """(doc_id, term) rows from lowercased text split on runs of
    non-[a-z0-9] — the engine-independent tokenizer (identical to
    DuckDB's string_split_regex on the same pattern, verified exact on
    the test corpus). Vectorized: one str.split + explode per block."""
    s = df["text"].str.lower().str.split(_TERM_SPLIT_RE, regex=True)
    out = df[["doc_id"]].assign(term=s).explode("term")
    out = out[out["term"].notna() & (out["term"] != "")]
    if unique_per_doc:
        out = out.drop_duplicates()
    return out


def top_terms(sf_dir: str, n: int = 30):
    """Global top-N term frequency — corpus vocabulary head. Scale
    shape: per-block partial term counts (each block reduces to its
    own vocabulary, the classic word-count combiner), ONE keyed hash
    shuffle of those partials for exact per-term totals, in-block
    top-N, tiny single-block merge. The corpus itself never shuffles;
    only per-block vocabularies move. Ties broken (count DESC, term
    ASC) identically in the SQL oracle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _explode_terms(df)
        return (t.groupby("term", sort=False).size()
                .rename("cnt").reset_index())

    def top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(["cnt", "term"], ascending=[False, True],
                          kind="stable")
        return g.head(n)

    partials = docs.map_batches(partial, batch_format="pandas",
                                batch_size=None)
    exact = hash_partition(partials, ["term"], nparts=min(_par(), 8))
    out = exact.map_batches(top, batch_format="pandas", batch_size=None
                            ).repartition(1).map_batches(
        top, batch_format="pandas", batch_size=None)
    return out.map_batches(
        lambda df: df.assign(cnt=df["cnt"].astype("int64")),
        batch_format="pandas")


def term_doc_freq(sf_dir: str, min_df: int = 2):
    """Document frequency + IDF per term (the DF half of an inverted
    index / TF-IDF pipeline). Exactness without a distinct-pair
    shuffle: a document's text lives in ONE row, so per-doc term
    dedup inside the block is globally exact — each block emits exact
    partial DF counts for its own docs, and one keyed hash shuffle
    sums them. N_docs comes from parquet footers (no counting pass);
    min_df bounds the output tail at scale."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)
    n_docs = _table_rows(sf_dir, "documents")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _explode_terms(df, unique_per_doc=True)
        return (t.groupby("term", sort=False).size()
                .rename("df_cnt").reset_index())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=False)["df_cnt"].sum().reset_index()
        g = g[g["df_cnt"] >= min_df]
        g["idf"] = np.round(np.log(float(n_docs) / g["df_cnt"]), 6)
        g["df_cnt"] = g["df_cnt"].astype("int64")
        return g

    partials = docs.map_batches(partial, batch_format="pandas",
                                batch_size=None)
    exact = hash_partition(partials, ["term"], nparts=min(_par(), 8))
    return exact.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def bm25_search(sf_dir: str, query: str = "hash join stream", k: int = 10,
                k1: float = 1.2, b: float = 0.75):
    """BM25 keyword search: top-k documents for a term query — the
    lexical complement of ann_topk's vector search (Robertson-Sparck
    Jones BM25, the idf = ln(1 + (N-df+0.5)/(df+0.5)) variant).

    Scale shape — the corpus NEVER shuffles:
      pass 1: per-block corpus-stat partials (one row per block: total
              token count + per-query-term document frequencies) —
              a few integers per block to the driver;
      pass 2: vectorized per-block scoring (str.count per term against
              broadcast idf/avgdl constants) + per-block top-k
              combiner + tiny single-block merge.
    Ordering ties broken by (rounded score DESC, doc_id ASC)
    identically in the SQL oracle."""
    import re as _re

    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)
    terms = list(dict.fromkeys(
        t for t in _re.split(_TERM_SPLIT_RE, query.lower()) if t))
    n_docs = _table_rows(sf_dir, "documents")

    def pat(t: str) -> str:
        return rf"(?<![a-z0-9]){_re.escape(t)}(?![a-z0-9])"

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        row = {"sum_dl": [int(low.str.count("[a-z0-9]+").sum())]}
        for i, t in enumerate(terms):
            row[f"df_{i}"] = [int((low.str.count(pat(t)) > 0).sum())]
        return pd.DataFrame(row)

    st = docs.map_batches(stats_partial, batch_format="pandas",
                          batch_size=None).to_pandas()  # one row/block
    avgdl = float(st["sum_dl"].sum()) / n_docs
    idf = {
        t: float(np.log(1 + (n_docs - st[f"df_{i}"].sum() + 0.5)
                        / (st[f"df_{i}"].sum() + 0.5)))
        for i, t in enumerate(terms)
    }

    def score_top(df: pd.DataFrame) -> pd.DataFrame:
        if "score" not in df.columns:
            low = df["text"].str.lower()
            dl = low.str.count("[a-z0-9]+").to_numpy(np.float64)
            score = np.zeros(len(df))
            hit = np.zeros(len(df), dtype=bool)
            for t in terms:
                tf = low.str.count(pat(t)).to_numpy(np.float64)
                hit |= tf > 0
                score += idf[t] * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dl / avgdl))
            df = pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "score": np.round(score, 6),
            })[hit]
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="stable")
        return df.head(k)

    return docs.map_batches(
        score_top, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(
        score_top, batch_format="pandas", batch_size=None)


def tfidf_top_terms(sf_dir: str, k: int = 3, min_df: int = 1):
    """Per-document top-k TF-IDF terms — the per-doc half of the
    TF-IDF pipeline (term_doc_freq is the corpus half). Scale shape:
    the DF table (vocab-bounded, min_df-truncated at scale) is built
    by the term_doc_freq machinery and BROADCAST as an idf lookup;
    scoring is then embarrassingly parallel — explode terms in-block,
    map idf, per-doc top-k in-block (a doc's text lives in one row,
    so its term counts never cross blocks). No corpus shuffle.

    Score = tf * ln(N/df), rounded to 6dp BEFORE the top-k cut so the
    (score DESC, term ASC) order ties identically in the SQL oracle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)
    n_docs = _table_rows(sf_dir, "documents")
    dft = term_doc_freq(sf_dir, min_df=min_df).to_pandas()  # vocab-bounded
    idf_ref = ray.put(dict(zip(
        dft["term"], np.log(float(n_docs) / dft["df_cnt"].to_numpy()))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idf = ray.get(idf_ref)
        t = _explode_terms(df)
        tf = (t.groupby(["doc_id", "term"], sort=False).size()
              .rename("tf").reset_index())
        tf["score"] = np.round(
            tf["tf"].to_numpy(np.float64)
            * tf["term"].map(idf).fillna(0.0).to_numpy(np.float64), 6)
        tf = tf[tf["score"] > 0]
        tf = tf.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="stable")
        out = tf.groupby("doc_id", sort=False).head(k)
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "term": out["term"],
            "score": out["score"],
        })

    return docs.map_batches(score, batch_format="pandas")


def top_bigrams(sf_dir: str, k: int = 30):
    """Global top-k bigram frequency — n-gram extension of top_terms.
    Vectorized pairing: explode tokens (doc order preserved), shift by
    -1 within each doc, join adjacent pairs — no per-row Python loop.
    Same scale shape as top_terms: per-block bigram-count partials,
    ONE keyed shuffle of partials, block top-k + tiny merge."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _explode_terms(df)  # (doc_id, term), document order
        nxt = t.groupby("doc_id", sort=False)["term"].shift(-1)
        mask = nxt.notna()
        bg = t.loc[mask, "term"] + " " + nxt[mask]
        vc = bg.value_counts()
        return pd.DataFrame({"bigram": vc.index, "cnt": vc.to_numpy()})

    def top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(["cnt", "bigram"], ascending=[False, True],
                          kind="stable")
        return g.head(k)

    partials = docs.map_batches(partial, batch_format="pandas",
                                batch_size=None)
    exact = hash_partition(partials, ["bigram"], nparts=min(_par(), 8))
    return exact.map_batches(
        top, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(
        top, batch_format="pandas", batch_size=None
    ).map_batches(
        lambda df: df.assign(cnt=df["cnt"].astype("int64")),
        batch_format="pandas")


def weighted_sample_events(sf_dir: str, n: int = 5):
    """Deterministic WEIGHTED per-group sampling (Efraimidis-Spirakis
    A-ES): each event draws key = u^(1/w) with w = value and u a
    uniform derived from a multiplicative hash of event_id; the n
    largest keys per event_type are a weighted sample without
    replacement — reproducible across engines because u is pure
    integer arithmetic (the SQL oracle computes the identical
    expression; comparisons use ln(u)/w, monotone in the key).

    Scale shape: same as sample_events_per_type — per-block partial
    top-n per group, group-keyed shuffle of the partials, in-block
    final top-n. No corpus sort, no single-block funnel."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"],
               split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "lnkey" not in df.columns:
            df = df[df["value"] > 0]
            h = (df["event_id"].to_numpy(np.uint64)
                 * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
            u = (h.astype(np.float64) + 0.5) / float(1 << 32)
            df = df.assign(
                lnkey=np.log(u) / df["value"].to_numpy(np.float64))
        df = df.sort_values(["event_type", "lnkey", "event_id"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("event_type", sort=False).head(n)

    partials = ev.map_batches(partial, batch_format="pandas")
    return hash_partition(
        partials, ["event_type"], nparts=min(_par(), 8)
    ).map_batches(
        partial, batch_format="pandas", batch_size=None
    ).drop_columns(["lnkey"])


def customer_order_counts(sf_dir: str):
    """LEFT OUTER join: every customer with their order count,
    zero-order customers included at 0 — the outer-join member of the
    join family (inner/broadcast/anti/as-of/interval live elsewhere in
    this module). Scale shape: orders pre-aggregate to one (custkey,
    n) row per block (combiner) -> keyed shuffle for exact per-key
    counts -> distributed left_outer hash join against the customer
    dim; the join moves one row per DISTINCT custkey, never one per
    order."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"], split=True)
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_custkey", sort=False).size()
                .rename("n").reset_index())

    def exact(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_custkey", sort=False)["n"].sum()
                .reset_index())

    counts = hash_partition(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], nparts=_join_parts(),
    ).map_batches(exact, batch_format="pandas", batch_size=None)

    joined = cust.join(
        counts, join_type="left_outer", num_partitions=_join_parts(),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype("int64"),
            "c_name": df["c_name"],
            "n_orders": df["n"].fillna(0).astype("int64"),
        })

    return joined.map_batches(finish, batch_format="pandas")


def prepare_training_corpus(sf_dir: str, lang: str = "en",
                            min_tokens: int = 10, train_pct: int = 80):
    """The composite training-data-prep pipeline this engine exists
    for, end to end in one streaming plan: language filter -> quality
    (length) filter -> exact dedup (first doc per text) -> reproducible
    train/test split -> per-split corpus stats. Every stage reuses the
    module's scale shapes: read-pruned columns, vectorized in-block
    filters (no shuffle), sort-based dedup (the one keyed exchange),
    hash-arithmetic split (shuffle-free), partial-count final
    aggregate. A 100-TB corpus flows through exactly one all-to-all."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 split=True)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"] == lang]
        n_tok = df["text"].str.lower().str.count("[a-z0-9]+")
        df = df.assign(n_tok=n_tok.astype("int64"))
        df = df[df["n_tok"] >= min_tokens]
        out = df[["doc_id", "text", "n_tok"]].copy()
        out["h"] = D.content_hash(out["text"])
        return out

    ded = sorted_dedup(docs.map_batches(filt, batch_format="pandas"),
                       ["h", "doc_id"], ["h", "text"])

    def split_stats(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy(np.uint64)
             * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
        split = np.where((h % 100) < train_pct, "train", "test")
        g = (df.assign(split=split)
             .groupby("split", sort=False)["n_tok"]
             .agg(["count", "sum"]).reset_index())
        return g.rename(columns={"count": "n_docs", "sum": "total_tokens"})

    out = ded.map_batches(split_stats, batch_format="pandas").groupby(
        "split"
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_tokens"] = out["total_tokens"].astype("int64")
    return out
