"""Stateful stage classes for the training-data pipelines.

Same pattern as the crawl stages: compile/load once in ``__init__``,
vectorized work per batch in ``__call__``. Most run as TASK pools via
``stage_task`` (construction cached per worker process — their state
is imports/params; the chunk-pair stages' LRU chunk caches measured
3x faster as per-worker task state than as a bounded actor pool at
bench scale). Every class remains actor-pool compatible as written.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class TextFeatures:
    """documents batch -> quality/stat features. Regexes and stopword
    sets are compiled once per actor."""

    def __init__(self):
        # Import inside __init__ so compilation cost is per-actor.
        from ..functions import text as T

        self.T = T

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return self.T.text_stats(df)


class LangId:
    def __init__(self):
        from ..functions.text import lang_id

        self.lang_id = lang_id

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["pred_lang"] = self.lang_id(df["text"])
        return out


class MinHasher:
    """documents batch -> exploded (band, band_key, doc_id) rows.
    Permutation parameters are derived once per actor (seeded)."""

    def __init__(self, num_perm: int = 128, bands: int = 16, shingle_k: int = 3):
        from ..functions import dedup as D

        self.D = D
        self.num_perm = num_perm
        self.bands = bands
        self.k = shingle_k

    _SCHEMA = pa.schema([("doc_id", pa.int64()), ("band", pa.int32()),
                         ("band_key", pa.int64())])

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        if not n:
            return self._SCHEMA.empty_table()
        # Arrow in, Arrow out: the only Python hop is the unavoidable
        # per-doc shingle loop; the exploded (doc, band) output wraps
        # the numpy arrays zero-copy instead of paying a
        # pandas->arrow conversion per batch.
        sigs = np.stack(
            [self.D.minhash_signature(self.D.word_shingles(s, self.k),
                                      self.num_perm)
             for s in t["text"].to_pylist()]
        )
        keys = self.D.lsh_band_keys_batch(sigs, self.bands)  # (n, B) int64
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": np.repeat(doc_ids, self.bands),
             "band": np.tile(np.arange(self.bands, dtype=np.int32), n),
             "band_key": keys.ravel()},
            schema=self._SCHEMA,
        )


class SimHasher:
    def __init__(self):
        from ..functions.dedup import simhash

        self.simhash = simhash
        self.cache: dict[str, int] = {}  # token-hash memo, per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(self.cache) > 1_000_000:  # bound actor memory
            self.cache.clear()
        out = df[["doc_id"]].copy()
        out["simhash"] = df["text"].map(
            lambda t: self.simhash(t, self.cache)
        ).astype("int64")
        return out


class BruteForceTopK:
    """Embedding batches scored against a broadcast query matrix; emits
    per-(query, batch) partial top-k rows. A final small groupby merge
    produces the global top-k — the classic partial-then-merge shape, so
    candidate batches stream and nothing materializes the full matrix.
    """

    def __init__(self, queries_ref, k: int):
        from ..functions.ann import brute_force_scores, topk_merge

        q = ray.get(queries_ref)  # {"ids": (Q,), "vecs": (Q, D)}
        self.q_ids = q["ids"]
        self.q_vecs = q["vecs"]
        self.k = k
        self.score = brute_force_scores
        self.merge = topk_merge

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cand_ids = batch["vec_id"].to_numpy()
        cand = np.stack(batch["embedding"].to_numpy())
        sims = self.score(self.q_vecs, cand)  # (Q, C)
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qi, qid in enumerate(self.q_ids):
            mask = cand_ids != qid  # exclude self-match
            ids, scores = self.merge(cand_ids[mask], sims[qi][mask], self.k)
            rows["query_id"].extend([qid] * len(ids))
            rows["neighbor_id"].extend(ids.tolist())
            rows["score"].extend(scores.tolist())
        return pd.DataFrame(rows).astype(
            {"query_id": "int64", "neighbor_id": "int64", "score": "float64"}
        )


class CrossChunkScore:
    """One task per chunk pair (ci <= cj) of the range-chunked embedding
    table: load exactly two chunk files, one matmul, emit all pairs with
    cosine >= threshold as (min_id, max_id). Chunks are cached per actor
    (an actor usually draws several pairs sharing a chunk)."""

    def __init__(self, chunk_dir: str, threshold: float, cache_max: int = 4):
        import os

        from ..functions.dedup import normalize_rows

        self.dir = chunk_dir
        self.t = threshold
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.cache_max = cache_max
        self.normalize = normalize_rows
        self.join = os.path.join

    def _load(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        got = self.cache.get(c)
        if got is None:
            import pyarrow.dataset as pads

            if len(self.cache) >= self.cache_max:
                self.cache.pop(next(iter(self.cache)))
            t = pads.dataset(
                self.join(self.dir, f"chunk={c}"), format="parquet"
            ).to_table()
            ids = t["vec_id"].to_numpy()
            vecs = self.normalize(
                np.stack(t["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64)
            )
            got = self.cache[c] = (ids, vecs)
        return got

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"vec_id_a": [], "vec_id_b": [], "cosine": []}
        for ci, cj in zip(df["ci"], df["cj"]):
            ia, va = self._load(int(ci))
            ib, vb = self._load(int(cj))
            sims = va @ vb.T
            rs, cs = np.nonzero(sims >= self.t)
            for r, c in zip(rs, cs):
                a, b = int(ia[r]), int(ib[c])
                if ci == cj:
                    if a >= b:  # each unordered pair appears twice here
                        continue
                elif a > b:
                    a, b = b, a
                rows["vec_id_a"].append(a)
                rows["vec_id_b"].append(b)
                rows["cosine"].append(round(float(sims[r, c]), 6))
        return pd.DataFrame(rows).astype(
            {"vec_id_a": "int64", "vec_id_b": "int64", "cosine": "float64"}
        )


class CrossChunkJaccard:
    """One task per chunk pair (ci <= cj) of the hash-chunked documents
    table: load exactly two chunk files, shingle each chunk ONCE
    (hashed k-word shingles, cached per actor — an actor usually draws
    several pairs sharing a chunk), emit all pairs with exact n-gram
    Jaccard >= threshold as (doc_id_a < doc_id_b). The exact-oracle
    text-near-dup baseline; MinHash+LSH (dataops.minhash_lsh_pairs) is
    the subquadratic scale path over the same similarity."""

    def __init__(self, chunk_dir: str, threshold: float, k: int = 3,
                 cache_max: int = 4):
        import os

        from ..functions.dedup import word_shingles

        self.dir = chunk_dir
        self.t = threshold
        self.k = k
        self.cache: dict[int, tuple[list, list]] = {}
        self.cache_max = cache_max
        self.shingles = word_shingles
        self.join = os.path.join

    def _load(self, c: int) -> tuple[list, list]:
        got = self.cache.get(c)
        if got is None:
            import pyarrow.dataset as pads

            if len(self.cache) >= self.cache_max:
                self.cache.pop(next(iter(self.cache)))
            t = pads.dataset(
                self.join(self.dir, f"chunk={c}"), format="parquet"
            ).to_table()
            ids = t["doc_id"].to_pylist()
            sets = [self.shingles(x, self.k) for x in t["text"].to_pylist()]
            got = self.cache[c] = (ids, sets)
        return got

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.dedup import jaccard

        rows = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
        for ci, cj in zip(df["ci"], df["cj"]):
            ia, sa = self._load(int(ci))
            ib, sb = self._load(int(cj))
            same = int(ci) == int(cj)
            for x in range(len(ia)):
                s1 = sa[x]
                for y in range(x + 1, len(ib)) if same else range(len(ib)):
                    j = jaccard(s1, sb[y])
                    if j >= self.t:
                        a, b = int(ia[x]), int(ib[y])
                        if a > b:
                            a, b = b, a
                        rows["doc_id_a"].append(a)
                        rows["doc_id_b"].append(b)
                        rows["jaccard"].append(round(j, 6))
        return pd.DataFrame(rows).astype(
            {"doc_id_a": "int64", "doc_id_b": "int64", "jaccard": "float64"}
        )


class IvfTopK:
    """IVF partial top-k: centroids, queries and per-query probe cells
    broadcast once per actor; each candidate batch is cell-assigned with
    one matmul, each query scores only candidates in its probed cells.
    A tiny per-query merge downstream yields the global (approximate)
    top-k — same partial-then-merge shape as BruteForceTopK."""

    def __init__(self, ref, k: int):
        from ..functions.ann import topk_merge
        from ..functions.dedup import normalize_rows

        d = ray.get(ref)
        self.q_ids = d["ids"]
        self.q_vecs = normalize_rows(d["vecs"].astype(np.float64))
        self.cents = d["cents"]
        self.probe = d["probe"]  # (Q, nprobe) cell ids
        self.k = k
        self.merge = topk_merge
        self.normalize = normalize_rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cand_ids = batch["vec_id"].to_numpy()
        cand = self.normalize(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        )
        assign = np.argmax(cand @ self.cents.T, axis=1)
        sims = self.q_vecs @ cand.T
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qi, qid in enumerate(self.q_ids):
            mask = np.isin(assign, self.probe[qi]) & (cand_ids != qid)
            ids, scores = self.merge(cand_ids[mask], sims[qi][mask], self.k)
            rows["query_id"].extend([qid] * len(ids))
            rows["neighbor_id"].extend(ids.tolist())
            rows["score"].extend(scores.tolist())
        return pd.DataFrame(rows).astype(
            {"query_id": "int64", "neighbor_id": "int64", "score": "float64"}
        )


class ImageDecode:
    """Crawl-output image rows -> decoded-pixel feature columns.

    The png/raw codecs are real (functions/imagegen.py); jpeg/webp would
    plug in here and are gated behind NotImplementedError in this
    container. Demonstrates the multimodal actor shape: small batches,
    binary in, fixed-width features out.
    """

    def __init__(self):
        from ..functions.imagegen import decode_image

        self.decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for row in batch.select(["bytes", "fmt", "w", "h"]).to_pylist():
            px = self.decode(row)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        out = batch.select(["image_id", "url", "w", "h", "fmt", "phash"])
        out = out.append_column("pixel_mean", pa.array(means, pa.float64()))
        out = out.append_column("pixel_std", pa.array(stds, pa.float64()))
        return out


class PhashVariants:
    """Image row -> two (img_key, ph) rows: the stored source phash and
    the phash of the DECODED payload (key suffixed ``#re``). Feeds
    ``hamming_pairs_64`` for perceptual-hash copy detection — a lossy
    re-encode (q6) shifts a few phash bits, a lossless one none; pairs
    within the hamming budget are re-encoded copies of one picture."""

    def __init__(self):
        from ..functions.imagegen import average_phash, decode_image

        self.decode = decode_image
        self.phash = average_phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        keys = list(ids)
        hashes = batch["phash"].to_pylist()
        for row in batch.select(["bytes", "fmt", "w", "h"]).to_pylist():
            px = self.decode(row)
            hashes.append(self.phash(px))
        keys += [f"{i}#re" for i in ids]
        return pa.table(
            {"img_key": pa.array(keys, pa.string()),
             "ph": pa.array(hashes, pa.int64())}
        )


class ImageResize:
    """Nearest-neighbor resize to a fixed (size x size) thumbnail; emits
    raw RGB bytes. Vision-model preprocessing shape."""

    def __init__(self, size: int = 16):
        from ..functions.imagegen import decode_image

        self.decode = decode_image
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        s = self.size
        for row in batch.select(["bytes", "fmt", "w", "h"]).to_pylist():
            px = self.decode(row)
            h, w, _ = px.shape
            ys = (np.arange(s) * h) // s
            xs = (np.arange(s) * w) // s
            thumbs.append(px[np.ix_(ys, xs)].tobytes())
        out = batch.select(["image_id", "url", "caption"])
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        out = out.append_column(
            "thumb_wh", pa.array([s] * len(thumbs), pa.int32())
        )
        return out


class AudioFeatures:
    """Audio feature-extract stage STUB: no audio codec exists in this
    container. The Ray-side plumbing (actor signature, small-batch
    binary contract, fixed-width output schema) is real; real decode
    raises NotImplementedError, and ``fake=True`` computes deterministic
    pseudo-features (RMS / zero-crossing rate over the raw bytes as if
    they were u8 PCM) so the pipeline shape is testable end to end."""

    OUTPUT_SCHEMA = pa.schema(
        [("media_id", pa.string()), ("n_samples", pa.int64()),
         ("rms", pa.float64()), ("zcr", pa.float64())]
    )

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "n_samples": [], "rms": [], "zcr": []}
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            if not self.fake:
                raise NotImplementedError(
                    "no audio codec in this container; run with fake=True"
                )
            x = np.frombuffer(blob or b"\x80", dtype=np.uint8).astype(
                np.float64
            ) - 127.5
            rows["media_id"].append(mid)
            rows["n_samples"].append(len(x))
            rows["rms"].append(round(float(np.sqrt(np.mean(x * x))), 6))
            rows["zcr"].append(
                round(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                      if len(x) > 1 else 0.0, 6)
            )
        return pa.table(rows, schema=self.OUTPUT_SCHEMA)


class FrameSample:
    """Video frame-sampling stage STUB: no video codec exists in this
    container. The Ray-side plumbing (actor signature, batch contract,
    output schema) is real; ``decode`` raises NotImplementedError and
    the deterministic fake below is used under ``fake=True`` for tests.
    """

    OUTPUT_SCHEMA = pa.schema(
        [("media_id", pa.string()), ("frame_idx", pa.int32()),
         ("frame", pa.binary())]
    )

    def __init__(self, every_n: int = 30, fake: bool = False):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "frame_idx": [], "frame": []}
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            if not self.fake:
                raise NotImplementedError(
                    "no video codec in this container; run with fake=True"
                )
            # Deterministic fake: one "frame" per every_n KiB of payload.
            for i in range(max(1, len(blob) // (self.every_n * 1024))):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(i)
                rows["frame"].append(blob[i * 16 : i * 16 + 16])
        return pa.table(rows, schema=self.OUTPUT_SCHEMA)
