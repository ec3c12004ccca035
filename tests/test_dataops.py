"""Unit tests for the training-data kernels: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), ANN, text analysis and the
image codec — on planted fixtures with known answers."""

import numpy as np
import pandas as pd
import pytest

from kit_ray.functions import ann as A
from kit_ray.functions import dedup as D
from kit_ray.functions import text as T
from kit_ray.functions.imagegen import (
    average_phash,
    decode_image,
    make_image_row,
    make_pixels,
    png_decode,
    png_encode,
    psnr,
)


class TestHashStability:
    def test_fnv_known_values(self):
        # Stable across processes/machines (unlike builtin hash()).
        assert T.hash_token("") == 0xCBF29CE484222325
        assert T.hash_token("a") == T.hash_token("a")
        assert T.hash_token("a") != T.hash_token("b")

    def test_content_hash_signed64(self):
        s = pd.Series(["x", "y", "x"])
        h = D.content_hash(s)
        assert h.dtype == "int64"
        assert h[0] == h[2] != h[1]


class TestMinHashLsh:
    def _doc(self, words):
        return " ".join(words)

    def test_jaccard_matches_signature_agreement(self):
        rng = np.random.default_rng(0)
        vocab = [f"w{i}" for i in range(500)]
        a_words = list(rng.choice(vocab, 120, replace=False))
        b_words = a_words[:100] + list(rng.choice(vocab[400:], 10, replace=False))
        a, b = self._doc(a_words), self._doc(b_words)
        sa, sb = D.word_shingles(a), D.word_shingles(b)
        true_j = D.jaccard(sa, sb)
        siga = D.minhash_signature(sa, 256)
        sigb = D.minhash_signature(sb, 256)
        est = (siga == sigb).mean()
        assert abs(est - true_j) < 0.15

    def test_near_dups_share_band(self):
        base = self._doc([f"tok{i}" for i in range(200)])
        near = base + " extra"
        far = self._doc([f"other{i}" for i in range(200)])
        kb = D.lsh_band_keys(D.minhash_signature(D.word_shingles(base)))
        kn = D.lsh_band_keys(D.minhash_signature(D.word_shingles(near)))
        kf = D.lsh_band_keys(D.minhash_signature(D.word_shingles(far)))
        assert any(x == y for x, y in zip(kb, kn))  # near-dup collides
        assert not any(x == y for x, y in zip(kb, kf))  # unrelated doesn't

    def test_ngram_jaccard_bounds(self):
        assert D.ngram_jaccard("a b c d", "a b c d") == 1.0
        assert D.ngram_jaccard("a b c d", "x y z w") == 0.0


class TestSimHash:
    def test_identical_and_near(self):
        base = " ".join(f"tok{i}" for i in range(100))
        assert D.simhash(base) == D.simhash(base)
        near = D.simhash(base + " one_more")
        far = D.simhash(" ".join(f"other{i}" for i in range(100)))
        assert D.hamming64(D.simhash(base), near) < 10
        assert D.hamming64(D.simhash(base), far) > 20

    def test_chunk_pigeonhole(self):
        a = D.simhash(" ".join(f"tok{i}" for i in range(100)))
        b = a ^ 0b111  # hamming 3 < 4 chunks
        assert any(
            x == y for x, y in zip(D.simhash_chunks(a, 4), D.simhash_chunks(b, 4))
        )

    def test_empty(self):
        assert D.simhash("") == 0


class TestEmbeddingDedupAnn:
    def test_cosine_pairs_finds_planted(self):
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(50, 16))
        vecs[7] = vecs[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
        ids = np.arange(50)
        pairs = D.cosine_pairs(ids, vecs, 0.95)
        assert (3, 7) in [(a, b) for a, b, _ in pairs]

    def test_brute_force_topk_exact(self):
        rng = np.random.default_rng(2)
        vecs = rng.normal(size=(200, 16))
        q = vecs[:2]
        sims = A.brute_force_scores(q, vecs)
        ids = np.arange(200)
        got_ids, got_scores = A.topk_merge(ids[ids != 0], sims[0][ids != 0], 10)
        truth = np.argsort(-sims[0][1:])[:10] + 1
        assert set(got_ids) == set(truth)

    def test_ivf_recall_reasonable(self):
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(400, 16))
        cents = A.kmeans_fit(vecs, 8)
        assign = A.ivf_assign(vecs, cents)
        assert len(set(assign.tolist())) > 1
        probe = A.ivf_probe_cells(vecs[:1], cents, 4)
        assert probe.shape == (1, 4)
        # The query's own cell must be among its probed cells.
        assert assign[0] in probe[0]


class TestTextKernels:
    def test_token_counts(self):
        s = pd.Series(["a b  c", "", "  ", "one"])
        assert T.whitespace_token_count(s).tolist() == [3, 0, 0, 1]
        assert T.bpeish_token_count(pd.Series(["ab12-cd", ""])).tolist() == [4, 0]

    def test_lang_id_on_samples(self):
        # The testdata documents are language-agnostic word salad (the
        # lang column is a label, not a property of the text), so the
        # heuristic is pinned on real sentences instead.
        samples = pd.Series([
            "the cat sat on the mat and looked at the dog for a while",
            "der Hund ist ein Tier und das Haus ist nicht klein",
            "le chat est sur la table et les enfants sont pour une heure",
            "el perro es un animal y la casa de los vecinos es grande",
            "",
        ])
        assert T.lang_id(samples).tolist() == ["en", "de", "fr", "es", "und"]

    def test_fingerprint_deterministic_and_local(self):
        s = pd.Series(["the quick brown fox jumps over the lazy dog " * 5])
        f1 = T.rolling_fingerprint(s)
        f2 = T.rolling_fingerprint(s.copy())
        assert f1.equals(f2)
        assert T.rolling_fingerprint(pd.Series([""]))[0] == 0

    def test_fingerprint_matches_scalar_reference(self):
        """Pin the vectorized prefix-sum formulation to the definition:
        min over window shingles of the Horner polynomial hash of the
        token FNV values, arithmetic mod 2^64, short docs hashed whole."""
        def scalar_ref(text: str, window: int = 8) -> int:
            toks = text.split()
            if not toks:
                return 0
            hs = [int(x) for x in T.fnv1a_batch(toks)]
            w = min(window, len(hs))
            best = None
            for s0 in range(len(hs) - w + 1):
                acc = 0
                for h in hs[s0:s0 + w]:
                    acc = (acc * 1_000_003 + h) % (1 << 64)
                best = acc if best is None else min(best, acc)
            return best - (1 << 64) if best >= (1 << 63) else best

        rng = np.random.default_rng(11)
        words = ["alpha", "beta", "gamma", "x", "yy", "zzz", "w0rd", "42"]
        texts = ["", "one", "one two three"] + [
            " ".join(rng.choice(words, size=int(k)))
            for k in rng.integers(0, 30, 40)
        ]
        got = T.rolling_fingerprint(pd.Series(texts)).tolist()
        assert got == [scalar_ref(t) for t in texts]

    def test_text_stats_quality_range(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat on the mat.", ""]})
        out = T.text_stats(df)
        assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
        assert out.loc[0, "n_tokens"] == 6


class TestImageCodec:
    def test_png_round_trip(self):
        px = make_pixels("https://e.com/x", 42)
        assert np.array_equal(png_decode(png_encode(px)), px)

    def test_row_decode_and_phash(self):
        for url in ("https://e.com/a", "https://e.com/b?x=1"):
            row = make_image_row(url, 42)
            px = decode_image(row)
            assert px.shape == (row["h"], row["w"], 3)
            assert average_phash(px) == row["phash"]

    def test_psnr(self):
        px = make_pixels("https://e.com/x", 42)
        assert psnr(px, px) == float("inf")
        noisy = px.astype(np.int16) + 2
        assert psnr(px, np.clip(noisy, 0, 255).astype(np.uint8)) > 40

    def test_unknown_codec_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image({"fmt": "jpeg", "bytes": b"", "w": 1, "h": 1})

    def test_determinism_across_calls(self):
        a = make_image_row("https://e.com/same", 7)
        b = make_image_row("https://e.com/same", 7)
        assert a == b


class TestNearDupPipelines:
    def test_block_pair_exact_and_ivf_bucketed_find_planted(
        self, ray_session, tmp_path
    ):
        """The distributed block-pair pipeline is EXACT (must equal the
        kernel-level all-pairs scan); the IVF-bucketed pipeline is the
        approximate scale path, but planted near-dups (cosine ~0.999)
        co-locate in cells, so it must find them all and never invent
        pairs the exact scan lacks."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kit_ray.pipelines.dataops import (
            embedding_neardup,
            embedding_neardup_ivf,
        )

        rng = np.random.default_rng(5)
        n, d = 600, 32
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        planted = [(10, 310), (50, 400), (99, 500)]
        for a, b in planted:
            vecs[b] = vecs[a] + rng.normal(scale=0.01, size=d).astype(np.float32)
        t = pa.table(
            {"vec_id": pa.array(range(n), pa.int64()),
             "embedding": pa.array([v.tolist() for v in vecs],
                                   pa.list_(pa.float32()))}
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))

        truth = {(a, b) for a, b, _ in
                 D.cosine_pairs(np.arange(n), vecs.astype(np.float64), 0.95)}
        # Chunk store flows through the storage seam: point
        # KIT_RAY_SHARED_DIR at a fresh dir and verify the pipeline
        # reads chunks from it AND removes its run dir afterwards.
        import os

        shared = tmp_path / "shared"
        old = os.environ.get("KIT_RAY_SHARED_DIR")
        os.environ["KIT_RAY_SHARED_DIR"] = str(shared)
        try:
            exact = embedding_neardup(
                str(tmp_path), threshold=0.95, chunk_rows=128
            ).to_pandas()
        finally:
            if old is None:
                del os.environ["KIT_RAY_SHARED_DIR"]
            else:  # pragma: no cover
                os.environ["KIT_RAY_SHARED_DIR"] = old
        scratch = shared / "neardup_chunks"
        assert scratch.is_dir()  # the seam was used...
        assert list(scratch.iterdir()) == []  # ...and cleaned up
        exact_pairs = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
        assert exact_pairs == truth
        assert set(planted) <= exact_pairs

        bucketed = embedding_neardup_ivf(
            str(tmp_path), threshold=0.95, sample_rows=600
        ).to_pandas()
        buck_pairs = set(zip(bucketed["vec_id_a"], bucketed["vec_id_b"]))
        assert set(planted) <= buck_pairs
        assert buck_pairs <= exact_pairs


class TestSimHashNearDup:
    def test_chunk_lsh_matches_all_pairs_scan(self, ray_session):
        """max_hamming=3 < 4 chunks makes the chunk join a COMPLETE
        candidate generator (pigeonhole) — the distributed pipeline
        must equal the exhaustive all-pairs Hamming scan exactly."""
        import pyarrow.parquet as pq

        from kit_ray.pipelines.dataops import simhash_neardup

        t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                          columns=["doc_id", "text"])
        ids = t["doc_id"].to_numpy()
        hs = np.array([D.simhash(x) for x in t["text"].to_pylist()],
                      dtype=np.int64).view(np.uint64)
        x = hs[:, None] ^ hs[None, :]
        pop = np.unpackbits(
            x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2
        ).sum(axis=2)
        iu = np.triu_indices(len(ids), 1)
        truth = {
            (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i, j in zip(*iu) if pop[i, j] <= 3
        }
        got = simhash_neardup("/root/testdata/sf0.01").to_pandas()
        assert set(zip(got["doc_id_a"], got["doc_id_b"])) == truth
        assert len(truth) > 0


class TestMultimodalStubs:
    """The audio/video stages are honest stubs (no codecs in this
    container) but their RAY plumbing — actor pools over binary batches
    with fixed output schemas — must actually run."""

    def _media_ds(self, n=40):
        import ray.data as rd

        rng = np.random.default_rng(7)
        return rd.from_items(
            [{"media_id": f"m{i:03d}",
              "bytes": rng.integers(0, 256, 4096 * (1 + i % 3),
                                    dtype=np.uint8).tobytes()}
             for i in range(n)]
        ).repartition(4)

    def test_audio_features_fake_mode_runs(self, ray_session):
        from kit_ray.stages.data_stages import AudioFeatures

        out = self._media_ds().map_batches(
            AudioFeatures, fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert len(out) == 40
        assert list(out.columns) == ["media_id", "n_samples", "rms", "zcr"]
        assert (out["rms"] > 0).all() and out["zcr"].between(0, 1).all()
        # Deterministic across runs.
        again = self._media_ds().map_batches(
            AudioFeatures, fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert out.sort_values("media_id").reset_index(drop=True).equals(
            again.sort_values("media_id").reset_index(drop=True)
        )

    def test_frame_sample_fake_mode_runs(self, ray_session):
        from kit_ray.stages.data_stages import FrameSample

        out = self._media_ds().map_batches(
            FrameSample, fn_constructor_kwargs={"fake": True, "every_n": 2},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert list(out.columns) == ["media_id", "frame_idx", "frame"]
        assert len(out) >= 40  # at least one frame per media item

    def test_stubs_raise_without_fake(self):
        import pyarrow as pa

        from kit_ray.stages.data_stages import AudioFeatures, FrameSample

        t = pa.table({"media_id": ["x"], "bytes": [b"1234"]})
        with pytest.raises(NotImplementedError):
            AudioFeatures()(t)
        with pytest.raises(NotImplementedError):
            FrameSample()(t)


class TestLshRecall:
    def test_lsh_matches_exhaustive_ground_truth(self, ray_session):
        """The distributed MinHash-LSH pipeline must find EXACTLY the
        pairs an exhaustive all-pairs Jaccard scan finds at the same
        threshold (100% recall and precision on this corpus — 25 true
        near-dup pairs among 500 documents = 124,750 candidate pairs)."""
        import pyarrow.parquet as pq

        from kit_ray.pipelines.dataops import minhash_lsh_pairs

        df = pq.read_table("/root/testdata/sf0.01/documents.parquet").to_pandas()
        sh = {r.doc_id: D.word_shingles(r.text) for r in df.itertuples()}
        ids = sorted(sh)
        truth = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if D.jaccard(sh[a], sh[b]) >= 0.8
        }
        got = minhash_lsh_pairs("/root/testdata/sf0.01", threshold=0.8).to_pandas()
        got_pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
        assert got_pairs == truth
        assert len(truth) > 0


class TestPhashCopyPairs:
    def test_pairs_match_all_pairs_scan(self, ray_session, tmp_path):
        """Perceptual-hash copy detection: the chunk-LSH pipeline must
        equal the exhaustive hamming scan over the variant set
        (stored phash + decoded-payload phash per image), and lossless
        rows must pair with their own re-encode at hamming 0."""
        import os

        import pyarrow.dataset as pads

        from kit_ray.functions.imagegen import average_phash, decode_image
        from kit_ray.pipelines.crawl import crawl
        from kit_ray.pipelines.dataops import phash_copy_pairs
        from kit_ray.synth import CorpusConfig

        cfg = CorpusConfig(seed=3, n_hosts=5, pages_per_host=10)
        out = str(tmp_path / "out")
        crawl(cfg, out, concurrency=2, n_buckets=4)
        images_dir = os.path.join(out, "images")

        t = pads.dataset(images_dir, format="parquet", partitioning="hive",
                         ignore_prefixes=[".", "_"]).to_table(
            columns=["image_id", "bytes", "fmt", "w", "h", "phash"]
        )
        keys, hs = [], []
        for r in t.to_pylist():
            keys.append(r["image_id"])
            hs.append(r["phash"])
            keys.append(r["image_id"] + "#re")
            hs.append(average_phash(decode_image(r)))
        hv = np.array(hs, dtype=np.int64).view(np.uint64)
        x = hv[:, None] ^ hv[None, :]
        pop = np.unpackbits(
            x.view(np.uint8).reshape(len(keys), len(keys), 8), axis=2
        ).sum(axis=2)
        iu = np.triu_indices(len(keys), 1)
        truth = {
            tuple(sorted((keys[i], keys[j])))
            for i, j in zip(*iu) if pop[i, j] <= 7
        }
        assert truth  # lossless self-pairs guarantee hits

        got = phash_copy_pairs(images_dir).to_pandas()
        pairs = set(zip(got["img_key_a"], got["img_key_b"]))
        assert pairs == truth
        # Lossless rows pair with their own re-encode at hamming 0.
        zero = got[got["hamming"] == 0]
        fmts = {r["image_id"]: r["fmt"] for r in t.to_pylist()}
        lossless = {k for k, f in fmts.items() if f in ("raw", "png")}
        self_pairs = {
            a for a, b in zip(zero["img_key_a"], zero["img_key_b"])
            if b == a + "#re"
        }
        assert lossless <= self_pairs


class TestAsofAndWindows:
    """As-of join / running-window ops: keyed-hash-partition block
    completeness plus semantics vs a single-frame pandas reference."""

    def _events(self):
        rng = np.random.default_rng(7)
        n = 400
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 10**6, n)), unit="s"
        )
        return pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": rng.integers(0, 13, n).astype("int64"),
            "event_type": rng.choice(
                ["purchase", "view", "click"], n, p=[0.3, 0.4, 0.3]
            ),
            "value": rng.uniform(0.1, 50, n).round(2),
        })

    def test_sorted_dedup_no_single_block_funnel(self, ray_session):
        """Regression: sorted_dedup must NOT end in a repartition(1)
        funnel — on multi-block input the deduped output stays
        multi-block (per-key-range parallel finish), and the result is
        still the exact min-order row per key."""
        import ray.data as rd

        from kit_ray.pipelines.dataops import sorted_dedup

        rng = np.random.default_rng(7)
        n = 4000
        df = pd.DataFrame({
            "k": rng.integers(0, 800, n).astype("int64"),
            "ord": rng.permutation(n).astype("int64"),
            "payload": rng.integers(0, 10, n).astype("int64"),
        })
        ds = rd.from_pandas(df).repartition(9)
        out = sorted_dedup(ds, ["k", "ord"], ["k"], nparts=6)
        mat = out.materialize()
        assert mat.num_blocks() > 1, "dedup funneled to one block"
        got = mat.to_pandas().sort_values("k").reset_index(drop=True)
        want = (df.sort_values(["k", "ord"]).drop_duplicates("k")
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "ord", "payload"]].astype("int64"),
            want[["k", "ord", "payload"]].astype("int64"))

    def test_hash_partition_blocks_are_key_complete(self, ray_session, tmp_path):
        import ray.data as rd

        from kit_ray.pipelines.dataops import hash_partition

        df = self._events()
        ds = rd.from_pandas(df).repartition(7)
        parts = hash_partition(ds, ["user_id"], 4)
        seen = {}
        for i, ref in enumerate(parts.to_pandas_refs()):
            import ray as _r

            for u in _r.get(ref)["user_id"].unique():
                assert u not in seen, f"user {u} split across blocks"
                seen[u] = i
        assert set(seen) == set(df["user_id"].unique())

    def test_asof_matches_single_frame_merge(self, ray_session, tmp_path):
        import ray.data as rd

        from kit_ray.pipelines.dataops import asof_purchase_attribution

        df = self._events()
        sf = tmp_path / "sf"
        sf.mkdir()
        df.assign(props="").to_parquet(sf / "events.parquet")

        got = asof_purchase_attribution(str(sf)).to_pandas()
        got = got.sort_values("purchase_id").reset_index(drop=True)

        p = df[df.event_type == "purchase"].sort_values("ts", kind="stable")
        v = df[df.event_type == "view"].sort_values("ts", kind="stable")
        v = v.assign(view_ts=v["ts"])
        ref = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            v[["event_id", "user_id", "ts", "view_ts"]],
            on="ts", by="user_id", direction="backward", suffixes=("", "_v"),
        ).dropna(subset=["event_id_v"])
        assert len(got) == len(ref)
        ref = ref.sort_values("event_id").reset_index(drop=True)
        assert (got["purchase_id"].to_numpy()
                == ref["event_id"].to_numpy()).all()
        assert (got["view_id"].to_numpy()
                == ref["event_id_v"].astype("int64").to_numpy()).all()
        lag = (ref["ts"] - ref["view_ts"]).dt.total_seconds().round(3)
        assert np.allclose(got["lag_s"], lag)
        # every attributed view precedes (or equals) its purchase
        assert (got["lag_s"] >= 0).all()

    def test_asof_user_with_no_views_dropped(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import asof_purchase_attribution

        df = pd.DataFrame({
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 09:00"]
            ),
            "user_id": np.array([5, 5, 6], dtype="int64"),
            "event_type": ["view", "purchase", "purchase"],
            "value": [1.0, 2.0, 3.0],
            "props": ["", "", ""],
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = asof_purchase_attribution(str(sf)).to_pandas()
        assert got["purchase_id"].tolist() == [2]  # user 6: no view at all
        assert got["view_id"].tolist() == [1]

    def test_running_value_matches_cumsum(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import user_running_value

        df = self._events()
        sf = tmp_path / "sf"
        sf.mkdir()
        df.assign(props="").to_parquet(sf / "events.parquet")
        got = user_running_value(str(sf)).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)

        ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cum = ref.groupby("user_id", sort=False)["value"].cumsum().round(6)
        ref = pd.DataFrame({"event_id": ref["event_id"], "cum_value": cum})
        ref = ref.sort_values("event_id").reset_index(drop=True)
        assert len(got) == len(df)
        assert np.allclose(got["cum_value"], ref["cum_value"])


class TestRankGapAntiQuantile:
    """Rank-per-group, lead/lag gaps, anti-join, exact quantiles —
    semantics vs single-frame pandas references on planted data."""

    def _events(self):
        rng = np.random.default_rng(11)
        n = 300
        ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 10**6, n)), unit="s"
        )
        return pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": rng.integers(0, 9, n).astype("int64"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.uniform(0.1, 40, n).round(2),
            "props": [""] * n,
        })

    def test_top_spenders_rank(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import top_spenders_per_type

        df = self._events()
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = top_spenders_per_type(str(sf), k=2).to_pandas()
        got = got.sort_values(["event_type", "rnk"]).reset_index(drop=True)

        tot = df.groupby(["event_type", "user_id"])["value"].sum().reset_index()
        tot = tot.sort_values(["event_type", "value", "user_id"],
                              ascending=[True, False, True])
        tot["rnk"] = tot.groupby("event_type").cumcount() + 1
        ref = tot[tot["rnk"] <= 2].reset_index(drop=True)
        assert len(got) == len(ref)
        assert got["user_id"].tolist() == ref["user_id"].tolist()
        assert np.allclose(got["total_value"], ref["value"].round(6))
        assert got["rnk"].tolist() == ref["rnk"].tolist()

    def test_user_event_gaps(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import user_event_gaps

        df = self._events()
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = user_event_gaps(str(sf)).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)

        ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = ref.groupby("user_id", sort=False)
        prev_id, prev_ts = g["event_id"].shift(1), g["ts"].shift(1)
        keep = prev_id.notna()
        exp = pd.DataFrame({
            "event_id": ref.loc[keep, "event_id"],
            "prev_event_id": prev_id[keep].astype("int64"),
            "gap_s": (ref.loc[keep, "ts"] - prev_ts[keep])
                     .dt.total_seconds().round(3),
        }).sort_values("event_id").reset_index(drop=True)
        assert len(got) == len(exp)
        assert got["prev_event_id"].tolist() == exp["prev_event_id"].tolist()
        assert np.allclose(got["gap_s"], exp["gap_s"])
        assert (got["gap_s"] >= 0).all()

    def test_anti_join_planted(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import customers_without_urgent_orders

        cust = pd.DataFrame({
            "c_custkey": np.arange(10, dtype="int64"),
            "c_name": [f"c{i}" for i in range(10)],
        })
        # customers 0-5 have urgent orders; 6-9 have only LOW or none
        orders = pd.DataFrame({
            "o_custkey": np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype="int64"),
            "o_orderpriority": ["1-URGENT"] * 6 + ["5-LOW"] * 2,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        cust.to_parquet(sf / "customer.parquet")
        orders.to_parquet(sf / "orders.parquet")
        got = customers_without_urgent_orders(str(sf)).to_pandas()
        assert sorted(got["c_custkey"]) == [6, 7, 8, 9]

    def test_quartiles_match_numpy(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import value_quartiles_by_type

        df = self._events()
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = value_quartiles_by_type(str(sf)).to_pandas()
        got = got.sort_values("event_type").reset_index(drop=True)
        for _, row in got.iterrows():
            vals = df.loc[df["event_type"] == row["event_type"], "value"]
            q1, med, q3 = np.percentile(vals.to_numpy(), [25, 50, 75])
            assert abs(row["q1"] - round(q1, 6)) < 1e-9
            assert abs(row["median"] - round(med, 6)) < 1e-9
            assert abs(row["q3"] - round(q3, 6)) < 1e-9


class TestIntervalCorrClusters:
    """Interval join, algebraic corr combiner, connected components."""

    def test_purchase_context_window(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import purchase_context_events

        rng = np.random.default_rng(3)
        n = 250
        ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 10**5, n)), unit="s")
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": rng.integers(0, 7, n).astype("int64"),
            "event_type": rng.choice(["purchase", "view", "click"], n),
            "value": np.ones(n),
            "props": [""] * n,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = purchase_context_events(str(sf), window_s=3600).to_pandas()
        got = got.sort_values(
            ["purchase_id", "ctx_event_id"]).reset_index(drop=True)

        # quadratic reference
        rows = []
        for _, p in df[df.event_type == "purchase"].iterrows():
            w = df[(df.user_id == p.user_id)
                   & (df.ts >= p.ts - pd.Timedelta(seconds=3600))
                   & (df.ts < p.ts)]
            for _, e in w.iterrows():
                rows.append((p.event_id, p.user_id, e.event_id, e.event_type,
                             round((p.ts - e.ts).total_seconds(), 3)))
        ref = pd.DataFrame(rows, columns=[
            "purchase_id", "user_id", "ctx_event_id", "ctx_type", "lead_s"
        ]).sort_values(["purchase_id", "ctx_event_id"]).reset_index(drop=True)
        assert len(got) == len(ref)
        for c in ["purchase_id", "user_id", "ctx_event_id", "ctx_type"]:
            assert got[c].tolist() == ref[c].tolist()
        assert np.allclose(got["lead_s"], ref["lead_s"])
        assert (got["lead_s"] > 0).all()  # strictly-before window

    def test_corr_matches_numpy(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import price_qty_corr_by_flag

        rng = np.random.default_rng(5)
        n = 500
        qty = rng.integers(1, 50, n).astype("float64")
        price = qty * 100 + rng.normal(0, 300, n)
        df = pd.DataFrame({
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_partkey": np.zeros(n, dtype="int64"),
            "l_suppkey": np.zeros(n, dtype="int64"),
            "l_linenumber": np.zeros(n, dtype="int32"),
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.Timestamp("1997-01-01"),
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "lineitem.parquet")
        got = price_qty_corr_by_flag(str(sf)).to_pandas()
        got = got.sort_values("l_returnflag").reset_index(drop=True)
        for _, row in got.iterrows():
            g = df[df.l_returnflag == row.l_returnflag]
            exp = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
            assert abs(row.corr_qty_price - round(exp, 6)) < 2e-6

    def test_clusters_min_label(self, ray_session, tmp_path):
        """Planted near-identical doc groups must each collapse to one
        cluster labeled by its min doc_id; distinct texts stay out."""
        from kit_ray.pipelines.dataops import jaccard_dup_clusters

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        alt = ("completely different words describing an unrelated "
               "subject matter with no overlap in shingles whatsoever "
               "for this test")
        docs = []
        # group A: ids 0,1,2 identical; group B: ids 10,11 identical
        for i in [0, 1, 2]:
            docs.append({"doc_id": i, "text": base})
        for i in [10, 11]:
            docs.append({"doc_id": i, "text": alt})
        # singletons with unique text
        docs.append({"doc_id": 20, "text": "totally unique words here alpha beta gamma delta epsilon zeta eta theta"})
        df = pd.DataFrame(docs)
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = jaccard_dup_clusters(str(sf), threshold=0.8)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        got = got.sort_values("doc_id").reset_index(drop=True)
        exp = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}
        assert dict(zip(got["doc_id"], got["cluster_id"])) == exp

    def test_clusters_chain_transitive(self, ray_session, tmp_path):
        """A near-dup CHAIN (a~b, b~c, but a!~c) must still land in one
        component — the transitive closure only connected components
        provide (pair lists alone don't)."""
        from kit_ray.pipelines.dataops import jaccard_dup_clusters

        words = [f"w{i}" for i in range(40)]
        a = " ".join(words[0:30])
        b = " ".join(words[3:33])   # high overlap with a and c
        c = " ".join(words[6:36])   # high overlap with b, lower with a
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [a, b, c]})
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        got = jaccard_dup_clusters(str(sf), threshold=0.75)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        # a~b and b~c pass 0.75 (j=25/31); a~c does not (j=22/34): the
        # three docs form a chain, and components must close it.
        assert len(got) == 3
        assert set(got["cluster_id"]) == {1}


class TestSketchesAndSampling:
    """Mergeable sketches (t-digest quantiles, HLL distinct) and
    deterministic sampling/split ops."""

    def test_tdigest_compress_preserves_mass(self):
        from kit_ray.pipelines.dataops import (_tdigest_compress,
                                               _tdigest_quantile)

        rng = np.random.default_rng(1)
        v = rng.lognormal(0, 1.5, 20_000)  # skewed
        m, w = _tdigest_compress(v, np.ones_like(v), 256)
        assert len(m) <= 256
        assert abs(w.sum() - len(v)) < 1e-6
        for q in [0.25, 0.5, 0.75, 0.95]:
            est = _tdigest_quantile(m, w, [q])[0]
            exact = np.quantile(v, q)
            spread = np.quantile(v, min(q + 0.02, 1)) - np.quantile(
                v, max(q - 0.02, 0))
            assert abs(est - exact) <= max(spread, 1e-3)

    def test_approx_quantiles_close_to_exact(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import (approx_quantiles_by_type,
                                               value_quartiles_by_type)

        rng = np.random.default_rng(2)
        n = 8000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.exponential(10, n),
            "props": [""] * n,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        approx = approx_quantiles_by_type(str(sf)).to_pandas()
        exact = value_quartiles_by_type(str(sf)).to_pandas()
        m = approx.merge(exact, on="event_type", suffixes=("_a", "_e"))
        for c in ["q1", "median", "q3"]:
            rel = (m[f"{c}_a"] - m[f"{c}_e"]).abs() / m[f"{c}_e"]
            assert (rel < 0.05).all(), (c, m)

    def test_hll_accuracy_and_merge(self):
        from kit_ray.pipelines.dataops import (_hll_estimate,
                                               _hll_registers)

        rng = np.random.default_rng(3)
        ids = rng.choice(10**9, 50_000, replace=False).astype(np.int64)
        # merged halves must equal the whole (mergeability)
        a = _hll_registers(ids[:25_000])
        b = _hll_registers(ids[25_000:])
        whole = _hll_registers(ids)
        assert (np.maximum(a, b) == whole).all()
        est = _hll_estimate(whole)
        assert abs(est - 50_000) / 50_000 < 0.05  # 3x standard error

    def test_approx_distinct_users(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import approx_distinct_users_per_type

        rng = np.random.default_rng(4)
        n = 20_000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": rng.integers(0, 3000, n).astype("int64"),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.ones(n),
            "props": [""] * n,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = approx_distinct_users_per_type(str(sf)).to_pandas()
        exact = df.groupby("event_type")["user_id"].nunique()
        for _, row in got.iterrows():
            e = exact[row["event_type"]]
            assert abs(row["approx_users"] - e) / e < 0.05

    def test_split_deterministic_and_proportioned(self, ray_session,
                                                  tmp_path):
        from kit_ray.pipelines.dataops import train_test_split_docs

        df = pd.DataFrame({
            "doc_id": np.arange(5000, dtype="int64"),
            "text": ["x"] * 5000,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        a = train_test_split_docs(str(sf)).to_pandas().sort_values("doc_id")
        b = train_test_split_docs(str(sf)).to_pandas().sort_values("doc_id")
        assert a["split"].tolist() == b["split"].tolist()  # reproducible
        frac = (a["split"] == "train").mean()
        assert 0.75 < frac < 0.85

    def test_sample_per_type_matches_global_rank(self, ray_session,
                                                 tmp_path):
        from kit_ray.pipelines.dataops import (_SPLIT_MULT,
                                               sample_events_per_type)

        rng = np.random.default_rng(5)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.ones(n),
            "props": [""] * n,
        })
        sf = tmp_path / "sf"; sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = sample_events_per_type(str(sf), n=4).to_pandas()
        h = (df["event_id"].to_numpy(np.uint64)
             * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
        ref = df.assign(h=h.astype("int64")).sort_values(
            ["event_type", "h", "event_id"]).groupby(
            "event_type", sort=False).head(4)
        assert sorted(got["event_id"]) == sorted(ref["event_id"])
        assert set(got.columns) == {"event_id", "event_type", "user_id"}


class TestTermStats:
    """Term frequency / document frequency ops."""

    def _docs(self, tmp_path):
        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype="int64"),
            "text": [
                "the cat sat on the mat",
                "The Cat! ate;  the42 fish",
                "dogs and cats and dogs",
                "",
                "fish fish fish",
                "the end",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": np.zeros(6, dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")
        return str(sf), df

    def test_top_terms_exact_counts(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import top_terms

        sf, df = self._docs(tmp_path)
        got = top_terms(sf, n=5).to_pandas()
        # reference counts by the same tokenizer, independently coded
        import re
        from collections import Counter

        c = Counter()
        for t in df["text"]:
            c.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got_pairs = list(zip(got["term"], got["cnt"]))
        assert got_pairs == want

    def test_term_doc_freq_and_idf(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import term_doc_freq

        sf, df = self._docs(tmp_path)
        got = term_doc_freq(sf, min_df=2).to_pandas().set_index("term")
        # 'the' in docs 0,1,5; 'cat' in 0,1; 'fish' in 1,4; 'dogs' df=1
        assert got.loc["the", "df_cnt"] == 3
        assert got.loc["cat", "df_cnt"] == 2
        assert got.loc["fish", "df_cnt"] == 2
        assert "dogs" not in got.index  # min_df filter
        assert abs(got.loc["cat", "idf"] - round(np.log(6 / 2), 6)) < 1e-9


class TestBM25:
    def test_bm25_matches_reference(self, ray_session, tmp_path):
        """Independent dense BM25 reference (explicit loops) vs the
        two-pass distributed implementation."""
        import math
        import re

        from kit_ray.pipelines.dataops import bm25_search

        texts = [
            "hash join hash join stream",
            "the quick stream",
            "nothing relevant here",
            "join",
            "hash hash hash hash hash",
            "stream stream join hash",
        ]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        terms = ["hash", "join", "stream"]
        toks = [
            [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for t in texts
        ]
        n = len(texts)
        avgdl = sum(len(t) for t in toks) / n
        k1, b = 1.2, 0.75
        want = {}
        for i, tk in enumerate(toks):
            s = 0.0
            for term in terms:
                tf = tk.count(term)
                if tf == 0:
                    continue
                dfc = sum(1 for t2 in toks if term in t2)
                idf = math.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(tk) / avgdl))
            if s > 0:
                want[i] = round(s, 6)

        got = bm25_search(str(sf), k=10).to_pandas()
        assert set(got["doc_id"]) == set(want)
        for _, r in got.iterrows():
            assert abs(r["score"] - want[r["doc_id"]]) < 1e-9
        # ordering: rounded score desc, doc_id asc
        key = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got["doc_id"].tolist() == [d for d, _ in key]


class TestReadBoundaryClean:
    def test_read_strips_file_schema_metadata(self, ray_session, tmp_path):
        """Pandas-written parquet carries b'pandas' footer metadata that
        makes pa.Schema unhashable in shuffles; _read must strip it."""
        from kit_ray.pipelines.dataops import _read

        df = pd.DataFrame({"doc_id": np.arange(10, dtype="int64"),
                           "text": ["x"] * 10})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")  # pandas writer: metadata
        import pyarrow.parquet as pq
        assert pq.read_schema(sf / "documents.parquet").metadata  # precondition

        ds = _read(str(sf), "documents")
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            assert not b.schema.metadata
            hash(b.schema)  # must be hashable for shuffle schema dedup


class TestTfidfTopTerms:
    def test_tfidf_matches_reference(self, ray_session, tmp_path):
        import math
        import re
        from collections import Counter

        from kit_ray.pipelines.dataops import tfidf_top_terms

        texts = [
            "apple apple banana cherry",
            "banana cherry cherry date",
            "apple date date date",
            "everyword everyword",
        ]
        # 'date' appears in 2 docs; every doc has distinct profiles
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        toks = [
            [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for t in texts
        ]
        n = len(texts)
        dfc = Counter()
        for tk in toks:
            dfc.update(set(tk))
        want = {}
        for i, tk in enumerate(toks):
            scores = []
            for term, tf in Counter(tk).items():
                s = round(tf * math.log(n / dfc[term]), 6)
                if s > 0:
                    scores.append((term, s))
            scores.sort(key=lambda kv: (-kv[1], kv[0]))
            want[i] = scores[:3]

        got = tfidf_top_terms(str(sf), k=3).to_pandas()
        for i, pairs in want.items():
            g = got[got["doc_id"] == i]
            gp = list(zip(g["term"], g["score"]))
            # order within doc: score desc, term asc (already sorted)
            assert gp == pairs, (i, gp, pairs)


class TestTopBigrams:
    def test_bigrams_match_reference(self, ray_session, tmp_path):
        import re
        from collections import Counter

        from kit_ray.pipelines.dataops import top_bigrams

        texts = [
            "the cat sat on the mat",
            "the cat ate",
            "one",          # single token: no bigram
            "",             # empty
            "cat sat, cat sat",  # punctuation does not pair across it? it does: tokens are cat sat cat sat
        ]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.zeros(len(texts), dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        c = Counter()
        for t in texts:
            toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

        got = top_bigrams(str(sf), k=10).to_pandas()
        assert list(zip(got["bigram"], got["cnt"])) == want


class TestWeightedSample:
    def test_weighted_sample_matches_reference(self, ray_session, tmp_path):
        import math

        from kit_ray.pipelines.dataops import (_SPLIT_MULT,
                                               weighted_sample_events)

        rng = np.random.default_rng(7)
        m = 3000
        df = pd.DataFrame({
            "event_id": np.arange(m, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.zeros(m, dtype="int64"),
            "event_type": rng.choice(["a", "b", "c"], m),
            "value": rng.exponential(5, m),
            "props": [""] * m,
        })
        df.loc[0, "value"] = 0.0  # excluded by w > 0
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "events.parquet")

        # dense reference: ln(u)/w, top-5 per group
        ref = df[df["value"] > 0].copy()
        h = (ref["event_id"].to_numpy(np.uint64)
             * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32)
        ref["lnkey"] = np.log((h.astype(np.float64) + 0.5) / 2**32) \
            / ref["value"].to_numpy(np.float64)
        ref = ref.sort_values(["event_type", "lnkey", "event_id"],
                              ascending=[True, False, True])
        want = ref.groupby("event_type").head(5)

        got = weighted_sample_events(str(sf)).to_pandas()
        assert len(got) == len(want)
        assert set(got["event_id"]) == set(want["event_id"])
        assert 0 not in set(got["event_id"])

    def test_weighted_sample_favors_heavy_weights(self, ray_session,
                                                  tmp_path):
        """A huge-weight item should (deterministically, via the E-S
        key) appear in the sample: u^(1/w) -> 1 as w -> inf."""
        from kit_ray.pipelines.dataops import weighted_sample_events

        m = 500
        df = pd.DataFrame({
            "event_id": np.arange(m, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.zeros(m, dtype="int64"),
            "event_type": ["x"] * m,
            "value": np.ones(m) * 0.001,
            "props": [""] * m,
        })
        df.loc[42, "value"] = 1e9
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        got = weighted_sample_events(str(sf)).to_pandas()
        assert 42 in set(got["event_id"])


class TestLeftOuterJoin:
    def test_customer_order_counts(self, ray_session, tmp_path):
        from kit_ray.pipelines.dataops import customer_order_counts

        cust = pd.DataFrame({
            "c_custkey": np.array([1, 2, 3, 4], dtype="int64"),
            "c_name": ["a", "b", "c", "d"],
        })
        orders = pd.DataFrame({
            "o_custkey": np.array([1, 1, 3, 1], dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        cust.to_parquet(sf / "customer.parquet")
        orders.to_parquet(sf / "orders.parquet")

        got = customer_order_counts(str(sf)).to_pandas() \
            .sort_values("c_custkey").reset_index(drop=True)
        assert got["n_orders"].tolist() == [3, 0, 1, 0]
        assert got["c_name"].tolist() == ["a", "b", "c", "d"]


class TestPrepareTrainingCorpus:
    def test_composite_pipeline_reference(self, ray_session, tmp_path):
        import re

        from kit_ray.pipelines.dataops import (_SPLIT_MULT,
                                               prepare_training_corpus)

        long_en = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype="int64"),
            "text": [
                long_en,                 # kept (train/test by hash)
                long_en,                 # exact dup of 0 -> dropped
                "short text",            # < 10 tokens -> dropped
                long_en + " extra",      # kept
                long_en + " more",       # kept
                long_en + " autre",      # lang fr -> dropped
            ],
            "lang": ["en", "en", "en", "en", "en", "fr"],
            "source": ["s"] * 6,
            "n_chars": np.zeros(6, dtype="int64"),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "documents.parquet")

        got = prepare_training_corpus(str(sf)).set_index("split")

        # independent reference
        kept = {}
        for _, r in df.iterrows():
            if r["lang"] != "en":
                continue
            toks = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower())
                    if w]
            if len(toks) < 10:
                continue
            if r["text"] not in kept:
                kept[r["text"]] = (r["doc_id"], len(toks))
        want = {"train": [0, 0], "test": [0, 0]}
        for doc_id, ntok in kept.values():
            h = (np.uint64(doc_id) * np.uint64(_SPLIT_MULT)) % np.uint64(2**32)
            s = "train" if int(h) % 100 < 80 else "test"
            want[s][0] += 1
            want[s][1] += ntok
        for s, (nd, tt) in want.items():
            if nd == 0:
                assert s not in got.index
            else:
                assert got.loc[s, "n_docs"] == nd
                assert got.loc[s, "total_tokens"] == tt


class TestCopartitionAttach:
    def test_attach_dedups_and_inner_joins(self, ray_session):
        """The tagged-union attach exchange must (a) collapse duplicate
        candidate pairs exactly (key-complete blocks), (b) attach the
        right text per key, and (c) drop pairs whose key has no doc row
        (inner semantics)."""
        import pyarrow as pa
        import ray.data as rd

        from kit_ray.pipelines.dataops import _copartition_attach

        pairs = pd.DataFrame({
            "doc_id_a": [1, 1, 2, 9],   # 9 has no doc row
            "doc_id_b": [2, 2, 3, 1],   # (1,2) duplicated across blocks
        })
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["one", "two", "three"],
        })
        out = _copartition_attach(
            rd.from_pandas(pairs).repartition(3),
            rd.from_pandas(docs).repartition(2),
            "doc_id_a", carry=[("doc_id_b", pa.int64())],
            text_out="text_a", nparts=3, dedup_carry=["doc_id_b"],
        ).to_pandas().sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
        want = pd.DataFrame({
            "doc_id_a": [1, 2],
            "doc_id_b": [2, 3],
            "text_a": ["one", "two"],
        })
        pd.testing.assert_frame_equal(
            out.astype({"doc_id_a": "int64", "doc_id_b": "int64"}), want)
