"""Property-based fuzzing of the protocol kernels: arbitrary bytes must
never crash the parsers, and core invariants must hold on random
well-formed inputs."""

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from kit_ray.kernels.robots import ALL_UAS, Robots, Rule, RuleError, normalize_path
from kit_ray.kernels.sitemap import (
    Entry,
    LimitError,
    build_urlset,
    parse_plain,
    parse_sitemapindex,
    parse_urlset,
    sniff_format,
)
from kit_ray.kernels.urlkit import Url, try_parse


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048), st.text(max_size=30))
def test_robots_never_crashes(data, ua):
    r = Robots.from_bytes(data, ua)
    # Verdicts are total and boolean.
    assert r.is_relative_allowed("/") in (True, False)
    assert r.is_relative_allowed("/robots.txt") is True or r.is_always() is False
    # Cache round-trip preserves verdicts on a probe set.
    r2 = Robots.from_cache(r.to_cache())
    for p in ("/", "/a", "/a/b?c=d"):
        assert r.try_is_relative_allowed(p) == r2.try_is_relative_allowed(p)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_sitemap_parsers_never_crash(data):
    for fn in (parse_urlset, parse_sitemapindex, parse_plain):
        try:
            list(fn(data))
        except LimitError:
            pass
    assert sniff_format(data) in ("entry", "index", "plain")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_url_parse_total(s):
    u = try_parse(s)
    if u is not None and not u.cannot_be_a_base():
        # Serialization is a fixed point: parse(str(u)) == str(u).
        assert str(Url.parse(str(u))) == str(u)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=50))
def test_rule_match_total(pattern):
    try:
        rule = Rule.new(pattern, True)
    except RuleError:
        return
    for path in ("/", "/a/b", "/x?y=z"):
        assert rule.is_match(normalize_path(path)) in (True, False)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.booleans(),  # with lastmod?
            st.sampled_from([None, "daily", "weekly", "always", "never"]),
            st.sampled_from([None, 0.0, 0.3, 1.0]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_urlset_build_parse_round_trip(rows):
    entries = []
    for i, (n, has_mod, freq, pri) in enumerate(rows):
        e = Entry(Url.parse(f"https://h{n}.example/p/{i}?q={n}"))
        if has_mod:
            e.modified = datetime(2023, 1 + n % 12, 1 + n % 28, n % 24,
                                  tzinfo=timezone.utc)
        e.frequency = freq
        e.priority = pri
        entries.append(e)
    back = list(parse_urlset(build_urlset(entries)))
    assert [str(b.location) for b in back] == [str(e.location) for e in entries]
    for b, e in zip(back, entries):
        assert b.modified == e.modified
        assert b.frequency == e.frequency
        if e.priority is None:
            assert b.priority is None
        else:
            assert abs(b.priority - e.priority) < 0.051  # 1-decimal Display


# ---------------------------------------------------------------------------
# Vectorized hash kernels must equal their scalar definitions bit-for-bit
# ---------------------------------------------------------------------------

@settings(deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50))
def test_fnv1a_batch_equals_scalar(tokens):
    import numpy as np

    from kit_ray.functions.text import fnv1a_batch, hash_token

    got = fnv1a_batch(tokens)
    assert got.dtype == np.uint64
    assert got.tolist() == [hash_token(t) for t in tokens]


@settings(deadline=None)
@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=8, max_size=8),
       st.integers(1, 4))
def test_band_keys_batch_equals_bytewise_fnv(sig_vals, nrows):
    import numpy as np

    from kit_ray.functions.dedup import lsh_band_keys_batch
    from kit_ray.functions.text import to_i64

    sig = np.array(sig_vals, dtype=np.uint64)
    bands = len(sig) // nrows if len(sig) % nrows == 0 else 1
    rows = len(sig) // bands
    want = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        h = 0xCBF29CE484222325
        for v in chunk.tobytes():
            h = ((h ^ v) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        want.append(to_i64(h))
    assert lsh_band_keys_batch(sig[None, :], bands)[0].tolist() == want


def test_band_keys_batch_non_divisible_truncates():
    """num_perm not divisible by bands: trailing remainder rows are
    ignored (scalar-implementation parity), not a ValueError."""
    import numpy as np

    from kit_ray.functions.dedup import lsh_band_keys_batch

    rng = np.random.default_rng(7)
    sigs = rng.integers(0, 1 << 63, size=(5, 10), dtype=np.uint64)
    got = lsh_band_keys_batch(sigs, bands=3)  # 10 // 3 = 3 rows, 1 dropped
    want = lsh_band_keys_batch(np.ascontiguousarray(sigs[:, :9]), bands=3)
    assert got.shape == (5, 3)
    assert (got == want).all()


@settings(deadline=None)
@given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1), min_size=1,
                max_size=64))
def test_popcount64_equals_bin_count(vals):
    import numpy as np

    from kit_ray.pipelines.dataops import _popcount64

    arr = np.array(vals, dtype=np.int64)
    want = [bin(v & 0xFFFFFFFFFFFFFFFF).count("1") for v in vals]
    assert _popcount64(arr).tolist() == want
