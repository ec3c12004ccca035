"""Deterministic image payload generation + pure-Python PNG codec.

The fetched-page payload of the north rule is an image+caption row with
schema (image_id, bytes, w, h, fmt, caption, phash) — BASELINE.json
``input_hint``. The sandbox has no network and no Pillow, so pages are
synthesized deterministically from the URL: the same URL always yields
the same pixels, caption and perceptual hash, which is what lets the
engine's fetched rows be verified bit-for-bit (lossless fmt) /
PSNR>=40dB (lossy path, code-complete but the corpus stays lossless)
against the reference rows.

PNG here is a minimal valid subset: 8-bit RGB, no interlace, filter 0
rows, one IDAT — encodable and decodable with stdlib zlib only.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

ADJECTIVES = (
    "amber", "quiet", "rapid", "vivid", "dusty", "pale", "bright", "rusty",
    "sleek", "hollow", "mellow", "brisk", "solar", "stormy", "gentle", "stark",
)
NOUNS = (
    "harbor", "lantern", "meadow", "summit", "canyon", "orchard", "glacier",
    "estuary", "thicket", "plateau", "mesa", "delta", "grove", "ridge",
    "basin", "archipelago",
)


def stable_hash(*parts: str | bytes, digest_size: int = 8) -> int:
    """Deterministic 64-bit hash (blake2b) — process- and
    machine-independent, unlike Python's builtin hash()."""
    h = hashlib.blake2b(digest_size=digest_size)
    for p in parts:
        h.update(p.encode("utf-8") if isinstance(p, str) else p)
        h.update(b"\x1f")
    return int.from_bytes(h.digest(), "little")


# ---------------------------------------------------------------------------
# PNG codec (RGB8, filter 0)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG byte string."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    # Level 1: the synthetic pixels are random (incompressible); higher
    # levels only burn CPU in the fetch hot path.
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 1))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode the PNG subset written by :func:`png_encode` (plus filters
    1/2 for robustness) back to an (h, w, 3) uint8 array."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert depth == 8 and ctype == 2 and interlace == 0, "unsupported PNG subset"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    # Fast path: every row filter is 0 (what png_encode writes) — the
    # whole image decodes with one reshape, no per-row Python.
    mat = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    if not mat[:, 0].any():
        return mat[:, 1:].reshape(h, w, 3).copy()
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = row.copy()
            for x in range(3, stride):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images) — the
    north rule's lossy-format invariant is PSNR >= 40 dB."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# Deterministic page payloads
# ---------------------------------------------------------------------------

def make_pixels(url: str, seed: int, scale: int = 1) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for a URL. ``scale``
    multiplies the dimensions (used by benches to make per-URL fetch
    work dominant, as real image payloads would be)."""
    k = stable_hash("pixels", str(seed), url)
    w = (24 + (k % 33)) * scale
    h = (16 + ((k >> 8) % 25)) * scale
    rng = np.random.default_rng(k)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def average_phash(pixels: np.ndarray) -> int:
    """8x8 average perceptual hash over the grayscale image, packed into
    a signed 64-bit int (column layout of the ``phash`` field)."""
    gray = pixels.mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = gray[np.ix_(ys, xs)]
    bits = (cells > cells.mean()).ravel().astype(np.uint8)
    # bit i of the hash = bits[i] (little-endian pack).
    packed = np.packbits(bits, bitorder="little").tobytes()
    val = int.from_bytes(packed, "little")
    return val - (1 << 64) if val >= (1 << 63) else val


def make_caption(url: str, seed: int) -> str:
    k = stable_hash("caption", str(seed), url)
    adj = ADJECTIVES[k % len(ADJECTIVES)]
    noun = NOUNS[(k >> 16) % len(NOUNS)]
    return f"a photo of the {adj} {noun}"


def q6_encode(pixels: np.ndarray) -> bytes:
    """Deterministic LOSSY codec: 6-bit quantization per channel. Stands
    in for jpeg/webp (no lossy codec libs in this container) so the
    PSNR >= 40 dB invariant is exercised for real: uniform 4-level
    quantization error gives PSNR ~ 20*log10(255/(4/sqrt(12))) ≈ 47 dB.
    """
    h, w, _ = pixels.shape
    return struct.pack(">II", w, h) + (pixels >> 2).astype(np.uint8).tobytes()


def q6_decode(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    q = np.frombuffer(data, np.uint8, w * h * 3, 8).reshape(h, w, 3)
    # Reconstruct mid-rise: v*4 + 2 keeps error in [-2, 2).
    return (q.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)


def make_image_row(url: str, seed: int, scale: int = 1) -> dict:
    """The full image+caption row for a fetched URL, matching
    BASELINE.json input_hint exactly: (image_id, bytes, w, h, fmt,
    caption, phash). fmt rotates raw/q6/png — q6 is the LOSSY path
    (decoded pixels differ from the source; PSNR >= 40 dB invariant),
    raw/png are lossless (exact pixel equality)."""
    px = make_pixels(url, seed, scale)
    h, w, _ = px.shape
    k = stable_hash("fmt", str(seed), url)
    if k % 4 == 0:
        fmt, payload = "raw", px.tobytes()
    elif k % 4 == 1:
        fmt, payload = "q6", q6_encode(px)
    else:
        fmt, payload = "png", png_encode(px)
    return {
        "image_id": f"{stable_hash('id', str(seed), url):016x}",
        "bytes": payload,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": make_caption(url, seed),
        "phash": average_phash(px),
    }


def decode_image(row: dict) -> np.ndarray:
    """Decode a fetched row back to pixels (the per-row invariant check).
    Lossy formats (jpeg/webp) would be handled here too; those codecs
    are not available in this container, so they raise — the plumbing
    (schema, batching, PSNR check) is real and tested on lossless data."""
    if row["fmt"] == "raw":
        return np.frombuffer(row["bytes"], np.uint8).reshape(row["h"], row["w"], 3)
    if row["fmt"] == "png":
        return png_decode(row["bytes"])
    if row["fmt"] == "q6":
        return q6_decode(row["bytes"])
    raise NotImplementedError(f"codec for {row['fmt']!r} not available in this sandbox")
