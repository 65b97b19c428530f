"""Codec unit tests (pure numpy, no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from raster_processor_spark import codec


def test_raw_roundtrip_lossless():
    for iid in ("img_000000000000", "img_000000000042"):
        w, h = codec.dims_for(iid)
        px = codec.gen_pixels(iid, w, h)
        out = codec.decode(codec.encode(px, "raw"), w, h, "raw")
        assert np.array_equal(px, out)


def test_q8_psnr_above_40db():
    for i in range(20):
        iid = f"img_{i:012d}"
        w, h = codec.dims_for(iid)
        px = codec.gen_pixels(iid, w, h)
        out = codec.decode(codec.encode(px, "q8"), w, h, "q8")
        assert codec.psnr(px, out) >= 40.0
        assert np.max(np.abs(px.astype(int) - out.astype(int))) <= 1


def test_unknown_fmt_is_stubbed():
    px = codec.gen_pixels("img_000000000001", 16, 16)
    with pytest.raises(NotImplementedError):
        codec.encode(px, "jpeg")
    with pytest.raises(NotImplementedError):
        codec.decode(b"x", 16, 16, "webp")


def test_phash_stable_and_positive():
    iid = "img_000000000007"
    w, h = codec.dims_for(iid)
    px = codec.gen_pixels(iid, w, h)
    p1, p2 = codec.phash64(px), codec.phash64(px.copy())
    assert p1 == p2 and p1 >= 0
    # a different image gets a different hash (overwhelmingly)
    px2 = codec.gen_pixels("img_000000000008", w, h)
    assert codec.phash64(px2) != p1


def test_determinism_across_calls():
    a = codec.gen_pixels("img_000000000099", 32, 16)
    b = codec.gen_pixels("img_000000000099", 32, 16)
    assert np.array_equal(a, b)
    assert codec.caption_for("img_000000000099") == codec.caption_for("img_000000000099")
