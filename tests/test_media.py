"""Video/audio operator invariants: the byte-offset frame seek slices the
same bytes a full decode would, payload generation is deterministic, and
the Spark plumbing emits the expected row grid."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from raster_processor_spark.operators import media as md

SF = "/root/testdata/sf0.01"


def test_frame_seek_matches_full_decode():
    buf = md.gen_video_bytes(7)
    full = np.frombuffer(buf, dtype=np.uint8).reshape(
        md.VID_FRAMES, md.FRAME_BYTES
    )
    for fi in range(0, md.VID_FRAMES, 4):
        off = fi * md.FRAME_BYTES
        sliced = np.frombuffer(buf[off : off + md.FRAME_BYTES], dtype=np.uint8)
        assert (sliced == full[fi]).all()


def test_payload_generation_deterministic():
    assert md.gen_video_bytes(3) == md.gen_video_bytes(3)
    assert md.gen_audio_bytes(3) == md.gen_audio_bytes(3)
    assert md.gen_video_bytes(3) != md.gen_video_bytes(4)


def test_frame_sample_row_grid(spark):
    ids = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").where(F.col("doc_id") < 10)
    )
    out = md.frame_sample(md.videos_from_ids(ids), every=4)
    rows = out.collect()
    assert len(rows) == 10 * (md.VID_FRAMES // 4)
    assert all(r.frame_idx % 4 == 0 for r in rows)
    assert all(0 < r.px_mean < 255 for r in rows)


def test_audio_window_grid(spark):
    ids = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").where(F.col("doc_id") < 5)
    )
    out = md.audio_features(md.audios_from_ids(ids)).collect()
    assert len(out) == 5 * md.AUD_WINDOWS
    assert all(r.energy > 0 for r in out)
    # the sawtooth crosses zero in every window
    assert all(r.zero_crossings > 0 for r in out)
