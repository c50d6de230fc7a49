"""Multimodal operator tests: synthetic TN* containers exercise the real
mapInPandas plumbing; the codec stub's boundary (NotImplementedError on
real formats) is part of the contract."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.multimodal import (
    byte_stats,
    decode_media,
    encode_tnaud,
    encode_tnimg,
    encode_tnvid,
    resize_images,
    sample_video_frames,
    sniff_media_type,
)


@pytest.fixture(scope="module")
def media_df(spark):
    img = encode_tnimg(8, 4, bytes(range(32)))
    aud = encode_tnaud(16000, bytes([5, 250, 17] * 10))
    vid = encode_tnvid(2, 2, [bytes([i] * 4) for i in range(5)])
    jpeg_ish = bytes.fromhex("ffd8ffe0") + b"\x00" * 16
    png_ish = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 16
    rows = [
        (1, img), (2, aud), (3, vid), (4, jpeg_ish), (5, png_ish),
        (6, b"garbage-bytes"),
    ]
    return spark.createDataFrame(rows, "media_id int, content binary")


def test_sniff_media_type(spark, media_df):
    got = {
        r["media_id"]: r["mt"]
        for r in media_df.select(
            "media_id", sniff_media_type("content").alias("mt")
        ).collect()
    }
    assert got == {
        1: "application/x-tnimg",
        2: "application/x-tnaud",
        3: "application/x-tnvid",
        4: "image/jpeg",
        5: "image/png",
        6: "application/octet-stream",
    }


def test_decode_media_metadata(spark, media_df):
    tn_only = media_df.filter(
        sniff_media_type("content").startswith("application/x-tn")
    )
    rows = {r["media_id"]: r for r in decode_media(tn_only).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (8, 4, 1)
    assert bytes(rows[1]["payload"]) == bytes(range(32))
    assert rows[2]["sample_rate"] == 16000 and len(rows[2]["payload"]) == 30
    assert (rows[3]["n_frames"], rows[3]["width"], rows[3]["height"]) == (5, 2, 2)


def _pillow_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(
    _pillow_available(),
    reason="Pillow installed: real image magics route to the adapter",
)
def test_decode_stub_raises_on_real_codec(spark, media_df):
    jpeg_only = media_df.filter("media_id = 4")
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_media(jpeg_only).collect()


@pytest.mark.skipif(
    not _pillow_available(),
    reason="Pillow not installed in this container (TN* formats are the oracle path)",
)
def test_decode_real_png_via_pillow_adapter(spark):
    """Optional real-codec path: a genuine PNG decodes through the SAME
    mapInPandas plumbing as the TN* formats, emitting the identical
    schema with an 8-bit grayscale payload."""
    import io

    import numpy as np
    from PIL import Image

    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id int, content binary"
    )
    row = decode_media(df).collect()[0]
    assert row["media_type"] == "image/png"
    assert (row["width"], row["height"], row["n_frames"]) == (8, 6, 1)
    assert bytes(row["payload"]) == px.tobytes()


def test_resize_nearest_neighbor(spark):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [(1, encode_tnimg(8, 8, img.tobytes()))], "media_id int, content binary"
    )
    out = resize_images(df, 4, 4).collect()[0]
    decoded = decode_media(
        spark.createDataFrame([(1, bytes(out["content"]))], "media_id int, content binary")
    ).collect()[0]
    assert (decoded["width"], decoded["height"]) == (4, 4)
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(4) * 8) // 4
    expect = img[np.ix_(yi, xi)].tobytes()
    assert bytes(decoded["payload"]) == expect


def test_sample_video_frames(spark, media_df):
    vid = media_df.filter("media_id = 3")
    frames = sample_video_frames(vid, every_n=2).orderBy("frame_idx").collect()
    assert [f["frame_idx"] for f in frames] == [0, 2, 4]
    f2 = decode_media(
        spark.createDataFrame(
            [(0, bytes(frames[1]["frame"]))], "media_id int, content binary"
        )
    ).collect()[0]
    assert bytes(f2["payload"]) == bytes([2] * 4)


def test_byte_stats_matches_numpy(spark, media_df):
    rows = {r["media_id"]: r for r in byte_stats(media_df).collect()}
    for mid, blob in [(1, None)]:
        pass
    raw = {r["media_id"]: bytes(r["content"]) for r in media_df.collect()}
    for mid, blob in raw.items():
        data = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(data >> 4, minlength=16)
        r = rows[mid]
        assert r["size_bytes"] == len(blob)
        assert [r[f"h{i}"] for i in range(16)] == hist.tolist()
        ent = 0.0
        for c in hist:
            if c > 0:
                p = c / len(blob)
                ent -= p * math.log2(p)
        assert r["nibble_entropy"] == pytest.approx(round(ent, 6), abs=1e-9)


def test_sample_video_frames_empty_video(spark):
    """A zero-frame TNVID must contribute nothing, not crash the Arrow
    serializer with a column-less empty frame."""
    vid = encode_tnvid(2, 2, [])
    df = spark.createDataFrame([(1, vid)], "media_id int, content binary")
    assert sample_video_frames(df, every_n=2).count() == 0
