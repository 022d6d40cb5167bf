"""Multimodal operator tests: Arrow batch shape, deterministic fake
decode, histogram math, frame fan-out, and the real-decode stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.operators.multimodal import (
    attach_payload,
    decode_features,
    frame_sample,
)
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


def test_decode_features_values(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    rows = decode_features(attach_payload(d, "text", "image")).collect()
    src = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(rows) == len(src)
    for r in rows:
        payload = src[r["doc_id"]].encode()
        n = len(payload)
        assert r["payload_bytes"] == n
        assert r["payload_md5"] == hashlib.md5(payload).hexdigest()
        assert (r["width"], r["height"], r["n_channels"]) == (
            16 + n % 624,
            16 + (n * 7) % 464,
            3,
        )
        # histogram: 8 bins over byte values, normalized to sum ~1
        assert len(r["byte_histogram"]) == 8
        assert abs(sum(r["byte_histogram"]) - 1.0) < 1e-9
        # fixture text is lowercase ascii + spaces → bytes in [32, 127]
        assert r["byte_histogram"][0] == 0.0 or min(payload) < 32


def test_frame_sample_fanout(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    frames = frame_sample(attach_payload(d, "text", "video"), n_frames=4)
    pdf = frames.toPandas()
    src = {r["doc_id"]: r["text"].encode() for r in d.collect()}
    for doc_id, p in src.items():
        grp = pdf[pdf.doc_id == doc_id].sort_values("frame_idx")
        n = min(4, max(len(p), 1))
        step = max(len(p) // n, 1)
        assert list(grp.frame_idx) == list(range(n))
        assert list(grp.frame_offset) == [i * step for i in range(n)]
        assert list(grp.frame_md5) == [
            hashlib.md5(p[i * step : i * step + step]).hexdigest() for i in range(n)
        ]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="PIL installed: real backend is live, not stubbed"
)
def test_real_decode_raises_only_without_pil(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(1)
    df = decode_features(attach_payload(d, "text", "image"), decode_backend="real")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        df.collect()


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_real_decode_reads_actual_image_headers(spark):
    """With PIL present, decode_backend='real' must return true raster
    dimensions from the image header through the same mapInPandas
    contract as the fake backend."""
    import io

    from PIL import Image

    def png_bytes(w: int, h: int) -> bytes:
        buf = io.BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(320, 200)), (2, png_bytes(64, 480))]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_channels"])
        for r in decode_features(df, decode_backend="real").collect()
    }
    assert got == {1: (320, 200, 3), 2: (64, 480, 3)}


def test_no_shuffle_in_decode_plan(spark, sf_dir):
    """decode_features must be partition-preserving — no Exchange."""
    d = load_table(spark, sf_dir, "documents")
    plan = (
        decode_features(attach_payload(d, "text", "image"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
