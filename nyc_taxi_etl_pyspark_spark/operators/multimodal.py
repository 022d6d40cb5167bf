"""Multimodal (image/audio/video) column operators — SURVEY.md §2.12.

Design: media are **opaque ``binary`` columns with typed metadata**, as in
large-scale training-data pipelines. The decode / feature-extract / frame-
sample steps run as Arrow-batched ``mapInPandas`` transforms — the real
100 TB plumbing (schema contract, partition-preserving batch iteration,
pandas/numpy inside, zero driver involvement). Two decode backends:
``decode_backend="real"`` decodes netpbm (PPM/PGM) and BMP headers via
vendored dependency-free parsers and everything else via PIL when
importable (round 11: the real branch EXECUTES — and is tested
end-to-end — even in this container, which ships no PIL/ffmpeg;
``NotImplementedError`` only for formats genuinely needing an absent
codec library); the default ``"fake"`` backend derives deterministic
pseudo-features from the payload bytes so the whole pipeline is
testable end-to-end and oracle-checkable.

Scale notes: mapInPandas streams Arrow record batches (no per-row Python
overhead, no collect); each output row carries only metadata + small
feature vectors, never the decoded raster, so shuffle volume stays
O(rows), not O(pixels). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def attach_payload(df: DataFrame, src_col: str, media_type: str) -> DataFrame:
    """Wrap a source column as an opaque multimodal payload: ``payload``
    (binary) + typed metadata columns. On a real corpus the binary comes
    from the lakehouse (parquet/AVRO binary column); fixtures synthesize
    it from text."""
    payload = F.col(src_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_type", F.lit(media_type)
    )


# Output contract of decode_features — fixed schema, engine-wide.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", IntegerType()),
        StructField("payload_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("byte_histogram", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dimensions derived from payload size
    only (so a SQL oracle can reproduce them). Stands in for PIL's
    ``Image.open(io.BytesIO(payload)).size``."""
    n = len(payload)
    return 16 + n % 624, 16 + (n * 7) % 464, 3


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int] | None:
    """Header parse of the netpbm family (P2/P3 ASCII, P5/P6 binary):
    magic, then whitespace/comment-separated width and height. Returns
    (width, height, channels) or None when the payload isn't netpbm.
    Pure Python, no dependencies — a REAL format decoder for the one
    image family simple enough to vendor."""
    if len(payload) < 2 or payload[0:1] != b"P":
        return None
    magic = payload[0:2]
    channels = {b"P2": 1, b"P5": 1, b"P3": 3, b"P6": 3}.get(magic)
    if channels is None:
        return None
    # tokenize past comments ('#' to end of line), collect 2 ints
    vals: list[int] = []
    i = 2
    n = len(payload)
    while i < n and len(vals) < 2:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            return None  # malformed header
    if len(vals) < 2 or vals[0] <= 0 or vals[1] <= 0:
        return None
    return vals[0], vals[1], channels


def _parse_bmp_header(payload: bytes) -> tuple[int, int, int] | None:
    """Header parse of Windows BMP (BITMAPINFOHEADER and later): 'BM'
    magic, little-endian int32 width at offset 18 / height at 22,
    uint16 bits-per-pixel at 28. Height may be negative (top-down
    rows). Returns (width, height, channels) or None when not BMP."""
    import struct

    if len(payload) < 30 or payload[0:2] != b"BM":
        return None
    try:
        width, height = struct.unpack_from("<ii", payload, 18)
        bits = struct.unpack_from("<H", payload, 28)[0]
    except struct.error:
        return None
    if width <= 0 or height == 0 or bits == 0:
        return None
    return width, abs(height), max(bits // 8, 1)


def _real_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image decode: PIL when importable (``pip install pillow``
    on a real cluster — covers every mainstream codec via a lazy
    header-only open), else the vendored dependency-free header
    parsers for the uncompressed netpbm (PPM/PGM) and BMP formats —
    so the real branch EXECUTES (and is tested end-to-end through
    mapInPandas) even in this container, which ships no PIL. Raises
    ``NotImplementedError`` only for formats needing a codec library
    that is genuinely absent. Returns (width, height, n_channels)
    from the actual image header — header-parse cost, never a full
    raster decode. Audio/video payloads want torchaudio/pyav wired
    into the same (bytes) -> (dims) contract."""
    dims = _parse_ppm_header(payload) or _parse_bmp_header(payload)
    if dims is not None:
        return dims
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real media decode for this format requires PIL (pillow), "
            "which this environment does not ship; PPM/PGM/BMP decode "
            "via the vendored header parsers, and decode_backend="
            "'fake' is the deterministic test path for everything else"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        n_channels = len(img.getbands())
    return width, height, n_channels


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hist_bins: int = 8,
    decode_backend: str = "fake",
) -> DataFrame:
    """Arrow-batched media feature extraction via ``mapInPandas``.

    Per payload: byte length, md5 digest, (pseudo-)decoded raster shape,
    and an ``hist_bins``-bin byte-value histogram (numpy, vectorized per
    batch) — the kind of cheap signal used for corpus QA / near-dup
    triage before an expensive model pass. Partition-preserving: no
    shuffle, output rows 1:1 with input rows.
    """
    decode = {"fake": _fake_decode, "real": _real_decode}[decode_backend]

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode(p) for p in payloads]
            bin_width = 256 // hist_bins
            hists = [
                (
                    np.bincount(
                        np.frombuffer(p, dtype=np.uint8) // bin_width,
                        minlength=hist_bins,
                    )[:hist_bins]
                    / max(len(p), 1)
                ).tolist()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_bytes": [len(p) for p in payloads],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "byte_histogram": hists,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=DECODE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Uniform frame sampling over a video-like payload via ``mapInPandas``
    (1 → ``n_frames`` fan-out inside the Python worker, no explode
    shuffle). Frames are byte-slices at uniform offsets — the REAL
    decoder (pyav keyframe extraction) plugs into the same contract; see
    ``_real_decode``. Payloads shorter than ``n_frames`` bytes yield one
    frame per available byte."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame_md5": [],
            }
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                n = min(n_frames, max(len(p), 1))
                step = max(len(p) // n, 1)
                for i in range(n):
                    off = i * step
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_md5"].append(
                        hashlib.md5(p[off : off + step]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("est_bytes", LongType()),
    ]
)


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_side: int = 224,
    decode_backend: str = "fake",
) -> DataFrame:
    """Aspect-preserving resize-to-fit (``max_side`` box) via
    ``mapInPandas`` — the standard image-normalization step before a
    vision-model pass. Pure integer math on the (pseudo-)decoded raster
    shape, so the fake backend is SQL-reproducible and oracle-checked;
    the real backend (PIL ``Image.thumbnail`` + re-encode) plugs into the
    same contract and is stubbed like ``_real_decode``. Output carries
    dims + an output-size estimate, never pixel data — shuffle volume
    stays O(rows) at any corpus size."""
    decode = {"fake": _fake_decode, "real": _real_decode}[decode_backend]

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ = decode(p)
                m = max(w, h)
                if m <= max_side:
                    nw, nh = w, h
                else:
                    nw, nh = w * max_side // m, h * max_side // m
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["new_width"].append(nw)
                out["new_height"].append(nh)
                out["est_bytes"].append(len(p) * (nw * nh) // (w * h))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )
