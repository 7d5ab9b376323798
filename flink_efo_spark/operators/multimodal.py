"""Multimodal column plumbing (north-star extension, beyond the
reference's relational surface).

Convention: media rides as an opaque ``binary`` column plus a typed
metadata struct; all per-item work is Arrow-batched ``mapInPandas``
(never row-at-a-time UDFs), so the same pipeline shape scales to a
100 TB corpus — the binary payloads stream through executors batch by
batch and are never collected.

Real here: the Spark-side plumbing — schemas, batch iteration, header
parsing (pure-python PNG/JPEG/GIF sniffing), deterministic feature
extraction, partition sizing. Stubbed here (clearly): pixel decode /
resample, because no image/audio codec libraries exist in this
container — ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic md5-derived feature
vector with the exact schema and batch shape a real decoder would
produce.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def _sniff(data: bytes) -> tuple[str | None, int | None, int | None]:
    """Header-only media sniffing — pure python, no codec libs.
    PNG IHDR, GIF logical screen, JPEG SOF0/2 scan."""
    if data is None or len(data) < 10:
        return None, None, None
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach a ``meta`` struct (format/width/height/n_bytes) parsed
    from binary headers — Arrow-batched, streams through executors."""
    import pandas as pd

    out_schema = StructType(df.schema.fields + [StructField("meta", MEDIA_META_SCHEMA)])

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = []
            for data in pdf[content_col]:
                b = bytes(data) if data is not None else None
                fmt, w, h = _sniff(b)
                metas.append(
                    {
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "n_bytes": len(b) if b is not None else None,
                    }
                )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(fn, out_schema)


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract each image into ``features``
    (array<float>, length ``feature_dim``).

    STUB: pixel decoding needs an image codec library that is not in
    this container. ``fake=True`` produces a deterministic md5-derived
    vector — identical schema, batch shape and partitioning to a real
    decoder, so the surrounding pipeline (metadata joins, ANN over
    the features, dedup) is fully exercisable.
    """
    if not fake:
        raise NotImplementedError(
            "pixel decode requires an image codec library (PIL/cv2) not "
            "present in this environment; pass fake=True for the "
            "deterministic stand-in decoder"
        )
    import pandas as pd

    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(FloatType()))]
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for data in pdf[content_col]:
                if data is None:
                    feats.append(None)
                    continue
                d = hashlib.md5(bytes(data)).digest()
                feats.append(
                    [
                        struct.unpack(">H", d[2 * i : 2 * i + 2])[0] / 65535.0
                        for i in range(feature_dim)
                    ]
                )
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(fn, out_schema)


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling STUB with real plumbing: emits one row per
    sampled 'frame' (byte-offset slice) — the explode shape a real
    frame sampler produces. Row explosion happens executor-side."""
    import pandas as pd

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("frame_offset", IntegerType()),
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name != content_col]

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            # vectorized explode: frames-per-row, then index-repeat —
            # no per-row python loop (the iterrows version cost ~20×
            # at Arrow-batch granularity)
            sizes = (
                pdf[content_col]
                .map(lambda d: len(d) if d is not None else 0)
                .to_numpy()
            )
            n_frames = np.minimum(
                -(-sizes // every_n_bytes), max_frames
            ).astype(int)
            rep = pdf[keep].loc[pdf.index.repeat(n_frames)].reset_index(
                drop=True
            )
            idx = (
                np.concatenate([np.arange(k) for k in n_frames if k])
                if n_frames.sum()
                else np.array([], dtype=int)
            )
            rep["frame_idx"] = idx.astype("int32")
            rep["frame_offset"] = (idx * every_n_bytes).astype("int32")
            yield rep

    return df.mapInPandas(fn, out_schema)
