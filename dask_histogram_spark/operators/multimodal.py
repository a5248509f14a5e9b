"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked below) — but everything
Spark-side is real and tested: the schema contract, the
``mapInPandas`` batch shape, partition sizing, and the metadata
extraction path.  Swapping a real decoder in changes only the body of
``_fake_decode_rgb`` / ``_fake_waveform``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_fake_media",
    "image_meta_schema",
    "decode_image_features",
    "sample_audio_frames",
]

image_meta_schema = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic opaque ``binary`` media column + metadata
    struct keyed on the id — stands in for reading real image bytes
    from a lakehouse table."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            (F.pmod(F.col(id_col), F.lit(8)) * 64 + 64).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(6)) * 64 + 64).cast("int").alias("height"),
            F.lit("fake/rgb8").alias("format"),
        ),
    )


def _fake_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — deterministic fake image from the payload hash.

    Replace with e.g. PIL/libvips in a real deployment; raises clearly
    if asked for a format it does not understand.
    """
    if payload is None:
        raise NotImplementedError("real image decoding unavailable in this container")
    seed = int.from_bytes(payload[:8], "big", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          resize: tuple[int, int] = (32, 32)) -> DataFrame:
    """Decode -> resize -> channel-mean features via ``mapInPandas``.

    Real Spark plumbing: Arrow batches in, typed rows out; the batch
    loop is the pattern a real decoder drops into.  Output: (id, width,
    height, mean_r, mean_g, mean_b, feat: array<float>[12]).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("feat", T.ArrayType(T.FloatType())),
        ]
    )
    rh, rw = resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar shell (zip over numpy views, build column lists, one
        # DataFrame per batch): the decode is inherently per-row, but the
        # batch walk itself never goes through pandas row objects
        for pdf in it:
            cols: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for did, payload, meta in zip(
                pdf[id_col].to_numpy(), pdf["media"].to_numpy(),
                pdf["media_meta"].to_numpy(),
            ):
                img = _fake_decode_rgb(payload, meta["width"], meta["height"])
                # "resize": strided subsample to (rh, rw) — stands in for
                # a real interpolating resize
                ys = np.linspace(0, img.shape[0] - 1, rh).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, rw).astype(int)
                small = img[np.ix_(ys, xs)]
                quad = small.reshape(2, rh // 2, 2, rw // 2, 3).mean(axis=(1, 3))
                cols[id_col].append(did)
                cols["width"].append(int(meta["width"]))
                cols["height"].append(int(meta["height"]))
                cols["mean_r"].append(float(img[..., 0].mean()))
                cols["mean_g"].append(float(img[..., 1].mean()))
                cols["mean_b"].append(float(img[..., 2].mean()))
                cols["feat"].append(quad.astype(np.float32).ravel().tolist())
            yield pd.DataFrame(cols, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, "media", "media_meta").mapInPandas(
        batches, schema=out_schema
    )


def _fake_waveform(payload: bytes, n: int = 16000) -> np.ndarray:
    """STUB audio decode — deterministic sine mix from payload hash."""
    if payload is None:
        raise NotImplementedError("real audio decoding unavailable in this container")
    seed = int.from_bytes(payload[:8], "big", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f = rng.uniform(100, 1000)
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def sample_audio_frames(df: DataFrame, id_col: str = "doc_id",
                        frame_len: int = 400, hop: int = 4000) -> DataFrame:
    """Frame-sample an audio payload: (id, frame_idx, rms) rows.

    One input row fans out to n_frames rows — the mapInPandas contract
    for samplers/framers (schema change + row multiplication)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, rms = [], [], []
            for did, payload in zip(pdf[id_col].to_numpy(),
                                    pdf["media"].to_numpy()):
                wave = _fake_waveform(payload)
                starts = np.arange(0, len(wave) - frame_len, hop)
                # all frames of one clip as a (n_frames, frame_len)
                # gather — the per-frame RMS is one vectorized reduction
                frames = wave[starts[:, None] + np.arange(frame_len)]
                r = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
                ids.append(np.full(len(starts), did, dtype=np.int64))
                idxs.append(np.arange(len(starts), dtype=np.int32))
                rms.append(r)
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids) if ids else [],
                    "frame_idx": np.concatenate(idxs) if idxs else [],
                    "rms": np.concatenate(rms) if rms else [],
                },
                columns=[f.name for f in out_schema.fields],
            )

    return df.select(id_col, "media").mapInPandas(batches, schema=out_schema)
