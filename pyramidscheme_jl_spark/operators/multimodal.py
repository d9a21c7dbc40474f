"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata (training-data-pipeline surface).

The sandbox has no image/audio codec libraries, so the *codec* step is
stubbed behind a registry (raw passthrough is real; jpeg/png/wav/mp4 raise
``NotImplementedError`` unless a deterministic fake is requested) while the
Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested. Dropping in Pillow/ffmpeg later means
registering real codecs; no plan shape changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.codec import decode_tile, encode_tile
from ..functions.reducers import block_reduce

#: decoded-feature output schema (image branch)
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
        T.StructField("edge_density", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def decode_image(buf: bytes, w: int, h: int, fmt: str, deterministic_fake: bool = False) -> np.ndarray:
    """Codec registry. ``raw`` is real; compressed formats are stubbed.

    ``deterministic_fake=True`` substitutes a seeded pseudo-decode (stable
    bytes->pixels hash expansion) so pipelines exercising the plumbing stay
    deterministic and testable without codec libs.
    """
    if fmt == "raw":
        return decode_tile(buf, h, w, "uint8")
    if deterministic_fake:
        seed = int.from_bytes(hashlib.sha256(buf[:64]).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    raise NotImplementedError(
        f"codec {fmt!r} needs an image library (Pillow/turbojpeg) — not in sandbox; "
        "pass deterministic_fake=True to exercise the pipeline shape"
    )


def image_features(images: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode + feature-extract per image (mapInPandas, Arrow-batched).

    Features are whole-array numpy: luma stats, a gradient edge-density, and
    the 64-bit block-mean phash (FIXTURES.md §1 definition).
    """

    def gen(batches):
        from ..sources.synth import phash64

        for pdf in batches:
            rows = []
            for iid, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = decode_image(buf, int(w), int(h), fmt, deterministic_fake)
                f = img.astype(np.float64)
                gx = np.abs(np.diff(f, axis=1)).mean()
                gy = np.abs(np.diff(f, axis=0)).mean()
                rows.append(
                    {
                        "image_id": iid,
                        "w": int(w),
                        "h": int(h),
                        "mean_luma": float(f.mean()),
                        "std_luma": float(f.std()),
                        "edge_density": float((gx + gy) / 2.0),
                        "phash": phash64(img),
                    }
                )
            pdf_out = pd.DataFrame(rows)
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return images.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def resize_images(images: DataFrame, factor: int = 2, deterministic_fake: bool = False) -> DataFrame:
    """Block-mean resize by an integer factor (the engine's own reducer as
    the resampler — at scale this IS the pyramid's downsample kernel)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for iid, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = decode_image(buf, int(w), int(h), fmt, deterministic_fake)
                out = block_reduce(img.astype(np.float64), "mean", fac=factor)
                out8 = np.clip(np.rint(out), 0, 255).astype(np.uint8)
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": encode_tile(out8),
                        "w": out8.shape[1],
                        "h": out8.shape[0],
                        "fmt": "raw",
                    }
                )
            pdf_out = pd.DataFrame(rows)
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return images.mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-like binaries.

    Stub container format (real plumbing, fake codec): the binary is a
    concatenation of fixed-size raw frames; ``w``/``h``/``n_frames`` come
    from metadata columns. A real demuxer (ffmpeg) slots in here.
    Expected input columns: (media_id, bytes, w, h, n_frames).
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, buf, w, h, n in zip(
                pdf["media_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["n_frames"]
            ):
                fsz = int(w) * int(h)
                for i in range(0, int(n), every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "bytes": bytes(buf[i * fsz : (i + 1) * fsz]),
                            "w": int(w),
                            "h": int(h),
                        }
                    )
            pdf_out = pd.DataFrame(rows)
            pdf_out["frame_index"] = pdf_out["frame_index"].astype("int32")
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return media.mapInPandas(gen, FRAME_SCHEMA)
