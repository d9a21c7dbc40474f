"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata (training-data-pipeline surface).

Codec registry status (r3): ``raw`` passthrough, pure-numpy PGM/PPM/BMP
image decoders, a RIFF/PCM WAV audio decoder, a real **PNG** decoder
(stdlib zlib inflate + numpy scanline un-filtering,
``functions/media_codecs.py``), a real **JPEG** codec
(``functions/jpeg.py``: baseline sequential + multi-SOS + progressive
SOF2, 4:4:4/4:2:2/4:2:0, restart intervals, EXIF orientation uprighting,
Adobe CMYK/YCCK->RGB; corrupt streams always raise ValueError —
fuzz-pinned), and MJPEG-AVI + mp4 (ISO BMFF) demux for frame sampling.
Only inter-frame video codecs (H.264/HEVC payloads) remain stubbed
behind ``NotImplementedError`` — the mp4 container itself is fully
demuxed (they need ffmpeg; a deterministic fake exercises the shape).
Dropping in faster native codecs later means registering them — no plan
shape changes. Row-level tolerance: ``on_error='skip'`` on
features/transcode drops undecodable rows instead of failing the job.
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
    """Codec registry. ``raw``/``pgm``/``ppm``/``bmp``/``png``/``jpeg``
    decode for real (png: stdlib zlib inflate + numpy un-filtering; jpeg:
    pure-numpy codec in ``functions/jpeg.py`` — baseline + progressive,
    Huffman tables read from the file, all block math vectorized, EXIF
    orientation applied); only inter-frame video payloads remain stubbed.

    Returns ``(h, w)`` grayscale or ``(h, w, c)`` uint8. For the real
    file formats, shape comes from the file header (the bytes are the
    source of truth; the metadata columns are advisory). ``raw`` payloads
    infer channels from the payload size (the input_hint schema has no
    channel column), matching the pyramid-build registry.

    ``deterministic_fake=True`` substitutes a seeded pseudo-decode (stable
    bytes->pixels hash expansion) so pipelines exercising the stubbed
    formats stay deterministic and testable without codec libs.
    """
    if fmt == "raw":
        w, h = int(w), int(h)
        if w <= 0 or h <= 0:
            raise ValueError(f"raw payload with non-positive dims {w}x{h}")
        c = len(buf) // (w * h)
        if c < 1:
            raise ValueError(f"raw payload of {len(buf)} bytes smaller than {w}x{h}")
        return decode_tile(buf, h, w, "uint8", c)
    if fmt in ("pgm", "ppm", "bmp", "png", "jpeg", "jpg"):
        from ..functions.jpeg import apply_orientation, decode_jpeg, jpeg_orientation
        from ..functions.media_codecs import (
            decode_bmp,
            decode_pgm,
            decode_png,
            decode_ppm,
        )

        raw = bytes(buf)
        if fmt in ("jpeg", "jpg"):
            # EXIF orientation is part of the bytes (the per-row source of
            # truth): a pipeline ignoring it trains on rotated images
            return apply_orientation(decode_jpeg(raw), jpeg_orientation(raw))
        return {
            "pgm": decode_pgm, "ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png,
        }[fmt](raw)
    if deterministic_fake:
        seed = int.from_bytes(hashlib.sha256(buf[:64]).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    raise NotImplementedError(
        f"codec {fmt!r} needs an image library (Pillow/turbojpeg) — not in sandbox; "
        "pass deterministic_fake=True to exercise the pipeline shape"
    )


def _luma(img: np.ndarray) -> np.ndarray:
    """(h, w[, c]) uint8 -> (h, w) float64 luma (ITU-R BT.601 weights).
    c=2 is gray+alpha (luma = gray plane), c=4 is RGBA (alpha ignored)."""
    f = img.astype(np.float64)
    if f.ndim == 3:
        if f.shape[2] == 2:
            return f[:, :, 0]
        return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return f


def image_features(
    images: DataFrame,
    deterministic_fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode + feature-extract per image (mapInPandas, Arrow-batched).

    Features are whole-array numpy: luma stats, a gradient edge-density, and
    the 64-bit block-mean phash (FIXTURES.md §1 definition).

    ``on_error``: ``"raise"`` (default — one bad row fails the job, the
    strict data-quality gate) or ``"skip"`` (drop undecodable rows — at
    10^12 rows a handful of corrupt files must not kill the stage; the
    decoders guarantee corrupt streams raise ``ValueError``, fuzz-pinned,
    so skip never masks a code bug).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error {on_error!r} not in ('raise', 'skip')")

    def gen(batches):
        from ..sources.synth import phash64

        for pdf in batches:
            rows = []
            for iid, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    img = decode_image(buf, int(w), int(h), fmt, deterministic_fake)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                f = _luma(img)
                gx = np.abs(np.diff(f, axis=1)).mean()
                gy = np.abs(np.diff(f, axis=0)).mean()
                rows.append(
                    {
                        "image_id": iid,
                        "w": int(f.shape[1]),
                        "h": int(f.shape[0]),
                        "mean_luma": float(f.mean()),
                        "std_luma": float(f.std()),
                        "edge_density": float((gx + gy) / 2.0),
                        "phash": phash64(np.clip(np.rint(f), 0, 255).astype(np.uint8)),
                    }
                )
            if not rows:  # whole batch skipped
                continue
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


def transcode_images(
    images: DataFrame,
    to_fmt: str = "jpeg",
    quality: int = 90,
    subsample: bool = False,
    progressive: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Re-encode every image row to ``to_fmt`` — the corpus-normalization
    op of a training-data pipeline (mixed formats -> one codec; raw scans
    -> compressed storage tier; lossy re-encode at a target quality).

    Decode uses the full registry (any SUPPORTED format in); encode
    targets ``raw``, ``png`` (lossless), or ``jpeg`` (``quality``/
    ``subsample`` forwarded; ``progressive=True`` emits SOF2 scans — the
    web-delivery encoding). Output keeps the input_hint images schema
    (caption/phash pass through untouched — the per-row invariant pair).
    One Arrow-batched Python stage, no shuffle: Catalyst sees a narrow
    mapInPandas whatever the codec mix is.
    """
    if to_fmt not in ("raw", "png", "jpeg"):
        raise ValueError(f"transcode target {to_fmt!r} not in ('raw','png','jpeg')")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error {on_error!r} not in ('raise', 'skip')")
    # fix the column set and order (input_hint schema); extra caller
    # columns would silently vanish from the mapInPandas output otherwise
    src = images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")

    def gen(batches):
        from ..functions.jpeg import encode_jpeg, encode_jpeg_progressive
        from ..functions.media_codecs import encode_png

        enc_jpeg = encode_jpeg_progressive if progressive else encode_jpeg

        for pdf in batches:
            rows = []
            for iid, buf, w, h, fmt, cap, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"],
                pdf["caption"], pdf["phash"],
            ):
                try:
                    img = decode_image(buf, int(w), int(h), fmt)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                if to_fmt == "raw":
                    out = np.ascontiguousarray(img).tobytes()
                elif to_fmt == "png":
                    out = encode_png(img)
                else:
                    # jpeg is gray or RGB only: c=2 is gray+alpha (keep the
                    # gray plane), c=4 is RGBA (drop alpha), c=1 squeezes
                    if img.ndim == 3 and img.shape[2] in (1, 2):
                        img = img[:, :, 0]
                    elif img.ndim == 3 and img.shape[2] == 4:
                        img = img[:, :, :3]
                    out = enc_jpeg(img, quality=quality, subsample=subsample)
                rows.append(
                    {
                        "image_id": iid, "bytes": out,
                        "w": int(img.shape[1]), "h": int(img.shape[0]),
                        "fmt": to_fmt, "caption": cap, "phash": ph,
                    }
                )
            if not rows:  # whole batch skipped
                continue
            pdf_out = pd.DataFrame(rows)
            pdf_out["w"] = pdf_out["w"].astype("int32")
            pdf_out["h"] = pdf_out["h"].astype("int32")
            yield pdf_out

    return src.mapInPandas(gen, src.schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("peak_milli", T.LongType()),
        T.StructField("zcr_milli", T.LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per audio row (real WAV/PCM decode; mp4
    PCM sound tracks — 'sowt'/'twos'/'lpcm' — demux through the same
    sample-table walker as video, VERDICT r4 #7).

    Expected input columns: (media_id, bytes, fmt) with fmt='wav'|'mp4'.
    Features (first channel, milli-quantized for engine-portable
    determinism): RMS level, peak level, zero-crossing rate — value-
    identical between a WAV file and its mp4 remux (same PCM words).
    """

    def gen(batches):
        from ..functions.media_codecs import decode_mp4_audio, decode_wav

        for pdf in batches:
            rows = []
            for mid, buf, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                if fmt == "wav":
                    s, rate = decode_wav(bytes(buf))
                elif fmt == "mp4":
                    s, rate = decode_mp4_audio(bytes(buf))
                else:
                    raise NotImplementedError(
                        f"audio codec {fmt!r} needs ffmpeg — not in sandbox"
                    )
                ch0 = s[:, 0]
                n = len(ch0)
                zc = int((np.signbit(ch0[1:]) != np.signbit(ch0[:-1])).sum()) if n > 1 else 0
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": int(rate),
                        "channels": int(s.shape[1]),
                        "n_samples": n,
                        "duration_ms": int(n * 1000 // max(rate, 1)),
                        "rms_milli": int(np.floor(np.sqrt((ch0 ** 2).mean()) * 1000 + 0.5)) if n else 0,
                        "peak_milli": int(np.floor(np.abs(ch0).max() * 1000 + 0.5)) if n else 0,
                        "zcr_milli": int(zc * 1000 // max(n - 1, 1)),
                    }
                )
            pdf_out = pd.DataFrame(rows)
            for c in ("sample_rate", "channels"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return media.mapInPandas(gen, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-like binaries.

    Two container paths, dispatched per row on the optional ``fmt`` column:

    - ``fmt='avi'`` — REAL demux: MJPEG-in-AVI via the pure-struct RIFF
      walker in ``functions/media_codecs.py``; each sampled frame is
      decoded with the baseline-JPEG codec and emitted as raw pixels.
      ``every_n`` applies to the container's frame sequence.
    - ``fmt='mp4'`` — REAL demux: ISO BMFF sample tables (stsd/stsc/stsz/
      stco) for MJPEG ('jpeg') and uncompressed ('raw ') sample entries;
      inter-frame payloads (avc1/hev1/...) raise NotImplementedError —
      the entropy decode needs ffmpeg, the CONTAINER is fully parsed.
    - anything else (or no ``fmt`` column) — the stub container (binary =
      concatenation of fixed-size raw frames; ``w``/``h``/``n_frames``
      from metadata).

    Expected input columns: (media_id, bytes, w, h, n_frames[, fmt]).
    """
    has_fmt = "fmt" in media.columns

    def gen(batches):
        from ..functions.jpeg import decode_jpeg
        from ..functions.media_codecs import decode_avi_mjpeg, decode_mp4_video

        for pdf in batches:
            rows = []
            fmts = pdf["fmt"] if has_fmt else ["rawcat"] * len(pdf)
            for mid, buf, w, h, n, fmt in zip(
                pdf["media_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["n_frames"], fmts
            ):
                if fmt in ("avi", "mp4"):
                    if fmt == "avi":
                        payloads, _, _, _ = decode_avi_mjpeg(bytes(buf))
                        codec = "jpeg"
                    else:
                        payloads, cw, ch, _, codec = decode_mp4_video(bytes(buf))
                    for i in range(0, len(payloads), every_n):
                        if codec == "jpeg":
                            arr = decode_jpeg(payloads[i])
                            fb = np.ascontiguousarray(arr).tobytes()
                            fw, fh = int(arr.shape[1]), int(arr.shape[0])
                        else:  # raw sample entry: tightly packed plane
                            fb, fw, fh = bytes(payloads[i]), int(cw), int(ch)
                        rows.append(
                            {
                                "media_id": mid,
                                "frame_index": i,
                                "bytes": fb,
                                "w": fw,
                                "h": fh,
                            }
                        )
                    continue
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


REPACKED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def repack_video(media: DataFrame, to_fmt: str = "mp4", on_error: str = "raise") -> DataFrame:
    """Container-normalize video rows (``transcode_images`` for video):
    demux MJPEG payloads from either real container (``avi`` RIFF walk,
    ``mp4`` ISO BMFF sample tables) and remux them into ``to_fmt`` —
    frame payloads pass through BYTE-IDENTICAL (no re-encode, no
    generation loss; the per-frame JPEGs are the invariant).

    mp4 'raw ' sample entries can only target ``mp4`` (the AVI muxer is
    MJPEG-only) — such rows raise ValueError (skippable). One
    Arrow-batched Python stage, no shuffle.

    Expected input columns: (media_id, bytes, fmt).
    """
    if to_fmt not in ("avi", "mp4"):
        raise ValueError(f"repack target {to_fmt!r} not in ('avi', 'mp4')")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error {on_error!r} not in ('raise', 'skip')")

    def gen(batches):
        from ..functions.media_codecs import (
            decode_avi_mjpeg,
            decode_mp4_video,
            encode_avi_mjpeg,
            encode_mp4_video,
        )

        for pdf in batches:
            rows = []
            for mid, buf, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    if fmt == "avi":
                        frames, w, h, fps = decode_avi_mjpeg(bytes(buf))
                        codec = "jpeg"
                    elif fmt == "mp4":
                        frames, w, h, fps, codec = decode_mp4_video(bytes(buf))
                    else:
                        raise ValueError(f"repack source {fmt!r} not in ('avi', 'mp4')")
                    fps_i = max(1, int(round(fps))) if fps else 30
                    if to_fmt == "mp4":
                        out = encode_mp4_video(frames, w, h, fps=fps_i, codec=codec)
                    else:
                        if codec != "jpeg":
                            raise ValueError(
                                "AVI remux requires MJPEG payloads; "
                                f"{mid} carries {codec!r} samples"
                            )
                        out = encode_avi_mjpeg(frames, w, h, fps=fps_i)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    {
                        "media_id": mid, "bytes": out, "fmt": to_fmt,
                        "n_frames": len(frames), "w": int(w), "h": int(h),
                    }
                )
            if not rows:
                continue
            pdf_out = pd.DataFrame(rows)
            for c in ("n_frames", "w", "h"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return media.mapInPandas(gen, REPACKED_SCHEMA)
