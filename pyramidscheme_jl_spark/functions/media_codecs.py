"""Pure-numpy codecs for uncompressed public media formats.

The sandbox has no Pillow/ffmpeg, but several standard formats need no
library at all — their specs are a fixed header plus raw samples. Decoding
them here (and providing encoders for test fixtures) turns the multimodal
codec registry from all-stubs into *real decode for every uncompressed
format*, leaving only entropy-coded formats (jpeg/png/mp4) stubbed:

- **PGM (P5) / PPM (P6)** — NetPBM binary: ASCII header, raw 8-bit samples.
- **BMP** — Windows bitmap, BITMAPINFOHEADER, uncompressed 8-bit
  (grayscale palette) or 24-bit BGR; bottom-up rows, 4-byte row padding.
- **WAV** — RIFF/PCM, 8-bit unsigned or 16-bit signed little-endian,
  any channel count.

All decoders parse shape/metadata from the bytes themselves (files are the
source of truth; callers may cross-check their metadata columns) and all
math is whole-array numpy — these run inside Arrow-batched UDFs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# NetPBM (PGM P5 grayscale, PPM P6 color)
# ---------------------------------------------------------------------------


def _pnm_header(buf: bytes, magic: bytes) -> tuple[int, int, int, int]:
    """Parse 'P5/P6 <w> <h> <maxval>' allowing comments; returns
    (w, h, maxval, data_offset)."""
    if not buf.startswith(magic):
        raise ValueError(f"not a {magic.decode()} file")
    pos = len(magic)
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    return vals[0], vals[1], vals[2], pos


def decode_pgm(buf: bytes) -> np.ndarray:
    """P5 -> (h, w) uint8."""
    w, h, maxval, off = _pnm_header(buf, b"P5")
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    return np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)


def encode_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8 RGB."""
    w, h, maxval, off = _pnm_header(buf, b"P6")
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed BITMAPINFOHEADER, 8-bit palette or 24-bit BGR)
# ---------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """-> (h, w) uint8 for 8-bit, (h, w, 3) uint8 RGB for 24-bit."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise ValueError("compressed BMP unsupported (BI_RGB only)")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    raw = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)
    if bpp == 8:
        # palette: 256 BGRX entries after the header; map indices through it
        pal_off = 14 + hdr_size
        pal = np.frombuffer(buf, dtype=np.uint8, count=256 * 4, offset=pal_off).reshape(256, 4)
        idx = rows[:, :w]
        gray_pal = pal[:, :3]
        out: np.ndarray
        if (gray_pal[:, 0] == gray_pal[:, 1]).all() and (gray_pal[:, 1] == gray_pal[:, 2]).all():
            out = gray_pal[:, 0][idx]  # grayscale palette -> 2-D
        else:
            out = gray_pal[idx][:, :, ::-1]  # BGR -> RGB
    elif bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        out = bgr[:, :, ::-1]  # BGR -> RGB
    else:
        raise ValueError(f"{bpp}-bit BMP unsupported")
    return out[::-1].copy() if flip else out.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (h, w) grayscale (8-bit + gray palette) or (h, w, 3) RGB (24-bit)."""
    h, w = img.shape[:2]
    gray = img.ndim == 2
    bpp = 8 if gray else 24
    row_bytes = (w * bpp // 8 + 3) & ~3
    pal = b""
    if gray:
        pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    data_off = 14 + 40 + len(pal)
    img_size = row_bytes * h
    head = b"BM" + struct.pack("<IHHI", data_off + img_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, img_size, 2835, 2835,
                       256 if gray else 0, 0)
    rows = []
    a = np.ascontiguousarray(img, dtype=np.uint8)
    for y in range(h - 1, -1, -1):  # bottom-up
        r = a[y] if gray else a[y][:, ::-1]  # RGB -> BGR
        rb = r.tobytes()
        rows.append(rb + b"\x00" * (row_bytes - len(rb)))
    return head + info + pal + b"".join(rows)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """-> (samples (n, channels) as float64 in [-1, 1], sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError("non-PCM WAV unsupported")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    n = len(s) // channels
    return s[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n, channels) float64 in [-1, 1] as 16-bit PCM."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
