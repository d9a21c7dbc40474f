"""Deterministic synthetic fixtures (FIXTURES.md) — no external data.

The ``images`` table follows BASELINE.json ``input_hint`` exactly:
``(image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64)``. Image ``i`` occupies mosaic grid slot
``(gx, gy) = (i % G, i // G)`` — the slot is derivable from ``image_id``
alone (``img-{i:08d}``), so the table needs no extra columns and matches the
authoritative shape. Pixels are closed-form: ``(16*(gx+gy) + (x ^ y)) % 256``,
so every block mean/min/max/mode has an exact numpy oracle.

Byte-identical across runs (pure integer math, no RNG).
"""

from __future__ import annotations

import numpy as np

from ..functions.codec import encode_tile

TILE = 256

#: BASELINE.json input_hint schema, exactly (DDL — usable with createDataFrame)
IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)
POLYGONS_DDL = "polygon_id string, ring array<array<double>>"
POINTS_DDL = "point_id string, x double, y double"


def image_pixels(gx: int, gy: int, size: int = TILE) -> np.ndarray:
    """Closed-form uint8 pixels for grid slot (gx, gy): (h, w) C-order."""
    x = np.arange(size, dtype=np.int64)[None, :]
    y = np.arange(size, dtype=np.int64)[:, None]
    return ((16 * (gx + gy) + (x ^ y)) % 256).astype(np.uint8)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual-hash stand-in (FIXTURES.md §1).

    Mean-downsample to an 8x8 thumbnail (index-boundary chunks, so ANY
    shape >= 8x8 works — square-multiple-of-8 inputs get exact 8x8 block
    means; a row-factor-only version overflowed 64 bits on non-square
    images), threshold at the median, pack the 64 booleans MSB-first
    (row-major).
    """
    f = img.astype(np.float64)
    if f.ndim == 3:
        f = f.mean(axis=2)
    ys = (np.arange(9) * f.shape[0]) // 8
    xs = (np.arange(9) * f.shape[1]) // 8
    thumb = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            thumb[i, j] = f[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (thumb > np.median(thumb)).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # wrap into signed int64


def image_row(i: int, G: int, size: int = TILE, shard: int = 0) -> dict:
    gx, gy = i % G, i // G
    img = image_pixels(gx, gy, size)
    checksum = int(img.sum(dtype=np.int64))
    return {
        "image_id": f"img-{i:08d}" if shard == 0 else f"img-{i:08d}-s{shard}",
        "bytes": encode_tile(img),
        "w": size,
        "h": size,
        "fmt": "raw",
        "caption": f"tile r{gy} c{gx} sum={checksum}",
        "phash": phash64(img),
    }


def synth_images(G: int = 16, size: int = TILE, skew_hotspot: float = 0.0) -> list[dict]:
    """The G x G mosaic (G*G rows). With ``skew_hotspot > 0``, appends that
    fraction of duplicate images (distinct ids, ``-s{k}`` suffix) all landing
    in the top-left quadrant neighborhood — the dense-cell hotspot that makes
    salted repartitioning observable (FIXTURES.md §1, SURVEY.md §7.3).
    Hotspot rows are extra join-side load, not pyramid grid slots.
    """
    rows = [image_row(i, G, size) for i in range(G * G)]
    if skew_hotspot > 0:
        n_extra = int(G * G * skew_hotspot)
        q = max(1, G // 4)
        for k in range(n_extra):
            i = (k % (q * q)) % G  # stay inside the top-left q x q slots
            slot = (k % (q * q)) // q * G + (k % q)
            rows.append(image_row(slot, G, size, shard=k + 1))
    return rows


def synth_images_df(spark, G: int = 16, size: int = TILE, partitions: int = 64):
    """Distributed deterministic image-table synthesis: executors generate
    tiles straight from the id range — no driver materialization, so fixture
    scale is bounded by the cluster, not driver memory. Byte-identical to
    ``synth_images`` row for row."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [image_row(int(i), G, size) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, G * G, 1, partitions).mapInPandas(gen, IMAGES_DDL)


def mosaic_pixels(G: int = 16, size: int = TILE) -> np.ndarray:
    """Assemble the full base mosaic (G*size x G*size) — the numpy oracle."""
    out = np.empty((G * size, G * size), dtype=np.uint8)
    for gy in range(G):
        for gx in range(G):
            out[gy * size : (gy + 1) * size, gx * size : (gx + 1) * size] = image_pixels(
                gx, gy, size
            )
    return out


# ---------------------------------------------------------------------------
# spatial-join fixtures (FIXTURES.md §4): deterministic polygons + points
# ---------------------------------------------------------------------------


def synth_polygons(world: float) -> list[dict]:
    """Axis-aligned rects, a convex pentagon, a concave L, a hotspot-spanning
    rect — ray-casting edge cases per FIXTURES.md §4."""
    w = world
    return [
        {"polygon_id": "rect-a", "ring": [[0.1 * w, 0.1 * w], [0.4 * w, 0.1 * w], [0.4 * w, 0.35 * w], [0.1 * w, 0.35 * w]]},
        {"polygon_id": "rect-b", "ring": [[0.5 * w, 0.5 * w], [0.9 * w, 0.5 * w], [0.9 * w, 0.8 * w], [0.5 * w, 0.8 * w]]},
        {"polygon_id": "pentagon", "ring": [[0.6 * w, 0.05 * w], [0.8 * w, 0.12 * w], [0.85 * w, 0.3 * w], [0.65 * w, 0.42 * w], [0.5 * w, 0.22 * w]]},
        {"polygon_id": "l-shape", "ring": [[0.05 * w, 0.55 * w], [0.35 * w, 0.55 * w], [0.35 * w, 0.7 * w], [0.2 * w, 0.7 * w], [0.2 * w, 0.95 * w], [0.05 * w, 0.95 * w]]},
        {"polygon_id": "hotspot", "ring": [[0.0, 0.0], [0.28 * w, 0.0], [0.28 * w, 0.28 * w], [0.0, 0.28 * w]]},
    ]


def synth_points(world: float, n_side: int = 32) -> list[dict]:
    """Regular lattice + boundary probes sitting exactly on rect-a's edges
    and corners (pins the half-open boundary rule)."""
    rows = []
    step = world / n_side
    k = 0
    for iy in range(n_side):
        for ix in range(n_side):
            rows.append({"point_id": f"pt-{k:06d}", "x": (ix + 0.5) * step, "y": (iy + 0.5) * step})
            k += 1
    w = world
    for x, y in [
        (0.1 * w, 0.1 * w),   # rect-a corner
        (0.4 * w, 0.35 * w),  # opposite corner
        (0.25 * w, 0.1 * w),  # bottom edge
        (0.1 * w, 0.2 * w),   # left edge
        (0.4 * w, 0.2 * w),   # right edge
    ]:
        rows.append({"point_id": f"pt-{k:06d}", "x": float(x), "y": float(y)})
        k += 1
    return rows
