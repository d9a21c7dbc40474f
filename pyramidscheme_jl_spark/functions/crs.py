"""CRS bbox transforms for viewport reads (SURVEY.md §2.6 L3).

The reference reprojects query bboxes with Proj, densifying each edge so
curved projections don't clip the true extent
(``trans_bounds(trans, bbox, densify_pts=21)``,
/root/reference/src/PyramidScheme.jl:491-503). No pyproj exists in the
sandbox, so this module provides:

- ``trans_bounds(fn, bbox, densify_pts)`` — the same densify-then-envelope
  algorithm over ANY vectorized ``(x[], y[]) -> (x'[], y'[])`` callable
  (plug in pyproj's ``Transformation.transform`` in production unchanged);
- spherical web-mercator (EPSG:3857 <-> EPSG:4326) forward/inverse in pure
  numpy — the standard public formulas — so the L3 path is exercisable
  end-to-end with pinned coordinate tests, not just an identity hook.

Transforms are driver-side planning math (a bbox is 4 numbers); nothing
here touches executors.
"""

from __future__ import annotations

import numpy as np

#: WGS84 / spherical-mercator earth radius (meters) — the EPSG:3857 sphere
R_MERC = 6378137.0
MERC_MAX = np.pi * R_MERC  # world half-extent, ±20037508.342789244 m
LAT_MAX = 85.051128779806604  # atan(sinh(pi)) — mercator's latitude cutoff


def lonlat_to_mercator(lon, lat):
    """EPSG:4326 degrees -> EPSG:3857 meters (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -LAT_MAX, LAT_MAX)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    """EPSG:3857 meters -> EPSG:4326 degrees (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


def trans_bounds(fn, bbox, densify_pts: int = 21):
    """Reproject a bbox through ``fn``, densifying the edges first.

    Mirrors the reference's ``trans_bounds`` (src/PyramidScheme.jl:491-503):
    sample ``densify_pts`` points along each of the four edges, transform
    them all, return the envelope. Corner-only transforms under-cover
    whenever an edge maps to a curve whose extremum is interior — the whole
    reason the reference densifies.
    """
    xmin, ymin, xmax, ymax = bbox
    xs = np.linspace(xmin, xmax, densify_pts)
    ys = np.linspace(ymin, ymax, densify_pts)
    px = np.concatenate([xs, xs, np.full(densify_pts, xmin), np.full(densify_pts, xmax)])
    py = np.concatenate([np.full(densify_pts, ymin), np.full(densify_pts, ymax), ys, ys])
    tx, ty = fn(px, py)
    return (float(np.min(tx)), float(np.min(ty)), float(np.max(tx)), float(np.max(ty)))


def bbox_transform(fn, densify_pts: int = 21):
    """Adapter producing the ``read_window(bbox_transform=...)`` callable."""

    def f(extent):
        return trans_bounds(fn, extent, densify_pts)

    return f


def affine_transform(a: float, b: float, c: float, d: float, e: float, f: float):
    """General 2x3 affine ``(x, y) -> (a*x + b*y + c, d*x + e*y + f)`` —
    the world<->pixel georeferencing of a raster (GDAL-style geotransform)."""

    def fn(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        return a * x + b * y + c, d * x + e * y + f

    return fn
