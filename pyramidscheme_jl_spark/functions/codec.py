"""Tile byte codec + reducer output dtype rules.

Tiles travel through Spark as opaque ``binary`` columns (raw C-order numpy
buffers, ``fmt='raw'`` per BASELINE.json input_hint). Shape/dtype live in
sibling columns (``w``, ``h``, ``c``, ``dtype``) so the relational layer never
looks inside the bytes and Catalyst can prune/skip on the scalar columns.

Output dtype inference mirrors the reference's
``Base.infer_return_type(reducer, Matrix{T})`` (src/PyramidScheme.jl:366,437)
as a static table (SURVEY.md §2.3 A11).
"""

from __future__ import annotations

import numpy as np

#: canonical dtype names allowed in the ``dtype`` column
SUPPORTED_DTYPES = ("uint8", "uint16", "int32", "int64", "float32", "float64")


def encode_tile(arr: np.ndarray) -> bytes:
    """numpy array -> raw C-order bytes (zero-copy when already contiguous)."""
    return np.ascontiguousarray(arr).tobytes()


def decode_tile(buf: bytes, h: int, w: int, dtype: str, c: int = 1) -> np.ndarray:
    """Raw bytes -> numpy array of shape (h, w) or (h, w, c)."""
    a = np.frombuffer(buf, dtype=np.dtype(dtype))
    if c and c > 1:
        return a.reshape(int(h), int(w), int(c))
    return a.reshape(int(h), int(w))


def reducer_dtype(reducer: str, input_dtype: str) -> str:
    """Output dtype for a reducer given the input dtype.

    Static analogue of the reference's return-type inference
    (src/PyramidScheme.jl:366): mean -> float64, mode -> uint8 (ESALCMode,
    src/PyramidScheme.jl:273), min/max -> input dtype, sum -> widened
    (int64 for ints, float64 for floats, matching Julia's promoting ``sum``).
    """
    if callable(reducer):
        return "float64"  # callables reduce the float64 NaN block stack
    if reducer in ("mean", "median"):
        return "float64"
    if reducer == "mode":
        return "uint8"
    if reducer in ("min", "max"):
        return input_dtype
    if reducer == "sum":
        return "float64" if input_dtype.startswith("float") else "int64"
    raise KeyError(f"unknown reducer {reducer!r}")
