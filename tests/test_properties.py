"""Property-based invariants (hypothesis) for the pure-numpy kernels —
the cell index and block reducers are the engine's foundations; these
pin their algebra over randomized inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyramidscheme_jl_spark.functions.cells import (
    MAX_RES,
    cell_range,
    cell_to_parent,
    cell_to_xy,
    compact_cells,
    grid_disk,
    point_to_cell,
    xy_to_cell,
)
from pyramidscheme_jl_spark.functions.reducers import block_reduce
from pyramidscheme_jl_spark.plans.grid import agg_axis, level_shape, tile_count

coords = st.integers(min_value=0, max_value=(1 << 20) - 1)
res_20 = st.integers(min_value=0, max_value=20)


@given(coords, coords, res_20)
def test_cell_roundtrip(ix, iy, res):
    n = 1 << res
    ix, iy = ix % n, iy % n
    c = xy_to_cell(ix, iy, res)
    jx, jy, r = cell_to_xy(c)
    assert (int(jx), int(jy), int(r)) == (ix, iy, res)


@given(coords, coords, res_20, st.integers(min_value=0, max_value=20))
def test_parent_contains_child_range(ix, iy, res, pres):
    if pres > res:
        res, pres = pres, res
    n = 1 << res
    ix, iy = ix % n, iy % n
    child = xy_to_cell(ix, iy, res)
    parent = cell_to_parent(child, pres)
    lo, hi = cell_range(parent, res)
    assert int(lo) <= int(child) <= int(hi)
    # the range is exactly 4^(res-pres) descendants
    assert int(hi) - int(lo) + 1 == 1 << (2 * (res - pres))


@given(coords, coords, st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=3))
def test_grid_disk_membership(ix, iy, res, k):
    n = 1 << res
    ix, iy = ix % n, iy % n
    disk = grid_disk(xy_to_cell(ix, iy, res), k)[0]
    jx, jy, r = cell_to_xy(disk)
    assert (r == res).all()
    assert (np.abs(jx - ix) <= k).all() and (np.abs(jy - iy) <= k).all()
    # every in-bounds chebyshev-<=k neighbor is present
    want = {
        (x, y)
        for x in range(max(0, ix - k), min(n, ix + k + 1))
        for y in range(max(0, iy - k), min(n, iy + k + 1))
    }
    assert {(int(a), int(b)) for a, b in zip(jx, jy)} == want


@given(st.lists(st.tuples(st.integers(0, 63), st.integers(0, 63)), min_size=1, max_size=40))
def test_compact_cover_preserves_leaf_set(pairs):
    res = 6
    leaves = xy_to_cell([p[0] for p in pairs], [p[1] for p in pairs], res)
    compact = compact_cells(leaves)
    # expanding the compact set back to res recovers exactly the leaf set
    out = set()
    for c in compact:
        lo, hi = cell_range(np.int64(c), res)
        out.update(range(int(lo), int(hi) + 1))
    assert out == set(int(x) for x in np.unique(leaves))


@given(
    st.floats(min_value=0.0, max_value=1023.999, allow_nan=False),
    st.floats(min_value=0.0, max_value=1023.999, allow_nan=False),
    st.integers(min_value=0, max_value=10),
)
def test_point_to_cell_in_bounds_and_consistent(x, y, res):
    c = point_to_cell(x, y, res, 1024.0)
    ix, iy, r = cell_to_xy(c)
    n = 1 << res
    size = 1024.0 / n
    assert 0 <= int(ix) < n and 0 <= int(iy) < n and int(r) == res
    # the point lies inside (or on the clamp edge of) its cell
    assert ix * size <= x < (ix + 1) * size or int(ix) == n - 1
    assert iy * size <= y < (iy + 1) * size or int(iy) == n - 1


@settings(deadline=None, max_examples=40)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=2, max_value=5),
    st.sampled_from(["mean", "min", "max", "sum", "median"]),
)
def test_block_reduce_shape_and_range(h, w, fac, reducer):
    rng = np.random.RandomState(h * 41 + w * 7 + fac)
    a = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    out = block_reduce(a, reducer, fac=fac)
    assert out.shape == (-(-h // fac), -(-w // fac))
    f = a.astype(np.float64)
    if reducer in ("mean", "median"):
        assert (out >= f.min() - 1e-9).all() and (out <= f.max() + 1e-9).all()
    if reducer == "sum":
        assert out.sum() == f.sum()
    if reducer in ("min", "max"):
        agg = out.min() if reducer == "min" else out.max()
        want = a.min() if reducer == "min" else a.max()
        assert agg == want


@settings(deadline=None, max_examples=40)
@given(st.integers(min_value=1, max_value=4096), st.integers(min_value=1, max_value=16))
def test_agg_axis_and_level_shape_consistent(n_points, fac):
    ax = agg_axis(np.arange(n_points, dtype=np.float64) + 0.5, fac)
    assert len(ax) == -(-n_points // fac)
    lw, lh = level_shape((n_points, n_points), 0)
    assert (lw, lh) == (n_points, n_points)
    nx, ny = tile_count((n_points, n_points), 0, 256)
    assert nx == -(-n_points // 256)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(60, 100),
    mode=st.sampled_from(["gray", "rgb444", "rgb420", "rgb422"]),
    prog=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_properties(h, w, quality, mode, prog, seed):
    """Any dims x quality x sampling x scan-order: decode succeeds with the
    input shape, stays in range, and progressive == sequential pixels."""
    import numpy as np

    from pyramidscheme_jl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    if mode == "gray":
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    else:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    ss = {"gray": False, "rgb444": "444", "rgb420": "420", "rgb422": "422"}[mode]
    seq = decode_jpeg(encode_jpeg(img, quality=quality, subsample=ss))
    assert seq.shape == img.shape and seq.dtype == np.uint8
    if prog:
        pr = decode_jpeg(encode_jpeg_progressive(img, quality=quality, subsample=ss))
        np.testing.assert_array_equal(seq, pr)
