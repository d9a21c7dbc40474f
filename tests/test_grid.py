"""Pinned planner-math invariants (FIXTURES.md §6, reference test/runtests.jl)."""

import numpy as np
import pytest

from pyramidscheme_jl_spark.plans.grid import (
    agg_axis,
    compute_nlevels,
    extents_intersect,
    level_shape,
    levelindex,
    plan_window,
    select_level,
    tile_count,
    tile_extent,
    tile_pixel_window,
)


def test_compute_nlevels_pinned():
    # reference test/runtests.jl:63-68
    assert compute_nlevels((1000, 1000)) == 2
    assert compute_nlevels((1000, 1025)) == 3
    assert compute_nlevels((10000, 8000)) == 6
    # 4096 mosaic at tilesize 256 -> 4 (FIXTURES.md §1)
    assert compute_nlevels((4096, 4096)) == 4
    assert compute_nlevels((256, 256)) == 0
    assert compute_nlevels((2048, 1024)) == 3  # ref test/runtests.jl:145-166 cube


def test_level_shape_ceil():
    # ceil semantics, reference src/PyramidScheme.jl:435
    assert level_shape((2048, 1024), 3) == (256, 128)
    assert level_shape((1000, 1000), 1) == (500, 500)
    assert level_shape((1000, 1000), 3) == (125, 125)
    assert level_shape((1001, 999), 1) == (501, 500)
    assert level_shape((1500, 1524), 1) == (750, 762)  # ref test/runtests.jl:105-127


def test_levelindex_bitshift():
    # (i-1)>>z+1 one-based == i>>z zero-based (ref :161-164)
    assert levelindex(2, 7) == 1
    assert levelindex(0, 7) == 7
    np.testing.assert_array_equal(
        levelindex(1, np.arange(8)), np.array([0, 0, 1, 1, 2, 2, 3, 3])
    )


def test_tile_windows_ragged():
    # base 1000x1000, z=3 -> level 125x125, single ragged tile
    assert tile_count((1000, 1000), 3) == (1, 1)
    assert tile_pixel_window((1000, 1000), 3, 0, 0) == (0, 0, 125, 125)
    # z=1 -> 500x500 -> 2x2 tiles, edge tiles 244 wide
    assert tile_count((1000, 1000), 1) == (2, 2)
    assert tile_pixel_window((1000, 1000), 1, 1, 1) == (256, 256, 244, 244)


def test_tile_extent_world():
    # level-1 pixel covers 2 base px; tile (1,0) starts at base px 512
    ext = tile_extent((1000, 1000), 1, 1, 0)
    assert ext == (512.0, 0.0, 1000.0, 512.0)
    ext0 = tile_extent((4096, 4096), 0, 3, 2)
    assert ext0 == (768.0, 512.0, 1024.0, 768.0)


def test_agg_axis_midpoints():
    # midpoint LinRange semantics (ref src/PyramidScheme.jl:297-304)
    ax = agg_axis(np.arange(8, dtype=float), 2)
    np.testing.assert_allclose(ax, [0.5, 2.5, 4.5, 6.5])
    # reversed axis keeps direction
    rev = agg_axis(np.arange(8, 0, -1, dtype=float), 2)
    np.testing.assert_allclose(rev, [7.5, 5.5, 3.5, 1.5])
    # ragged: 7 points by 2 -> LinRange with pinned endpoints (reference
    # src/PyramidScheme.jl:296-303; ADVICE r1 parity fix), NOT step*n
    np.testing.assert_allclose(
        agg_axis(np.arange(7, dtype=float), 2), [0.5, 0.5 + 5 / 3, 0.5 + 10 / 3, 5.5]
    )


@pytest.mark.parametrize("target", [(1024, 1024), (512, 512), (300, 300), (2048, 2048)])
def test_select_level_invariant(target):
    # returned level size in [target/2, target] per dim when the level exists
    # (reference test/runtests.jl:105-127)
    base = (1500, 1524)
    n = compute_nlevels(base)
    z = select_level(base, n, (0, 0, base[0], base[1]), target)
    w, h = level_shape(base, z)
    if z < n or (w <= target[0] and h <= target[1]):
        assert w <= target[0] and h <= target[1]
        if z > 0:
            assert w >= target[0] / 2 or h >= target[1] / 2


def test_select_level_pinned_750_762():
    # exactly (750, 762) for a 1500x1524 base at target 1024^2
    base = (1500, 1524)
    n = compute_nlevels(base)
    z = select_level(base, n, (0, 0, 1500, 1524), (1024, 1024))
    assert level_shape(base, z) == (750, 762)


def test_plan_window_crop_and_tiles():
    base = (4096, 4096)
    p = plan_window(base, 4, (0, 0, 256, 256), target_imsize=(256, 256))
    assert p.z == 0 and (p.tx0, p.ty0, p.tx1, p.ty1) == (0, 0, 0, 0)
    # full extent at small target -> top level
    p2 = plan_window(base, 4, (0, 0, 4096, 4096), target_imsize=(256, 256))
    assert p2.z == 4 and p2.px1 - p2.px0 == 256


def test_extents_intersect():
    assert extents_intersect((0, 0, 10, 10), (5, 5, 15, 15))
    assert not extents_intersect((0, 0, 10, 10), (10, 0, 20, 10))  # touching edge
