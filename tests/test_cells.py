"""Cell index + polygon geometry unit tests (SURVEY.md §2.8 J2/J3)."""

import numpy as np

from pyramidscheme_jl_spark.functions.cells import (
    cell_range,
    cell_res,
    cell_to_parent,
    cell_to_xy,
    compact_cells,
    grid_disk,
    point_to_cell,
    points_in_polygon,
    polygon_to_cells,
    xy_to_cell,
)


def test_cell_roundtrip():
    rng = np.random.RandomState(1)
    for res in (0, 1, 5, 12, 26):
        n = 1 << res
        ix = rng.randint(0, n, size=100)
        iy = rng.randint(0, n, size=100)
        c = xy_to_cell(ix, iy, res)
        jx, jy, r = cell_to_xy(c)
        np.testing.assert_array_equal(jx, ix)
        np.testing.assert_array_equal(jy, iy)
        assert (r == res).all()
        assert (cell_res(c) == res).all()


def test_morton_locality_parent():
    # all 4 children of a parent map back to it
    p = xy_to_cell(3, 5, 4)
    for dx in (0, 1):
        for dy in (0, 1):
            ch = xy_to_cell(6 + dx, 10 + dy, 5)
            assert cell_to_parent(ch, 4) == p


def test_cell_range_contiguity():
    # descendants of a cell form one contiguous id range — the join-key trick
    p = xy_to_cell(2, 1, 3)
    lo, hi = cell_range(p, 6)
    assert hi - lo + 1 == 4 ** 3
    ix, iy, _ = cell_to_xy(np.arange(lo, hi + 1))
    assert ix.min() == 2 * 8 and ix.max() == 2 * 8 + 7
    assert iy.min() == 1 * 8 and iy.max() == 1 * 8 + 7
    # every id in the range is a descendant
    assert (cell_to_parent(np.arange(lo, hi + 1), 3) == p).all()


def test_point_to_cell_half_open():
    world = 1024.0
    # cell size at res 4 = 64; x=64.0 belongs to cell ix=1 (half-open)
    c = point_to_cell(np.array([63.9, 64.0, 1023.999, 1024.0]), np.zeros(4), 4, world)
    ix, _, _ = cell_to_xy(c)
    np.testing.assert_array_equal(ix, [0, 1, 15, 15])  # max edge clamps


def test_grid_disk():
    c = xy_to_cell(5, 5, 4)
    disk = np.unique(grid_disk(c, 1))
    assert len(disk) == 9
    ix, iy, _ = cell_to_xy(disk)
    assert ix.min() == 4 and ix.max() == 6 and iy.min() == 4 and iy.max() == 6
    # corner clipping: (0,0) k=1 -> only 4 unique cells
    corner = np.unique(grid_disk(xy_to_cell(0, 0, 4), 1))
    assert len(corner) == 4


def test_compact_cells():
    # 4 siblings collapse to parent; a lone cell stays
    kids = xy_to_cell(np.array([4, 5, 4, 5]), np.array([2, 2, 3, 3]), 5)
    lone = xy_to_cell(9, 9, 5)
    out = compact_cells(np.concatenate([kids, [lone]]))
    assert set(out.tolist()) == {int(xy_to_cell(2, 1, 4)), int(lone)}
    # recursive collapse: 16 grandchildren -> 1 grandparent
    gx, gy = np.meshgrid(np.arange(4, 8), np.arange(8, 12))
    grand = xy_to_cell(gx.ravel(), gy.ravel(), 6)
    out2 = compact_cells(grand)
    assert out2.tolist() == [int(xy_to_cell(1, 2, 4))]


SQUARE = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
CONCAVE_L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)


def naive_pip(px, py, ring):
    """Independent scalar even-odd implementation (oracle)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                inside = not inside
    return inside


def test_points_in_polygon_matches_naive():
    rng = np.random.RandomState(7)
    px = rng.uniform(-1, 7, 500)
    py = rng.uniform(-1, 7, 500)
    for ring in (SQUARE, CONCAVE_L):
        got = points_in_polygon(px, py, ring)
        want = np.array([naive_pip(x, y, ring) for x, y in zip(px, py)])
        np.testing.assert_array_equal(got, want)


def test_pip_boundary_rule():
    # half-open: bottom/left edges in, top/right edges out (even-odd ray-cast)
    got = points_in_polygon(
        np.array([2.0, 6.0, 4.0, 4.0, 2.0, 6.0]),
        np.array([4.0, 4.0, 2.0, 6.0, 2.0, 6.0]),
        SQUARE,
    )
    assert got.tolist() == [True, False, True, False, True, False]


def test_polygon_to_cells_cover_superset():
    world = 8.0
    res = 4
    cover = polygon_to_cells(SQUARE, res, world, compact=True)
    assert len(cover) > 0
    # every point inside the polygon maps into some cover cell's range at res
    rng = np.random.RandomState(3)
    px = rng.uniform(2.01, 5.99, 300)
    py = rng.uniform(2.01, 5.99, 300)
    pts = point_to_cell(px, py, res, world)
    lo, hi = cell_range(cover, res)
    covered = np.zeros(len(pts), dtype=bool)
    for a, b in zip(lo, hi):
        covered |= (pts >= a) & (pts <= b)
    assert covered.all()
    # compactness: big interior runs collapse to coarser cells
    assert (cell_res(cover) < res).any()
    # and the leaves-only expansion contains strictly more cells
    leaves = polygon_to_cells(SQUARE, res, world, compact=False)
    assert len(leaves) >= len(cover)
    assert (cell_res(leaves) == res).all()


def test_polygon_cover_excludes_far_cells():
    world = 8.0
    cover = polygon_to_cells(SQUARE, 3, world, compact=False)
    ix, iy, _ = cell_to_xy(cover)
    size = world / 8
    # no cover cell lies fully outside the square's bbox
    assert ((ix + 1) * size > 2.0).all() and (ix * size < 6.0).all()
    assert ((iy + 1) * size > 2.0).all() and (iy * size < 6.0).all()


# --- r7: holes + multipolygons (even-odd over a flat ring list) -----------

OUTER = [(1.0, 1.0), (7.0, 1.0), (7.0, 7.0), (1.0, 7.0)]
HOLE = [(3.0, 3.0), (5.0, 3.0), (5.0, 5.0), (3.0, 5.0)]
PART2 = [(9.0, 9.0), (11.0, 9.0), (11.0, 11.0), (9.0, 11.0)]


def test_as_rings_shapes():
    from pyramidscheme_jl_spark.functions.cells import as_rings

    single = as_rings(OUTER)
    assert len(single) == 1 and single[0].shape == (4, 2)
    holed = as_rings([OUTER, HOLE])
    assert len(holed) == 2
    # multipolygon: [[outer, hole], [outer]] — ragged nesting flattens
    mp = as_rings([[OUTER, HOLE], [PART2]])
    assert len(mp) == 3
    # ndarray input stays supported
    assert len(as_rings(np.asarray(OUTER, dtype=np.float64))) == 1
    # ragged ring lengths (5-vertex outer + 4-vertex hole)
    outer5 = OUTER + [(1.0, 4.0)]
    assert len(as_rings([outer5, HOLE])) == 2


def test_pip_holes_and_multipolygon():
    geom = [[OUTER, HOLE], [PART2]]
    px = np.array([2.0, 4.0, 10.0, 8.0, 0.5, 4.0])
    py = np.array([2.0, 4.0, 10.0, 8.0, 0.5, 2.0])
    # in ring only / in hole / in part2 / between parts / outside / in ring
    got = points_in_polygon(px, py, geom)
    assert got.tolist() == [True, False, True, False, False, True]
    # naive even-odd over the concatenated closed edge list agrees
    def naive(x, y):
        cross = 0
        for ring in (OUTER, HOLE, PART2):
            n = len(ring)
            for i in range(n):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % n]
                if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    cross += 1
        return cross % 2 == 1
    rng = np.random.RandomState(11)
    qx = rng.uniform(0, 12, 400)
    qy = rng.uniform(0, 12, 400)
    want = np.array([naive(x, y) for x, y in zip(qx, qy)])
    np.testing.assert_array_equal(points_in_polygon(qx, qy, geom), want)


def test_polygon_to_cells_classified_holes():
    from pyramidscheme_jl_spark.functions.cells import polygon_to_cells_classified

    world = 16.0
    res = 5  # 0.5-unit cells: the 2x2 hole has strict-interior cells
    cover, is_full = polygon_to_cells_classified([OUTER, HOLE], res, world)
    ix, iy, r = cell_to_xy(cover)
    for i in range(len(cover)):
        size = world / (1 << int(r[i]))
        x0, y0 = float(ix[i]) * size, float(iy[i]) * size
        x1, y1 = x0 + size, y0 + size
        # 1. no cover cell lies strictly inside the hole (cells TOUCHING
        # the hole boundary remain as partial leaves — the cover is a
        # superset; refine handles exactness)
        assert not (x0 > 3.0 and x1 < 5.0 and y0 > 3.0 and y1 < 5.0), (
            "cell strictly inside the hole must be dropped", (x0, y0, x1, y1))
        if is_full[i]:
            # 2. full cells are inside the outer and disjoint from the hole
            assert x0 >= 1.0 and x1 <= 7.0 and y0 >= 1.0 and y1 <= 7.0
            assert x1 <= 3.0 or x0 >= 5.0 or y1 <= 3.0 or y0 >= 5.0
    # 3. cells straddling the hole boundary exist and are NOT full
    straddle = [
        i for i in range(len(cover))
        if not is_full[i]
    ]
    assert straddle, "expected boundary cells around the hole"
    # full interior ring exists between outer and hole
    assert is_full.any()
