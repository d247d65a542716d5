import numpy as np
import pytest

from spatialdata_spark.geometry import predicates as P
from spatialdata_spark.geometry import wkb

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])


def test_wkb_point_roundtrip():
    kind, xy = wkb.decode(wkb.encode_point(1.5, -2.5))
    assert kind == "point" and np.allclose(xy, [1.5, -2.5])


def test_wkb_polygon_roundtrip():
    buf = wkb.encode_polygon([SQUARE])
    kind, rings = wkb.decode(buf)
    assert kind == "polygon"
    assert np.allclose(rings[0][:4], SQUARE)
    assert wkb.geometry_kind(buf) == "polygon"


def test_wkb_multipolygon_roundtrip():
    sq2 = SQUARE + 10.0
    kind, polys = wkb.decode(wkb.encode_multipolygon([[SQUARE], [sq2]]))
    assert kind == "multipolygon" and len(polys) == 2
    assert np.allclose(polys[1][0][:4], sq2)


def test_area_and_centroid():
    assert P.polygon_area([SQUARE]) == pytest.approx(16.0)
    cx, cy = P.polygon_centroid([SQUARE])
    assert (cx, cy) == pytest.approx((2.0, 2.0))
    # with a hole
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    assert P.polygon_area([SQUARE, hole]) == pytest.approx(15.0)


def test_points_in_polygon():
    px = np.array([2.0, 5.0, 0.5, 1.5])
    py = np.array([2.0, 5.0, 0.5, 1.5])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    inside = P.points_in_polygon(px, py, [SQUARE, hole])
    assert inside.tolist() == [True, False, True, False]


def test_rings_intersect():
    assert P.rings_intersect(SQUARE, SQUARE + 2.0)
    assert not P.rings_intersect(SQUARE, SQUARE + 10.0)
    # containment counts as intersecting
    inner = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    assert P.rings_intersect(SQUARE, inner)


def test_polygons_intersect_multipart_and_holes():
    far = SQUARE + 100.0
    mp = [[far], [SQUARE]]  # two-part multipolygon; only part 2 is local
    probe = [[SQUARE + 2.0]]
    # second part alone intersecting must match (regression: old refine
    # tested only the first part's exterior)
    assert P.polygons_intersect(mp, probe)
    assert P.polygons_intersect(probe, mp)
    assert not P.polygons_intersect([[far]], probe)
    # geometry nested wholly inside a hole does NOT intersect
    big = SQUARE * 10.0  # [0,40]^2
    hole = np.array([[10.0, 10.0], [30.0, 10.0], [30.0, 30.0], [10.0, 30.0]])
    donut = [[big, hole]]
    inner = [[np.array([[15.0, 15.0], [20.0, 15.0], [20.0, 20.0], [15.0, 20.0]])]]
    assert not P.polygons_intersect(donut, inner)
    assert not P.polygons_intersect(inner, donut)
    # but one crossing the hole ring does
    crossing = [[np.array([[5.0, 15.0], [20.0, 15.0], [20.0, 20.0], [5.0, 20.0]])]]
    assert P.polygons_intersect(donut, crossing)


def test_polygons_intersect_circle_hole_aware():
    big = SQUARE * 10.0
    hole = np.array([[10.0, 10.0], [30.0, 10.0], [30.0, 30.0], [10.0, 30.0]])
    donut = [[big, hole]]
    assert not P.polygons_intersect_circle(donut, 20.0, 20.0, 3.0)  # deep in hole
    assert P.polygons_intersect_circle(donut, 20.0, 20.0, 11.0)  # reaches hole ring
    assert P.polygons_intersect_circle(donut, 5.0, 5.0, 1.0)  # in the meat
    assert not P.polygons_intersect_circle(donut, 60.0, 60.0, 5.0)  # outside


def test_convex_clip_area():
    clip = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
    inter = P.intersection_area_convex([SQUARE], clip)
    assert inter == pytest.approx(4.0)  # overlap [2,4]x[2,4]
    assert P.intersection_area_convex([SQUARE], SQUARE + 100) == pytest.approx(0.0)


def test_is_convex():
    assert P.is_convex(SQUARE)
    concave = np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4]], dtype=float)
    assert not P.is_convex(concave)


def test_regular_polygon_circle_area():
    ring = wkb.regular_polygon(0, 0, 1.0, n=256)
    assert P.polygon_area([ring]) == pytest.approx(np.pi, rel=1e-3)


def test_wkb_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spatialdata_spark.geometry import wkb as W

    finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)
    ring = st.lists(st.tuples(finite, finite), min_size=3, max_size=12).map(
        lambda pts: np.array(pts, dtype=float)
    )

    @given(st.lists(ring, min_size=1, max_size=3))
    @settings(max_examples=200, deadline=None)
    def roundtrip_polygon(rings):
        kind, got = W.decode(W.encode_polygon(rings))
        assert kind == "polygon" and len(got) == len(rings)
        for r_in, r_out in zip(rings, got):
            # encoder closes open rings; decoded ring keeps the closure
            want = r_in if (r_in[0] == r_in[-1]).all() else np.vstack([r_in, r_in[:1]])
            assert np.array_equal(r_out, want)

    @given(st.lists(st.lists(ring, min_size=1, max_size=2), min_size=1, max_size=3))
    @settings(max_examples=100, deadline=None)
    def roundtrip_multipolygon(polys):
        kind, got = W.decode(W.encode_multipolygon(polys))
        assert kind == "multipolygon" and len(got) == len(polys)

    roundtrip_polygon()
    roundtrip_multipolygon()


def test_ear_clip_triangulate_l_shape_and_fuzz():
    import numpy as np

    from spatialdata_spark.geometry.predicates import ear_clip_triangulate, ring_area

    L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    tris = ear_clip_triangulate(L)
    assert abs(sum(abs(ring_area(t)) for t in tris) - 12.0) < 1e-12

    rng = np.random.default_rng(1)
    from spatialdata_spark.geometry.predicates import _segments_intersect

    def is_simple(poly):
        n = len(poly)
        for i in range(n):
            for j in range(i + 1, n):
                if j == i or (j + 1) % n == i or j == (i + 1) % n:
                    continue
                if _segments_intersect(poly[i], poly[(i + 1) % n], poly[j], poly[(j + 1) % n]):
                    return False
        return True

    checked = 0
    for _ in range(60):
        ang = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(4, 12)))
        rad = rng.uniform(1, 5, len(ang))
        poly = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        if not is_simple(poly):
            continue
        checked += 1
        got = sum(abs(ring_area(t)) for t in ear_clip_triangulate(poly))
        assert abs(got - abs(ring_area(poly))) < 1e-9
    assert checked > 20


def test_convex_halfplanes_agree_with_ray_casting():
    """The JVM half-plane refine path (attach_convex_halfplanes) must
    decide exactly like the Python ray-casting PIP it replaces, for any
    convex polygon and points off the boundary — property-based."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spatialdata_spark.geometry.predicates import points_in_ring
    from spatialdata_spark.operators.aggregate import _ring_halfplanes

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=3, max_value=9),   # vertex count
        st.floats(min_value=0.5, max_value=50.0),  # radius
        st.integers(min_value=0, max_value=10_000),  # seed
    )
    def run(n, r, seed):
        rng = np.random.default_rng(seed)
        # convex ring: points on a circle at sorted distinct angles
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
        if np.min(np.diff(ang, append=ang[0] + 2 * np.pi)) < 1e-3:
            return  # nearly-duplicate vertices -> degenerate edge, skip
        ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
        hps = _ring_halfplanes(ring)
        assert hps is not None
        pts = rng.uniform(-1.5 * r, 1.5 * r, size=(64, 2))
        # drop points too close to any edge (tie zone where the two
        # conventions may legitimately differ)
        def edge_dist(p):
            d = np.inf
            for i in range(len(ring)):
                a, b = ring[i], ring[(i + 1) % len(ring)]
                ab = b - a
                t = np.clip(np.dot(p - a, ab) / np.dot(ab, ab), 0, 1)
                d = min(d, np.linalg.norm(p - (a + t * ab)))
            return d
        keep = np.array([edge_dist(p) > 1e-6 * r for p in pts])
        pts = pts[keep]
        if not len(pts):
            return
        ray = points_in_ring(pts[:, 0], pts[:, 1], ring)
        hp = np.ones(len(pts), dtype=bool)
        for ex, ey, x1, y1 in hps:
            hp &= (ex * (pts[:, 1] - y1) - ey * (pts[:, 0] - x1)) > 0
        assert np.array_equal(ray, hp), (ring.tolist(), pts[ray != hp].tolist())

    run()


def test_intersection_area_concave_clip():
    """intersection_area over concave clips and clips with holes matches
    closed-form values (rect decompositions of the same scenes)."""
    from spatialdata_spark.geometry.predicates import intersection_area

    sq = lambda x0, y0, x1, y1: np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float
    )
    # L-shape = [0,12]x[0,4] U [0,4]x[4,12]
    L = np.array([[0, 0], [12, 0], [12, 4], [4, 4], [4, 12], [0, 12]], dtype=float)

    def rect_clip(b, r):  # [minx,miny,maxx,maxy] pair intersection area
        ix = max(min(b[2], r[2]) - max(b[0], r[0]), 0.0)
        iy = max(min(b[3], r[3]) - max(b[1], r[1]), 0.0)
        return ix * iy

    rng = np.random.default_rng(11)
    for _ in range(200):
        x0, y0 = rng.integers(-6, 12, 2).astype(float)
        w, h = rng.integers(1, 10, 2).astype(float)
        box = (x0, y0, x0 + w, y0 + h)
        exp = rect_clip(box, (0, 0, 12, 4)) + rect_clip(box, (0, 4, 4, 12))
        got = intersection_area([sq(*box)], [L])
        assert abs(got - exp) < 1e-9, (box, got, exp)

    # concave clip WITH a hole: U-shape exterior minus a square hole
    U = np.array(
        [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10]],
        dtype=float,
    )
    hole = sq(1, 1, 2, 2)
    big = sq(-5, -5, 20, 20)  # covers everything
    u_area = 10 * 3 + 2 * (3 * 7)  # bottom bar + two towers
    got = intersection_area([big], [U, hole])
    assert abs(got - (u_area - 1.0)) < 1e-9
    # subject partially covering one tower and part of the hole
    got2 = intersection_area([sq(0, 0, 3.5, 10)], [U, hole])
    exp2 = rect_clip((0, 0, 3.5, 10), (0, 0, 10, 3)) + rect_clip(
        (0, 0, 3.5, 10), (0, 3, 3, 10)
    ) - 1.0
    assert abs(got2 - exp2) < 1e-9
