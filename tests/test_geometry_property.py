"""Property tests on random geometry (SURVEY §4 test-plan item b).

The track parity suites exercise the kernels only on track-shaped inputs; here the
same kernels face thousands of random rectangles and segment soups, checked against
the reference implementations driven directly (duck-typed where needed).
"""
import types

import numpy as np

import jax.numpy as jnp

from self_play_racing_tpu.ops import geometry as geo

from environment.multi_car import MultiCar as RefMultiCar
from environment.track import Track as RefTrack


def _random_rect(rng, scale=5.0):
    cx, cy = rng.uniform(-10, 10, 2)
    ang = rng.uniform(0, 2 * np.pi)
    hl, hw = rng.uniform(0.5, scale), rng.uniform(0.5, scale)
    ca, sa = np.cos(ang), np.sin(ang)
    local = np.array([[hl, hw], [hl, -hw], [-hl, -hw], [-hl, hw]])
    rot = np.array([[ca, -sa], [sa, ca]])
    return (rot @ local.T).T + np.array([cx, cy])


def test_sat_matches_reference_on_random_rectangles():
    rng = np.random.RandomState(0)
    ref = RefMultiCar.__new__(RefMultiCar)  # methods only use corners
    hits = 0
    for _ in range(500):
        a = _random_rect(rng)
        b = _random_rect(rng)
        expected = ref.rectangles_intersect(a, b)
        got = geo.rectangles_intersect(
            jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
            jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]),
        )
        assert bool(got) == expected
        hits += expected
    assert 50 < hits < 450  # both outcomes well represented


def test_raycast_matches_reference_on_random_segments():
    rng = np.random.RandomState(1)
    for trial in range(40):
        n_seg = rng.randint(3, 60)
        starts = rng.uniform(-20, 20, (n_seg, 2))
        ends = starts + rng.uniform(-10, 10, (n_seg, 2))
        fake_track = types.SimpleNamespace(
            segment_cache={"starts": starts, "ends": ends, "v2": ends - starts}
        )
        origin = rng.uniform(-5, 5, 2)
        for ang in rng.uniform(0, 2 * np.pi, 8):
            expected = RefTrack.raycast(fake_track, origin, ang, 50.0)
            got = geo.raycast_walls(
                jnp.float64(origin[0]), jnp.float64(origin[1]),
                jnp.cos(jnp.float64(ang)), jnp.sin(jnp.float64(ang)),
                jnp.asarray(starts[:, 0]), jnp.asarray(starts[:, 1]),
                jnp.asarray(ends[:, 0] - starts[:, 0]),
                jnp.asarray(ends[:, 1] - starts[:, 1]),
                50.0,
            )
            assert abs(float(got) - expected) < 1e-9


def test_ray_vs_cars_matches_reference_scalar_helper():
    from environment.multi_track import MultiTrack as RefMultiTrack

    rng = np.random.RandomState(2)
    helper = RefMultiTrack.__new__(RefMultiTrack)
    for _ in range(200):
        origin = rng.uniform(-5, 5, 2)
        ang = rng.uniform(0, 2 * np.pi)
        ray_dir = np.array([np.cos(ang), np.sin(ang)])
        seg_start = rng.uniform(-10, 10, 2)
        seg_end = seg_start + rng.uniform(-6, 6, 2)
        expected = helper.ray_seg_intersection(origin, ray_dir, seg_start, seg_end)
        # model as a degenerate one-car/one-edge raycast: the other 3 edges collapse
        corners_x = jnp.asarray([[seg_start[0], seg_end[0], seg_end[0], seg_start[0]]])
        corners_y = jnp.asarray([[seg_start[1], seg_end[1], seg_end[1], seg_start[1]]])
        got = geo.raycast_cars(
            jnp.float64(origin[0]), jnp.float64(origin[1]),
            jnp.float64(ray_dir[0]), jnp.float64(ray_dir[1]),
            corners_x, corners_y,
            jnp.asarray([1e6]), jnp.asarray([1e6]),  # far center: never skipped
            50.0,
        )
        if expected is None or expected > 50.0:
            assert float(got) == 50.0
        else:
            assert abs(float(got) - expected) < 1e-9


def test_raycast_all_miss_and_padding_rows_return_max_dist_exactly():
    """Round-5 regression for the unmasked reduce payload: miss pairs now carry
    (inf, d) — with d exactly 0.0 on zero-direction padding segments, whose
    inf*0 = NaN comparator products must compare false and keep losing. An
    all-miss ray (every segment behind the origin, plus padding rows) must
    still return exactly max_dist, not NaN or inf."""
    # segments strictly in x < -1, rays pointing +x from the origin: no hits
    starts = np.array([[-5.0, -2.0], [-3.0, 1.0], [-8.0, 4.0]])
    vecs = np.array([[0.0, 3.0], [1.5, 0.5], [2.0, -1.0]])
    # pad with zero-direction rows (the TrackArrays padding convention)
    pad = np.zeros((4, 2))
    sx = jnp.asarray(np.concatenate([starts[:, 0], pad[:, 0]]))
    sy = jnp.asarray(np.concatenate([starts[:, 1], pad[:, 1]]))
    vx = jnp.asarray(np.concatenate([vecs[:, 0], pad[:, 0]]))
    vy = jnp.asarray(np.concatenate([vecs[:, 1], pad[:, 1]]))
    for oy in (0.0, 2.5, -4.0):
        got = geo.raycast_walls(jnp.float32(1.0), jnp.float32(oy),
                                jnp.float32(1.0), jnp.float32(0.0),
                                sx, sy, vx, vy, 50.0)
        assert float(got) == 50.0
    # and a hit among padding rows still wins over every miss representation
    got = geo.raycast_walls(jnp.float32(-4.0), jnp.float32(0.0),
                            jnp.float32(-1.0), jnp.float32(0.0),
                            sx, sy, vx, vy, 50.0)
    assert abs(float(got) - 1.0) < 1e-6  # segment x=-5 spans y in [-2, 1]


# (raycast_walls_fan — the shared-origin restructure — was retired to
# docs/DESIGN.md's rejected-kernels log in round 5: measured slower than the
# broadcast form, same category as the retired Pallas kernel.)
