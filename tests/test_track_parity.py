"""Track generation + geometry parity against the reference implementation.

The reference (imported from /root/reference, never copied) is the golden oracle:
 - control-point streams from the global-RNG generator must match bit-for-bit
 - spline waypoints / normals / boundary segments must match bit-for-bit
 - raycast / nearest-waypoint / progress / collision kernels must match to f64
   round-off when evaluated on the padded device arrays
"""
import numpy as np
import pytest

import jax.numpy as jnp

from self_play_racing_tpu.envs import track as jtrack
from self_play_racing_tpu.ops import geometry as geo

from environment.track import Track as RefTrack
from environment.track import gen_random_track as ref_gen_random_track
from environment.track import gen_tracks as ref_gen_tracks


def test_gen_random_track_stream_matches():
    ours = jtrack.gen_random_track(12, 60, 14, 0.3, 0.4, seed=7)
    theirs = ref_gen_random_track(12, 60, 14, 0.3, 0.4, seed=7)
    np.testing.assert_array_equal(ours, theirs)


def test_gen_random_track_no_smoothness():
    ours = jtrack.gen_random_track(10, 55, 12, 0.5, 0.0, seed=3)
    theirs = ref_gen_random_track(10, 55, 12, 0.5, 0.0, seed=3)
    np.testing.assert_array_equal(ours, theirs)


def test_gen_tracks_pool_matches():
    np.random.seed(123)
    ours = jtrack.gen_tracks(6, seed=1)
    np.random.seed(123)
    theirs = ref_gen_tracks(6, seed=1)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def pool_and_refs():
    cps = jtrack.gen_tracks(4, seed=1)
    widths = [6.0, 7.0, 8.5, 5.0]
    pool = jtrack.make_track_pool(cps, widths, dtype=jnp.float64)
    refs = [RefTrack(control_points=cp, track_width=w) for cp, w in zip(cps, widths)]
    return pool, refs


def test_geometry_arrays_match(pool_and_refs):
    pool, refs = pool_and_refs
    for k, ref in enumerate(refs):
        n = int(pool.n_wp[k])
        assert n == len(ref.waypoints)
        np.testing.assert_array_equal(np.asarray(pool.wp_x[k, :n]), ref.waypoints[:, 0])
        np.testing.assert_array_equal(np.asarray(pool.wp_y[k, :n]), ref.waypoints[:, 1])
        np.testing.assert_array_equal(np.asarray(pool.nrm_x[k, :n]), ref.normals[:, 0])
        np.testing.assert_array_equal(np.asarray(pool.nrm_y[k, :n]), ref.normals[:, 1])
        s = 2 * n
        np.testing.assert_array_equal(
            np.asarray(pool.seg_sx[k, :s]), ref.segment_cache["starts"][:, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(pool.seg_vx[k, :s]), ref.segment_cache["v2"][:, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(pool.seg_vy[k, :s]), ref.segment_cache["v2"][:, 1]
        )
        assert float(pool.max_track_distance[k]) == ref.max_track_distance
        sx, sy, sa = ref.get_start_pos()
        assert float(pool.start_x[k]) == sx
        assert float(pool.start_y[k]) == sy
        assert float(pool.start_angle[k]) == sa


def test_raycast_matches_reference(pool_and_refs):
    pool, refs = pool_and_refs
    rng = np.random.RandomState(0)
    for k, ref in enumerate(refs):
        # origins sprinkled around the track, many ray directions
        idxs = rng.randint(0, len(ref.waypoints), size=16)
        for i in idxs:
            origin = ref.waypoints[i] + rng.uniform(-3, 3, size=2)
            for ang in rng.uniform(0, 2 * np.pi, size=8):
                expected = ref.raycast(origin, ang, 50.0)
                got = geo.raycast_walls(
                    jnp.float64(origin[0]), jnp.float64(origin[1]),
                    jnp.cos(jnp.float64(ang)), jnp.sin(jnp.float64(ang)),
                    pool.seg_sx[k], pool.seg_sy[k], pool.seg_vx[k], pool.seg_vy[k],
                    50.0,
                )
                assert float(got) == pytest.approx(expected, rel=0, abs=1e-9)


def test_nearest_waypoint_and_progress_match(pool_and_refs):
    pool, refs = pool_and_refs
    rng = np.random.RandomState(1)
    for k, ref in enumerate(refs):
        pts = ref.waypoints[rng.randint(0, len(ref.waypoints), 32)] + rng.uniform(
            -5, 5, (32, 2)
        )
        idx = geo.nearest_waypoint(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.broadcast_to(pool.wp_x[k], (32, pool.pad_waypoints)),
            jnp.broadcast_to(pool.wp_y[k], (32, pool.pad_waypoints)),
        )
        prog = geo.track_progress(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.broadcast_to(pool.wp_x[k], (32, pool.pad_waypoints)),
            jnp.broadcast_to(pool.wp_y[k], (32, pool.pad_waypoints)),
            pool.n_wp[k],
        )
        for j, (px, py) in enumerate(pts):
            assert int(idx[j]) == ref.closest_waypoint_idx(px, py)
            assert float(prog[j]) == ref.calc_progress(px, py)


def test_centerline_collision_matches(pool_and_refs):
    pool, refs = pool_and_refs
    rng = np.random.RandomState(2)
    import sys
    sys.path.insert(0, "/root/reference")
    from environment.car import Car as RefCar

    for k, ref in enumerate(refs):
        car = RefCar(ref)
        hits = 0
        for trial in range(40):
            i = rng.randint(0, len(ref.waypoints))
            car.x, car.y = ref.waypoints[i] + rng.uniform(-ref.track_width * 1.5,
                                                          ref.track_width * 1.5, 2)
            car.angle = rng.uniform(0, 2 * np.pi)
            corners = car.get_corners()
            expected = ref.check_collision(corners)
            cx, cy = geo.car_corners(
                jnp.float64(car.x), jnp.float64(car.y), jnp.float64(car.angle),
                2.0, 1.0,
            )
            np.testing.assert_allclose(np.asarray(cx), corners[:, 0], atol=1e-12)
            np.testing.assert_allclose(np.asarray(cy), corners[:, 1], atol=1e-12)
            got = geo.centerline_collision(
                cx, cy, pool.wp_x[k], pool.wp_y[k],
                pool.nrm_x[k], pool.nrm_y[k], pool.track_width[k],
            )
            assert bool(got) == expected
            hits += expected
        assert 0 < hits < 40  # exercise both branches
