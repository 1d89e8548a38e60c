"""On-device procedural track generation: pure jnp, jittable, batched.

A TPU-native capability beyond the reference. The reference generates its track
pool once, host-side, with NumPy + scipy (/root/reference/environment/track.py:4-56
control-point sampling, track.py:100-148 spline/normals/boundaries). Here the full
pipeline — parameter sampling, control points, periodic cubic spline, waypoints,
normals, boundary segments, start pose — runs as one XLA program under ``jit``, so
training can resample a *fresh* track pool every K updates (domain randomization at
scale) with zero host round-trips: the new pool is born in HBM.

Deliberate divergences from the host generator (``envs/track.py``, which keeps
reference RNG parity for the oracle suites):

- ``num_points`` is static per call (XLA needs static shapes); the reference draws
  it per track from [10, 15) (track.py:49).
- Per-track parameters (base_radius, radius_variation, angle_jitter, smoothness,
  width) are continuous ``jax.random`` draws over the same ranges as the
  reference's integer/uniform draws (track.py:49-53, train.py:30).
- The periodic cubic spline solves the classical cyclic second-derivative system
  with a dense ``jnp.linalg.solve`` (n <= 15, so the solve is trivial and batches
  cleanly); values agree with ``scipy.interpolate.CubicSpline(bc_type="periodic")``
  to float tolerance (tests/test_procgen.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .track import PAD_XY, WAYPOINT_FACTOR, TrackArrays, _round_up


def periodic_spline_m(t, y):
    """Second derivatives of the periodic cubic spline through (t, y).

    t: [n+1] strictly increasing knots; y: [n+1] (or [n+1, d] for d curves
    sharing the knots — the matrix depends only on t, so one factorization
    serves every coordinate) with y[n] == y[0].
    Returns M with M[n] == M[0]. Classical cyclic tridiagonal system:
    for each unknown M_i (i = 0..n-1, indices mod n)

        h_{i-1}/6 * M_{i-1} + (h_{i-1}+h_i)/3 * M_i + h_i/6 * M_{i+1}
            = (y_{i+1}-y_i)/h_i - (y_i-y_{i-1})/h_{i-1}
    """
    n = t.shape[0] - 1
    h = jnp.diff(t)                      # [n]
    hd = h[:, None] if y.ndim == 2 else h
    s = jnp.diff(y, axis=0) / hd         # [n(, d)] interval slopes
    idx = jnp.arange(n)
    prev = (idx - 1) % n
    nxt = (idx + 1) % n
    a = jnp.zeros((n, n), t.dtype)
    a = a.at[idx, prev].add(h[prev] / 6.0)
    a = a.at[idx, idx].add((h[prev] + h) / 3.0)
    a = a.at[idx, nxt].add(h / 6.0)
    d = s - s[prev]
    m = jnp.linalg.solve(a, d)
    return jnp.concatenate([m, m[:1]], axis=0)


def eval_periodic_spline(t, y, m, ts):
    """Evaluate the cubic with knot second-derivatives m at query points ts."""
    n = t.shape[0] - 1
    i = jnp.clip(jnp.searchsorted(t, ts, side="right") - 1, 0, n - 1)
    h = t[i + 1] - t[i]
    lo = (t[i + 1] - ts) / h
    hi = (ts - t[i]) / h
    h2 = h * h / 6.0
    return (m[i] * lo**3 + m[i + 1] * hi**3) * h2 \
        + (y[i] - m[i] * h2) * lo + (y[i + 1] - m[i + 1] * h2) * hi


def sample_track_params(key, base_radius_range=(50.0, 80.0),
                        angle_jitter_range=(0.2, 0.7), smoothness_range=(0.2, 0.7)):
    """Continuous analog of the reference's per-track draws (track.py:49-53)."""
    kb, kv, kj, ks = jax.random.split(key, 4)
    base_radius = jax.random.uniform(kb, (), minval=base_radius_range[0],
                                     maxval=base_radius_range[1])
    # reference: randint(10, base_radius // 2 - 10); bound is data-dependent, so draw
    # a unit uniform and scale it by the traced bound
    rv_hi = base_radius / 2.0 - 10.0
    radius_variation = 10.0 + jax.random.uniform(kv, ()) * (rv_hi - 10.0)
    angle_jitter = jax.random.uniform(kj, (), minval=angle_jitter_range[0],
                                      maxval=angle_jitter_range[1])
    smoothness = jax.random.uniform(ks, (), minval=smoothness_range[0],
                                    maxval=smoothness_range[1])
    return base_radius, radius_variation, angle_jitter, smoothness


def sample_control_points(key, num_points: int, **param_ranges):
    """[num_points, 2] control polygon; mirrors gen_random_track (track.py:4-45)."""
    kp, ka, kv = jax.random.split(key, 3)
    base_radius, radius_variation, angle_jitter, smoothness = \
        sample_track_params(kp, **param_ranges)

    angles = jnp.linspace(0.0, 2.0 * jnp.pi, num_points, endpoint=False)
    half = angle_jitter * (2.0 * jnp.pi / num_points) / 2.0
    jit_u = jax.random.uniform(ka, (num_points,), minval=-1.0, maxval=1.0) * half
    angles = jnp.sort((angles + jit_u) % (2.0 * jnp.pi))

    variations = jax.random.uniform(kv, (num_points,), minval=-radius_variation,
                                    maxval=radius_variation)

    r0 = base_radius + variations[0]

    def smooth(prev, v):
        r = (1.0 - smoothness) * (base_radius + v) + smoothness * prev
        return r, r

    _, rest = jax.lax.scan(smooth, r0, variations[1:])
    radii = jnp.concatenate([r0[None], rest])
    radii = radii.at[0].set((radii[0] + radii[-1]) / 2.0)  # close the loop
    return jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], axis=-1)


def build_track_arrays(control_points, track_width, pad_multiple: int = 128,
                       dtype=jnp.float32, sensor_lod: int = 1) -> TrackArrays:
    """Batched jnp version of the host geometry pipeline + pool padding.

    control_points: [K, n, 2]; track_width: [K] (or scalar). Returns a padded
    ``TrackArrays`` pool with the same layout contract as ``make_track_pool``
    (waypoints padded at PAD_XY, segments padded with zero direction vectors).

    ``sensor_lod`` > 1 mirrors make_track_pool's relaxed sensing on device:
    the raycast segment arrays become closed chords through every lod-th
    boundary vertex with conservative outward vertex offsets (see
    track._decimate_boundary — same construction, vectorized over the pool).
    Requires n_wp %% sensor_lod == 0 (procgen pools share one n_wp).
    """
    cp = jnp.asarray(control_points)
    k, n, _ = cp.shape
    width = jnp.broadcast_to(jnp.asarray(track_width, cp.dtype), (k,))

    closed = jnp.concatenate([cp, cp[:, :1]], axis=1)            # [K, n+1, 2]
    chord = jnp.linalg.norm(jnp.diff(closed, axis=1), axis=-1)    # [K, n]
    t = jnp.concatenate([jnp.zeros((k, 1), cp.dtype), jnp.cumsum(chord, axis=1)],
                        axis=1)                                   # [K, n+1]

    n_wp = n * WAYPOINT_FACTOR
    ts = t[:, -1:] * (jnp.arange(n_wp, dtype=cp.dtype) / n_wp)    # [K, W]

    def spline_2d(t1, y2, ts1):
        m2 = periodic_spline_m(t1, y2)  # one solve for both coordinates
        return (eval_periodic_spline(t1, y2[:, 0], m2[:, 0], ts1),
                eval_periodic_spline(t1, y2[:, 1], m2[:, 1], ts1))

    wp_x, wp_y = jax.vmap(spline_2d)(t, closed, ts)               # [K, W] each

    # tangents = next - this, closing the loop (np.diff(..., append=wp[:1]))
    tan_x = jnp.roll(wp_x, -1, axis=1) - wp_x
    tan_y = jnp.roll(wp_y, -1, axis=1) - wp_y
    length = jnp.sqrt(tan_x**2 + tan_y**2)
    length = jnp.where(length == 0, 1.0, length)
    nrm_x = -tan_y / length
    nrm_y = tan_x / length

    w = width[:, None]
    left_x, left_y = wp_x + nrm_x * w, wp_y + nrm_y * w
    right_x, right_y = wp_x - nrm_x * w, wp_y - nrm_y * w
    lod = int(sensor_lod)
    if lod > 1:
        if n_wp % lod:
            raise ValueError(f"sensor_lod={lod} must divide n_wp={n_wp}")

        def decimate(bx, by, onx, ony):
            # [K, W] boundary + outward normals -> offset chord vertices [K, m]
            m = n_wp // lod
            vx = bx.reshape(k, m, lod)
            vy = by.reshape(k, m, lod)
            ax, ay = vx[:, :, 0], vy[:, :, 0]                 # kept vertices
            bx2 = jnp.roll(ax, -1, axis=1)
            by2 = jnp.roll(ay, -1, axis=1)
            cx, cy = bx2 - ax, by2 - ay
            norm = jnp.sqrt(cx * cx + cy * cy)
            norm = jnp.where(norm < 1e-12, 1.0, norm)
            cnx, cny = -cy / norm, cx / norm                  # chord normal
            keep_onx = onx.reshape(k, m, lod)[:, :, 0]
            keep_ony = ony.reshape(k, m, lod)[:, :, 0]
            flip = jnp.sign(cnx * keep_onx + cny * keep_ony)
            flip = jnp.where(flip == 0, 1.0, flip)
            cnx, cny = cnx * flip, cny * flip
            # outward deviation of the lod-1 skipped vertices per chord
            dev = ((vx[:, :, 1:] - ax[:, :, None]) * cnx[:, :, None]
                   + (vy[:, :, 1:] - ay[:, :, None]) * cny[:, :, None])
            chord_dev = jnp.maximum(dev.max(axis=-1), 0.0)    # [K, m]
            off = jnp.maximum(chord_dev, jnp.roll(chord_dev, 1, axis=1))
            return ax + keep_onx * off, ay + keep_ony * off

        dlx, dly = decimate(left_x, left_y, nrm_x, nrm_y)
        drx, dry = decimate(right_x, right_y, -nrm_x, -nrm_y)
        seg_sx = jnp.concatenate([dlx, drx], axis=1)          # [K, 2W/lod]
        seg_sy = jnp.concatenate([dly, dry], axis=1)
        seg_ex = jnp.concatenate([jnp.roll(dlx, -1, axis=1),
                                  jnp.roll(drx, -1, axis=1)], axis=1)
        seg_ey = jnp.concatenate([jnp.roll(dly, -1, axis=1),
                                  jnp.roll(dry, -1, axis=1)], axis=1)
    else:
        seg_sx = jnp.concatenate([left_x, right_x], axis=1)       # [K, 2W]
        seg_sy = jnp.concatenate([left_y, right_y], axis=1)
        seg_ex = jnp.concatenate([jnp.roll(left_x, -1, axis=1),
                                  jnp.roll(right_x, -1, axis=1)], axis=1)
        seg_ey = jnp.concatenate([jnp.roll(left_y, -1, axis=1),
                                  jnp.roll(right_y, -1, axis=1)], axis=1)
    seg_vx, seg_vy = seg_ex - seg_sx, seg_ey - seg_sy

    span_x = wp_x.max(axis=1) - wp_x.min(axis=1)
    span_y = wp_y.max(axis=1) - wp_y.min(axis=1)

    w_pad = _round_up(n_wp, pad_multiple)
    s_pad = _round_up(seg_sx.shape[1], pad_multiple)

    def pad(a, total, fill):
        return jnp.pad(a, ((0, 0), (0, total - a.shape[1])), constant_values=fill)

    f = lambda a: a.astype(dtype)
    return TrackArrays(
        wp_x=f(pad(wp_x, w_pad, PAD_XY)),
        wp_y=f(pad(wp_y, w_pad, PAD_XY)),
        nrm_x=f(pad(nrm_x, w_pad, 0.0)),
        nrm_y=f(pad(nrm_y, w_pad, 0.0)),
        seg_sx=f(pad(seg_sx, s_pad, 0.0)),
        seg_sy=f(pad(seg_sy, s_pad, 0.0)),
        seg_vx=f(pad(seg_vx, s_pad, 0.0)),
        seg_vy=f(pad(seg_vy, s_pad, 0.0)),
        seg_c=f(pad(seg_vy * seg_sx - seg_vx * seg_sy, s_pad, 0.0)),
        n_wp=jnp.full((k,), n_wp, jnp.int32),
        track_width=f(width),
        max_track_distance=f(jnp.sqrt(span_x**2 + span_y**2)),
        start_x=f(wp_x[:, 0]),
        start_y=f(wp_y[:, 0]),
        start_angle=f(jnp.arctan2(wp_y[:, 1] - wp_y[:, 0], wp_x[:, 1] - wp_x[:, 0])),
        start_nx=f(nrm_x[:, 0]),
        start_ny=f(nrm_y[:, 0]),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
def gen_track_pool_device(key, num_tracks: int, num_points: int = 12,
                          pad_multiple: int = 128,
                          width_range=(6.0, 10.0), sensor_lod: int = 1) -> TrackArrays:
    """Sample a whole padded track pool on device in one jitted program.

    Equivalent role to host gen_tracks + make_track_pool (track.py:47-56 +
    train.py:28-30's width draws), born directly in device memory.
    """
    kc, kw = jax.random.split(key)
    cps = jax.vmap(lambda k_: sample_control_points(k_, num_points))(
        jax.random.split(kc, num_tracks))
    widths = jax.random.uniform(kw, (num_tracks,), minval=width_range[0],
                                maxval=width_range[1])
    return build_track_arrays(cps, widths, pad_multiple=pad_multiple,
                              sensor_lod=sensor_lod)
