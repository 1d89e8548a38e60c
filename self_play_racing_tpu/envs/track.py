"""Procedural track generation (host-side NumPy) and padded device track pools.

Host side reproduces the reference generator's *exact* global-NumPy-RNG stream
(track.py:4-56 — including the quirk that ``gen_random_track`` reseeds the global RNG
with the same seed inside every call while per-track params are drawn between reseeds;
SURVEY.md quirk #6), builds the spline waypoints / normals / boundary segments in
float64, then stacks everything into fixed-size, padding-safe device tensors laid out
structure-of-arrays for the TPU raycast kernels.

Reference geometry pipeline being reproduced:
 - periodic cubic spline through control points -> num_points*30 waypoints
   (track.py:100-115)
 - per-waypoint tangents/normals (track.py:117-124)
 - left/right boundaries at +-track_width along normals (track.py:93-94)
 - closed boundary segments, stacked left+right (track.py:126-148)
 - bounds + max_track_distance diagonal (track.py:82-91)
 - start position/heading from waypoints 0/1 (track.py:154-157)

Padding contract (consumed by ops.geometry):
 - waypoints padded at PAD_XY (1e8, 1e8): can never win a nearest-waypoint argmin.
 - segments padded with zero direction vectors: filtered as parallel by the raycast.
"""
from __future__ import annotations

import numpy as np
from flax import struct
from scipy.interpolate import CubicSpline

import jax

import jax.numpy as jnp

PAD_XY = 1.0e8
WAYPOINT_FACTOR = 30  # waypoints per control point (track.py:100)

# Default control polygon + width used when no pool is given (track.py:69-80).
DEFAULT_CONTROL_POINTS = np.array(
    [
        [0, 0], [50, 0], [70, 20], [60, 40],
        [70, 50], [50, 70], [20, 70], [10, 50],
        [10, 20], [0, 10],
    ],
    dtype=np.float64,
)
DEFAULT_TRACK_WIDTH = 6.0


def gen_random_track(num_points=15, base_radius=50, radius_variation=15,
                     angle_jitter=0.2, smoothness=0.5, seed=None):
    """Control points on a jittered circle with smoothed radius variation.

    Draw-for-draw identical to the reference (track.py:4-45): one uniform array for
    angle offsets, then one scalar uniform per point for the radius variation, all on
    the *global* NumPy RNG (reseeded here when ``seed`` is given — reference quirk).
    """
    if seed is not None:
        np.random.seed(seed)

    angles = np.linspace(0.0, 2 * np.pi, num_points, endpoint=False)
    if angle_jitter > 0:
        spacing = 2 * np.pi / num_points
        half = angle_jitter * spacing / 2
        angles = np.sort((angles + np.random.uniform(-half, half, num_points)) % (2 * np.pi))

    variations = np.array([np.random.uniform(-radius_variation, radius_variation)
                           for _ in range(num_points)])
    radii = np.empty(num_points)
    if smoothness > 0:
        radii[0] = base_radius + variations[0]
        for i in range(1, num_points):
            radii[i] = (1 - smoothness) * (base_radius + variations[i]) + smoothness * radii[i - 1]
        radii[0] = (radii[0] + radii[-1]) / 2  # close the loop (track.py:36-37)
    else:
        radii = base_radius + variations

    return np.column_stack([radii * np.cos(angles), radii * np.sin(angles)])


def gen_tracks(num_tracks=10, seed=None):
    """Per-track parameter draws + generation, same RNG stream as track.py:47-56."""
    out = []
    for _ in range(num_tracks):
        num_points = np.random.randint(10, 15)
        base_radius = np.random.randint(50, 80)
        radius_variation = np.random.randint(10, base_radius // 2 - 10)
        angle_jitter = np.random.uniform(0.2, 0.7)
        smoothness = np.random.uniform(0.2, 0.7)
        out.append(gen_random_track(num_points, base_radius, radius_variation,
                                    angle_jitter, smoothness, seed))
    return out


def build_track_geometry(control_points, track_width):
    """Full float64 geometry for one track: waypoints, normals, boundary segments,
    bounds, start pose. Returns a plain dict of NumPy arrays/scalars."""
    cp = np.asarray(control_points, dtype=np.float64)
    closed = np.vstack([cp, cp[:1]])
    t = np.concatenate(([0.0], np.cumsum(np.sqrt(np.sum(np.diff(closed, axis=0) ** 2, axis=1)))))
    spline_x = CubicSpline(t, closed[:, 0], bc_type="periodic")
    spline_y = CubicSpline(t, closed[:, 1], bc_type="periodic")

    n_wp = len(cp) * WAYPOINT_FACTOR
    ts = np.linspace(0.0, t[-1], n_wp, endpoint=False)
    wp = np.column_stack((spline_x(ts), spline_y(ts)))

    tangents = np.diff(wp, axis=0, append=wp[:1])
    lengths = np.linalg.norm(tangents, axis=1, keepdims=True)
    tangents = tangents / np.where(lengths == 0, 1.0, lengths)
    normals = np.column_stack((-tangents[:, 1], tangents[:, 0]))

    left = wp + normals * track_width
    right = wp - normals * track_width
    seg_start = np.vstack([left, right])
    seg_end = np.vstack([np.roll(left, -1, axis=0), np.roll(right, -1, axis=0)])

    span_x = wp[:, 0].max() - wp[:, 0].min()
    span_y = wp[:, 1].max() - wp[:, 1].min()

    return {
        "waypoints": wp,
        "normals": normals,
        "seg_start": seg_start,
        "seg_vec": seg_end - seg_start,
        "n_wp": n_wp,
        "track_width": float(track_width),
        "max_track_distance": float(np.sqrt(span_x**2 + span_y**2)),
        "start_x": float(wp[0, 0]),
        "start_y": float(wp[0, 1]),
        "start_angle": float(np.arctan2(wp[1, 1] - wp[0, 1], wp[1, 0] - wp[0, 0])),
        "start_nx": float(normals[0, 0]),
        "start_ny": float(normals[0, 1]),
    }


@struct.dataclass
class TrackArrays:
    """Stacked, padded track geometry on device (SoA layout).

    Leading axis is the pool (or env) axis. ``wp_*``/``nrm_*`` have shape [K, W];
    ``seg_*`` have shape [K, S] with S = 2*W (left then right boundary, matching the
    reference's segment-cache stacking order, track.py:141-142).
    """

    wp_x: jnp.ndarray
    wp_y: jnp.ndarray
    nrm_x: jnp.ndarray
    nrm_y: jnp.ndarray
    seg_sx: jnp.ndarray
    seg_sy: jnp.ndarray
    seg_vx: jnp.ndarray
    seg_vy: jnp.ndarray
    # ray-independent half of cross(v2, v1): c = v2y*sx - v2x*sy, so the raycast's
    # t-numerator becomes oy*v2x - ox*v2y + c — an [envs, segments] term instead of
    # [envs, rays, segments]
    seg_c: jnp.ndarray
    n_wp: jnp.ndarray          # int32 [K] true waypoint counts
    track_width: jnp.ndarray   # [K]
    max_track_distance: jnp.ndarray  # [K]
    start_x: jnp.ndarray
    start_y: jnp.ndarray
    start_angle: jnp.ndarray
    start_nx: jnp.ndarray
    start_ny: jnp.ndarray

    @property
    def num_tracks(self):
        return self.wp_x.shape[0]

    @property
    def pad_waypoints(self):
        return self.wp_x.shape[-1]


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _decimate_boundary(pts, out_nrm, lod):
    """Closed chord decimation of one boundary polyline with CONSERVATIVE
    outward vertex offsets: every kept vertex moves outward (along its waypoint
    normal) by the largest outward bulge of the skipped vertices on its two
    adjacent chords, so the LOD polyline contains the true wall — near-wall
    rays shorten slightly (by <= the local sagitta) instead of flipping to a
    max-range miss when the car sits between a chord and the real boundary.

    pts: [n, 2] boundary vertices in track order; out_nrm: [n, 2] outward
    normals; lod: decimation stride. Returns the decimated vertices [m, 2].
    """
    n = len(pts)
    idx = np.arange(0, n, lod)
    m = len(idx)
    chord_dev = np.zeros(m)
    for j in range(m):
        lo = idx[j]
        hi = idx[(j + 1) % m]
        a = pts[lo]
        b = pts[hi]
        span = (np.arange(lo + 1, lo + lod) % n) if (hi - lo) % n else []
        if len(span) == 0:
            continue
        c = b - a
        norm = np.hypot(*c)
        if norm < 1e-12:
            continue
        # outward normal of the chord: consistent with the boundary's own
        # outward direction at its start vertex
        cn = np.array([-c[1], c[0]]) / norm
        if np.dot(cn, out_nrm[lo]) < 0:
            cn = -cn
        dev = (pts[span] - a) @ cn
        chord_dev[j] = max(0.0, float(dev.max()))
    vert_off = np.maximum(chord_dev, np.roll(chord_dev, 1))  # adjacent chords
    return pts[idx] + out_nrm[idx] * vert_off[:, None]


def make_track_pool(control_points_list, track_widths, dtype=jnp.float32, pad_multiple=128,
                    sensor_lod=1):
    """Build a stacked padded TrackArrays pool from per-track control points + widths.

    ``track_widths`` may be a scalar (shared) or a per-track sequence. Waypoint padding
    is rounded up to ``pad_multiple`` (TPU lane alignment); segment padding is 2x that.

    ``sensor_lod`` (opt-in RELAXED SENSING, default 1 = exact reference
    semantics): with lod k > 1, the raycast SEGMENT arrays are rebuilt as
    closed chords through every kth boundary vertex — the boundary polyline the
    sensors see is a k x coarser level-of-detail of the same walls, cutting the
    [rays, segments] raycast grid (the dominant cost at high agent counts) by
    ~k x. The chord error is bounded by the boundary's sagitta over k waypoint
    spacings (sub-0.1 units at k <= 4 on generated tracks vs track widths
    6-10). ONLY sensing changes: waypoints/normals — and therefore progress,
    rewards, wall collision, termination — stay bit-exact to the reference
    (track.py:159-171). This is a documented divergence from
    /root/reference/environment/track.py:126-148 (which always raycasts the
    full-resolution boundary); quantified in data/relaxed_sensing.json.
    """
    k = len(control_points_list)
    if np.isscalar(track_widths):
        track_widths = [track_widths] * k
    geoms = [build_track_geometry(cp, w) for cp, w in zip(control_points_list, track_widths)]
    lod = int(sensor_lod)
    if lod > 1:
        for g in geoms:
            n = g["n_wp"]
            starts = g["seg_start"]                     # [2n, 2]: left then right
            nrm = g["normals"]                          # [n, 2] (+n = left side)
            out = []
            for pts, sign in ((starts[:n], 1.0), (starts[n:], -1.0)):
                out.append(_decimate_boundary(pts, sign * nrm, lod))
            dl, dr = out
            dec_start = np.vstack([dl, dr])
            dec_end = np.vstack([np.roll(dl, -1, axis=0), np.roll(dr, -1, axis=0)])
            g["seg_start"] = dec_start
            g["seg_vec"] = dec_end - dec_start
            g["n_seg"] = len(dec_start)
    else:
        for g in geoms:
            g["n_seg"] = 2 * g["n_wp"]

    w_pad = _round_up(max(g["n_wp"] for g in geoms), pad_multiple)
    s_pad = _round_up(max(g["n_seg"] for g in geoms), pad_multiple)

    def pad_wp(arr, fill):
        out = np.full((w_pad,), fill, dtype=np.float64)
        out[: len(arr)] = arr
        return out

    def pad_seg(arr):
        out = np.zeros((s_pad,), dtype=np.float64)
        out[: len(arr)] = arr
        return out

    fields = {
        "wp_x": np.stack([pad_wp(g["waypoints"][:, 0], PAD_XY) for g in geoms]),
        "wp_y": np.stack([pad_wp(g["waypoints"][:, 1], PAD_XY) for g in geoms]),
        "nrm_x": np.stack([pad_wp(g["normals"][:, 0], 0.0) for g in geoms]),
        "nrm_y": np.stack([pad_wp(g["normals"][:, 1], 0.0) for g in geoms]),
        "seg_sx": np.stack([pad_seg(g["seg_start"][:, 0]) for g in geoms]),
        "seg_sy": np.stack([pad_seg(g["seg_start"][:, 1]) for g in geoms]),
        "seg_vx": np.stack([pad_seg(g["seg_vec"][:, 0]) for g in geoms]),
        "seg_vy": np.stack([pad_seg(g["seg_vec"][:, 1]) for g in geoms]),
        "seg_c": np.stack([
            pad_seg(g["seg_vec"][:, 1] * g["seg_start"][:, 0]
                    - g["seg_vec"][:, 0] * g["seg_start"][:, 1])
            for g in geoms
        ]),
        "track_width": np.array([g["track_width"] for g in geoms]),
        "max_track_distance": np.array([g["max_track_distance"] for g in geoms]),
        "start_x": np.array([g["start_x"] for g in geoms]),
        "start_y": np.array([g["start_y"] for g in geoms]),
        "start_angle": np.array([g["start_angle"] for g in geoms]),
        "start_nx": np.array([g["start_nx"] for g in geoms]),
        "start_ny": np.array([g["start_ny"] for g in geoms]),
    }
    return TrackArrays(
        n_wp=jnp.asarray([g["n_wp"] for g in geoms], dtype=jnp.int32),
        **{name: jnp.asarray(v, dtype=dtype) for name, v in fields.items()},
    )


def default_track_pool(dtype=jnp.float32):
    """Single-track pool with the reference's fallback control polygon + width 6.0."""
    return make_track_pool([DEFAULT_CONTROL_POINTS], DEFAULT_TRACK_WIDTH, dtype=dtype)


def gather_tracks(pool: TrackArrays, track_ids) -> TrackArrays:
    """Per-env track data: gather pool rows by env->track assignment (one-time,
    outside the rollout scan, so the hot loop reads contiguous per-env geometry)."""
    ids = jnp.asarray(track_ids, dtype=jnp.int32)
    return jax.tree.map(lambda a: jnp.take(a, ids, axis=0), pool)


@struct.dataclass
class PooledTracks:
    """Capacity-scaling geometry layout: the ``[tracks, ...]`` pool stays
    resident in HBM with one int32 track id per env, and the per-env
    ``TrackArrays`` view is materialized lazily inside the jitted step.
    Geometry residency drops from O(envs x segments) to O(tracks x segments)
    plus a transient — but the in-scan gather is NOT free: measured ~1.6x
    slower per full PPO update than eager per-env geometry (77 -> 123 ms at
    4096 envs x 256 steps on a v5e; data/pooled_geometry.json). Use only at
    env counts where per-env copies genuinely don't fit — note that 65536
    envs x 256 steps fits *eagerly* on one v5e now that trainer init runs
    under jit, so this layout is for well beyond that.

    Drop-in for TrackArrays anywhere a trainer/env hook accepts geometry
    (hooks resolve it via ``resolve``); under ``shard_by_env_axis`` the pool
    leaves replicate (dim0 == num_tracks) and ``ids`` shards over 'data'.
    """

    pool: TrackArrays
    ids: jnp.ndarray  # int32 [envs]

    def gather(self) -> TrackArrays:
        return gather_tracks(self.pool, self.ids)

    @property
    def num_envs(self):
        return self.ids.shape[0]  # per-env view size, matching gather_tracks

    @property
    def num_tracks(self):
        return self.pool.num_tracks  # actual pool size (dim0 of the pool leaves)


def pooled_tracks(pool: TrackArrays, track_ids) -> PooledTracks:
    """Build the lazy pool-resident layout (cf. gather_tracks for the eager one)."""
    return PooledTracks(pool=pool, ids=jnp.asarray(track_ids, dtype=jnp.int32))


@struct.dataclass
class GroupedPooledTracks:
    """Capacity geometry layout with BLOCK-GROUPED env->track assignment: envs
    come in contiguous blocks of ``block_envs``, every env in a block racing the
    same track (``block_ids[i]`` for block i).

    Where ``PooledTracks.gather`` materializes a full per-env ``[envs, S]``
    gather inside the step (measured 1.6-2.5x slower full updates — HBM gather
    traffic), this layout gathers only the ``[blocks, S]`` rows and expands each
    across its block with a broadcast + adjacent-dim reshape. XLA fuses that
    expansion into the consuming raycast/waypoint fusions as pure index math, so
    per-env geometry never exists in HBM: residency is O(tracks + blocks), and
    the step reads each track row once per block instead of once per env.

    Bit-exact drop-in for
    ``gather_tracks(pool, np.repeat(block_ids, block_envs))`` — verified in
    tests/test_pooled_geometry.py. Requires env count % block_envs == 0; choose
    block_envs as envs_per_track (``np.repeat(np.arange(T), N // T)`` is the
    compatible contiguous assignment).
    """

    pool: TrackArrays
    block_ids: jnp.ndarray                        # int32 [num_blocks]
    block_envs: int = struct.field(pytree_node=False)

    def gather(self) -> TrackArrays:
        be = self.block_envs

        def expand(a):
            rows = jnp.take(a, self.block_ids, axis=0)          # [nb, ...]
            nb = rows.shape[0]
            return jnp.broadcast_to(
                rows[:, None], (nb, be) + rows.shape[1:]
            ).reshape((nb * be,) + rows.shape[1:])
        return jax.tree.map(expand, self.pool)

    @property
    def num_envs(self):
        return self.block_ids.shape[0] * self.block_envs

    @property
    def num_tracks(self):
        return self.pool.num_tracks

    @property
    def ids(self):
        """Per-env track ids (the PooledTracks-equivalent assignment)."""
        return jnp.repeat(self.block_ids, self.block_envs)


def grouped_pooled_tracks(pool: TrackArrays, block_ids,
                          block_envs: int) -> GroupedPooledTracks:
    """Build the block-grouped capacity layout (see GroupedPooledTracks)."""
    return GroupedPooledTracks(
        pool=pool, block_ids=jnp.asarray(block_ids, dtype=jnp.int32),
        block_envs=int(block_envs))


@struct.dataclass
class TiledPooledTracks:
    """Pool-resident geometry for the INTERLEAVED env->track assignment
    ``arange(num_envs) % num_tracks`` — the framework's default assignment
    (reference train.py:28-31 uses identity track_id per env; our vectorized
    default tiles the pool round-robin).

    Env ``i`` reads pool row ``i % num_tracks`` via a leading broadcast +
    reshape (``[T, ...] -> [reps, T, ...] -> [reps*T, ...]``) that XLA fuses
    into the consuming raycast/waypoint fusions as pure index math: per-env
    geometry never materializes in HBM, geometry residency and per-step HBM
    traffic drop from O(envs) to O(tracks), and — unlike the block-grouped
    capacity layout — the env->track assignment (hence every trajectory) stays
    bit-identical to the eager ``gather_tracks(pool, arange(N) % T)`` default.
    Measured: eliminates the eager layout's ~12% rollout composition penalty
    (per-step geometry prefetch) at 4096 envs on v5e (docs/DESIGN.md).

    Requires ``num_envs % num_tracks == 0``.
    """

    pool: TrackArrays
    reps: int = struct.field(pytree_node=False)   # envs per track = N // T

    def gather(self) -> TrackArrays:
        def expand(a):
            t = a.shape[0]
            return jnp.broadcast_to(
                a[None], (self.reps,) + a.shape
            ).reshape((self.reps * t,) + a.shape[1:])
        return jax.tree.map(expand, self.pool)

    @property
    def num_envs(self):
        return self.reps * self.pool.num_tracks

    @property
    def num_tracks(self):
        return self.pool.num_tracks

    @property
    def ids(self):
        """Per-env track ids (identical to the eager default assignment)."""
        return jnp.tile(
            jnp.arange(self.pool.num_tracks, dtype=jnp.int32), self.reps)


def tiled_pooled_tracks(pool: TrackArrays, num_envs: int) -> TiledPooledTracks:
    """Pool-resident layout for the default interleaved assignment (see
    TiledPooledTracks). ``num_envs`` must be a multiple of the pool size."""
    t = pool.num_tracks
    if num_envs % t:
        raise ValueError(f"num_envs={num_envs} not divisible by pool size {t}")
    return TiledPooledTracks(pool=pool, reps=num_envs // t)


def resolve(track) -> TrackArrays:
    """Per-env TrackArrays from any geometry layout."""
    if isinstance(track, (PooledTracks, GroupedPooledTracks, TiledPooledTracks)):
        return track.gather()
    return track
