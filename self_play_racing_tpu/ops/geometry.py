"""Batched 2-D geometry kernels for the racing engine.

Everything here is written structure-of-arrays (separate x/y component tensors) so the
hot reductions become ``[batch, segments]`` / ``[batch, rays, segments]`` elementwise +
min/argmin ops — clean VPU shapes on TPU (lane dim = segments, not a length-2 xy axis).

Semantics reproduce the reference geometry exactly (cited per function):
 - wall raycast               -> /root/reference/environment/track.py:173-199
 - nearest waypoint / progress-> /root/reference/environment/track.py:150-161
 - centerline wall collision  -> /root/reference/environment/track.py:163-171
 - oriented car corners       -> /root/reference/environment/car.py:26-43
 - SAT rectangle intersection -> /root/reference/environment/multi_car.py:16-43
 - ray vs car edges           -> /root/reference/environment/multi_track.py:5-44

All functions broadcast over arbitrary leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the parallel-segment epsilon in track.py:182 / multi_track.py:35.
_PARALLEL_EPS = 1e-10


def raycast_walls(ox, oy, dx, dy, seg_sx, seg_sy, seg_vx, seg_vy, max_dist,
                  seg_c=None):
    """Min hit distance of rays against boundary segments.

    ox, oy, dx, dy: ray origins/directions, shape ``B`` (any batch shape).
    seg_*: segment start points and direction vectors, shape ``B + (S,)``
      (padding segments must have zero direction vectors -> filtered as parallel).
    Returns shape ``B``: min t over valid hits, else ``max_dist``.

    NOTE (parity): like track.py:199, the returned hit distance is *not* clamped to
    ``max_dist`` — a hit farther than max_dist is still returned as-is. Only the no-hit
    case returns max_dist.
    """
    # Algebraically restructured from track.py:176-193 (identical math up to
    # reassociation; empirically bit-identical to the reference form over every
    # fuzzed ray — see tests):
    #   cross(v2, v1) = oy*v2x - ox*v2y + (v2y*sx - v2x*sy)   [ray-independent!]
    #   dot(v1, v3)   = (sx*dy - sy*dx) - (ox*dy - oy*dx)     [cross(o,d) per ray]
    # and — the big one — DIVISION-FREE per pair. f32 divide costs ~18 VPU slots
    # even fully pipelined (measured; docs/DESIGN.md "VPU op-cost model"), ~40%
    # of the old kernel. Instead:
    #   t >= 0    <=>  cn and dotp agree in sign          (cn*dotp >= 0)
    #   s in[0,1] <=>  sn and dotp agree in sign AND |sn| <= |dotp|
    #   argmin(t) over hits == cross-multiply argmin over (a, d) = (|cn|, |dotp|)
    #                 (a1/d1 < a2/d2 <=> a1*d2 < a2*d1 for positive d)
    # so the [rays, segments] grid does only mul/sub/abs/cmp/select work and ONE
    # true division happens per ray on the reduced winner (t = a_min/d_min —
    # correctly rounded, like the reference's np divide; the old reciprocal form
    # double-rounded). Measured 23% faster at [4096, 11, 896] on v5e.
    # Corner case (documented divergence, unreachable with real f32 geometry):
    # the sign-agreement products underflow to +-0 only when |cn*dotp| or
    # |sn*dotp| < ~1e-45 with |dotp| > eps, i.e. |cn| or |sn| < ~1e-35.
    #
    # SHAPE CONTRACT (v5e-measured): keep the [batch, rays, segments] grid
    # RANK-3. The two-payload reduce fuses its producers at every rank-3 size
    # tested (646M elements at 65536 envs: 2950 us/step vs 3880 for the old
    # reciprocal form), but a rank-4 [N, A, R, S] grid falls out of fusion
    # even at half that size (+136 us/step at [4096, 2, 11, 896]) — callers
    # with an agent axis make one rank-3 call per agent instead
    # (envs/multi.py). Chunking schemes all measured worse and were removed:
    # segment-axis chunks starve the (8, 128) lane tiles (3.8 s/update at
    # 65536 envs), batch-axis chunks break the surrounding fusions (6.8 vs
    # 2.95 ms/step at 65536), and flattening the broadcast operands to 2-D
    # materializes them (16.6 ms/step at 4096x2).
    if seg_c is None:
        seg_c = seg_vy * seg_sx - seg_vx * seg_sy
    u = ox * dy - oy * dx
    cn = oy[..., None] * seg_vx - ox[..., None] * seg_vy + seg_c
    dotp = seg_vy * dx[..., None] - seg_vx * dy[..., None]
    sn = seg_sx * dy[..., None] - seg_sy * dx[..., None] - u[..., None]
    d = jnp.abs(dotp)
    hit = ((d > _PARALLEL_EPS) & (cn * dotp >= 0.0) & (sn * dotp >= 0.0)
           & (jnp.abs(sn) <= d))
    akey = jnp.where(hit, jnp.abs(cn), jnp.inf)
    # d unmasked: a miss pair carries (inf, d). The comparator stays correct —
    # a hit always beats (inf, d) since finite*d' < inf*d_hit, and miss-vs-miss
    # comparisons resolve to inf<inf or NaN<NaN (padding rows have d exactly 0,
    # making inf*0 = NaN), both false, which keeps the first operand — so the
    # all-miss ray reduces to an inf ratio exactly as before (inf/d and inf/0
    # are both inf for the no-hit -> max_dist select below). Masking d to 1.0
    # here cost one extra select per ray-segment pair for nothing.
    dkey = d
    init = (jnp.asarray(jnp.inf, akey.dtype), jnp.asarray(1.0, dkey.dtype))
    amin, dmin = jax.lax.reduce((akey, dkey), init, _ratio_min_reducer,
                                (akey.ndim - 1,))
    tmin = amin / dmin
    return jnp.where(jnp.isinf(tmin), jnp.asarray(max_dist, tmin.dtype), tmin)



def _ratio_min_reducer(p, q):
    """Lexicographic-free min over ratios a/d (d > 0) without dividing:
    a1/d1 < a2/d2  <=>  a1*d2 < a2*d1. Ties keep the first operand."""
    pa, pd = p
    qa, qd = q
    take_q = qa * pd < pa * qd
    return (jnp.where(take_q, qa, pa), jnp.where(take_q, qd, pd))


def nearest_waypoint(px, py, wp_x, wp_y):
    """Index of the nearest waypoint (first occurrence on ties, as np.argmin).

    px, py: query points, shape ``B``. wp_x, wp_y: waypoints, shape ``B + (W,)``
    (padding waypoints must sit at huge coordinates so they never win the argmin).
    Reference: track.py:150-152.
    """
    d2 = (wp_x - px[..., None]) ** 2 + (wp_y - py[..., None]) ** 2
    return jnp.argmin(d2, axis=-1)


def track_progress(px, py, wp_x, wp_y, n_wp):
    """Fraction of track completed = nearest waypoint index / num waypoints.

    Reference: track.py:159-161. ``n_wp`` is the *true* (unpadded) waypoint count.
    """
    idx = nearest_waypoint(px, py, wp_x, wp_y)
    return idx.astype(wp_x.dtype) / jnp.asarray(n_wp, wp_x.dtype)


def car_corners(x, y, angle, half_length, half_width):
    """Oriented-rectangle corners of a car. Returns (cx, cy), shape ``B + (4,)``.

    Corner order matches car.py:31-36: FL(+,+w), FR(+,-w), RR(-,-w), RL(-,+w)
    (front-left first with +half_width, i.e. [(hl,hw),(hl,-hw),(-hl,-hw),(-hl,hw)]).
    """
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    lx = jnp.stack(
        [jnp.full_like(x, half_length)] * 2 + [jnp.full_like(x, -half_length)] * 2,
        axis=-1,
    )
    ly = jnp.stack(
        [
            jnp.full_like(x, half_width),
            jnp.full_like(x, -half_width),
            jnp.full_like(x, -half_width),
            jnp.full_like(x, half_width),
        ],
        axis=-1,
    )
    cx = x[..., None] + ca[..., None] * lx - sa[..., None] * ly
    cy = y[..., None] + sa[..., None] * lx + ca[..., None] * ly
    return cx, cy


def centerline_collision(cx, cy, wp_x, wp_y, nrm_x, nrm_y, track_width):
    """Wall 'collision' test: any corner farther than track_width from the centerline,
    measured along its nearest waypoint's normal. Reference: track.py:163-171
    (distance-from-centerline, *not* segment intersection — cars may cut pinched
    sections exactly as the reference allows; SURVEY.md quirk #8).

    cx, cy: corners, shape ``B + (C,)``. wp/nrm: shape ``B + (W,)``.
    track_width: shape ``B`` or scalar. Returns bool, shape ``B``.

    TPU note: implemented as argmin + one-hot masked reduction rather than
    take_along_axis — dynamic gathers are an order of magnitude slower than a second
    fused elementwise pass over the waypoint axis on TPU.
    """
    dx = cx[..., :, None] - wp_x[..., None, :]          # B + (C, W)
    dy = cy[..., :, None] - wp_y[..., None, :]
    d2 = dx * dx + dy * dy
    idx = jnp.argmin(d2, axis=-1)                        # B + (C,)
    w = wp_x.shape[-1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (w,), 0) == idx[..., None]
    proj = dx * nrm_x[..., None, :] + dy * nrm_y[..., None, :]
    dist = jnp.abs(jnp.sum(jnp.where(sel, proj, 0.0), axis=-1))
    tw = jnp.asarray(track_width)
    return jnp.any(dist > tw[..., None], axis=-1)


def progress_and_collision(x, y, cx, cy, wp_x, wp_y, nrm_x, nrm_y, n_wp, track_width):
    """Fused per-step track queries: progress of the car center + corner collision,
    sharing one pass over the waypoint arrays (track.py:159-161 + 163-171).

    x, y: centers ``B``; cx, cy: corners ``B + (C,)``; wp/nrm ``B + (W,)``.
    Returns (progress ``B``, crashed ``B``).

    TPU note: a single variadic-reduce pass carrying (d2, index, normal-projection)
    — argmin with payload. One fused sweep over the ``B + (1+C, W)`` grid instead of
    argmin + a one-hot re-selection pass handing the dx/dy intermediates between two
    fusions (27% faster at 4096 envs on v5e, bit-identical output).
    """
    qx = jnp.concatenate([x[..., None], cx], axis=-1)    # B + (1+C,)
    qy = jnp.concatenate([y[..., None], cy], axis=-1)
    dx = qx[..., :, None] - wp_x[..., None, :]           # B + (1+C, W)
    dy = qy[..., :, None] - wp_y[..., None, :]
    d2 = dx * dx + dy * dy
    proj = dx * nrm_x[..., None, :] + dy * nrm_y[..., None, :]
    w = wp_x.shape[-1]
    idx = jnp.broadcast_to(jax.lax.broadcasted_iota(jnp.int32, (w,), 0), d2.shape)

    def reducer(a, b):
        ad, ai, ap = a
        bd, bi, bp = b
        # first-occurrence argmin (np.argmin tie-break): strict less, ties -> smaller
        # index. Lexicographic min over unique (d2, idx) pairs -> associative.
        take_b = (bd < ad) | ((bd == ad) & (bi < ai))
        return (jnp.where(take_b, bd, ad), jnp.where(take_b, bi, ai),
                jnp.where(take_b, bp, ap))

    init = (jnp.asarray(jnp.inf, d2.dtype), jnp.asarray(2**31 - 1, jnp.int32),
            jnp.asarray(0.0, proj.dtype))
    _, min_idx, min_proj = jax.lax.reduce(
        (d2, idx, proj), init, reducer, (d2.ndim - 1,)
    )
    progress = min_idx[..., 0].astype(wp_x.dtype) / jnp.asarray(n_wp, wp_x.dtype)
    dist = jnp.abs(min_proj[..., 1:])
    tw = jnp.asarray(track_width)
    return progress, jnp.any(dist > tw[..., None], axis=-1)


def rectangles_intersect(ax, ay, bx, by):
    """SAT intersection test for two oriented rectangles given their corners.

    ax, ay, bx, by: shape ``B + (4,)``. Returns bool ``B``.
    Uses the 2 unique edge normals of each rectangle (4 axes total), exactly as
    multi_car.py:16-43: gap on any axis (strict ``<`` comparisons) -> no intersection.
    """

    def edge_normals(cx, cy):
        # edges 0->1 and 1->2; normal = (-ey, ex)  (multi_car.py:19-22)
        ex = cx[..., 1:3] - cx[..., 0:2]
        ey = cy[..., 1:3] - cy[..., 0:2]
        return -ey, ex

    nax, nay = edge_normals(ax, ay)
    nbx, nby = edge_normals(bx, by)
    axx = jnp.concatenate([nax, nbx], axis=-1)  # B + (4,)
    axy = jnp.concatenate([nay, nby], axis=-1)

    # project all 4 corners of each rect on all 4 axes: B + (4 axes, 4 corners)
    pa = axx[..., :, None] * ax[..., None, :] + axy[..., :, None] * ay[..., None, :]
    pb = axx[..., :, None] * bx[..., None, :] + axy[..., :, None] * by[..., None, :]
    gap = (jnp.max(pa, -1) < jnp.min(pb, -1)) | (jnp.max(pb, -1) < jnp.min(pa, -1))
    return ~jnp.any(gap, axis=-1)


def raycast_cars(ox, oy, dx, dy, car_cx, car_cy, car_x, car_y, max_dist):
    """Min hit distance of rays against the edge segments of a set of cars.

    ox, oy, dx, dy: ray origin/dir, shape ``B``.
    car_cx, car_cy: car corners, shape ``B + (A, 4)`` (A cars visible to each ray).
    car_x, car_y: car centers, shape ``B + (A,)`` — any car whose center lies within
    0.5 of the ray origin is skipped entirely (the reference's self-exclusion test,
    multi_track.py:12-14, which also skips *opponents* that close).

    Returns shape ``B``: min over car-edge hits and ``max_dist`` (the car component is
    clamped to max_dist by construction, multi_track.py:8,24).
    """
    # skip mask per car (norm < 0.5 of center-origin distance)
    cdist = jnp.sqrt((car_x - ox[..., None]) ** 2 + (car_y - oy[..., None]) ** 2)
    skip = cdist < 0.5  # B + (A,)

    # car edges: start = corner i, vec = corner (i+1)%4 - corner i
    sx = car_cx
    sy = car_cy
    vx = jnp.roll(car_cx, -1, axis=-1) - car_cx
    vy = jnp.roll(car_cy, -1, axis=-1) - car_cy

    v1x = ox[..., None, None] - sx
    v1y = oy[..., None, None] - sy
    v3x = -dy[..., None, None]
    v3y = dx[..., None, None]
    dotp = vx * v3x + vy * v3y
    valid = (jnp.abs(dotp) >= _PARALLEL_EPS) & ~skip[..., None]
    safe = jnp.where(valid, dotp, 1.0)
    t = (vx * v1y - vy * v1x) / safe
    s = (v1x * v3x + v1y * v3y) / safe
    hit = valid & (t >= 0.0) & (s >= 0.0) & (s <= 1.0)
    tmin = jnp.min(jnp.where(hit, t, jnp.inf), axis=(-1, -2))
    return jnp.minimum(jnp.asarray(max_dist, tmin.dtype), jnp.where(jnp.isinf(tmin), max_dist, tmin))
