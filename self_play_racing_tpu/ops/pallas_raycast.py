"""Pallas TPU kernel: wall raycast with track-shared geometry.

The XLA path (ops.geometry.raycast_walls) reads *per-env* copies of the segment
arrays — [num_envs, S] — because each env may race a different track. When envs are
grouped so that every block of ``BLOCK_ENVS`` envs shares one track, this kernel
instead keeps one [S] copy per *track* in HBM and uses scalar-prefetched block→track
indices to DMA the right track's geometry into VMEM once per env block: geometry
traffic drops by a factor of ``BLOCK_ENVS`` and the HBM footprint by
``num_envs / num_tracks``.

Math is identical to ops.geometry.raycast_walls (reference semantics from
/root/reference/environment/track.py:173-199 — including the unclamped-hit quirk).

Layout: grid over env blocks; rays statically unrolled inside the kernel so the
block's geometry row and the ray-independent cross term are computed once and reused
across all sensors.

Measured on one v5e chip (11 rays, 896 segments, 128-step scans, tunnel floor
subtracted): the fused XLA path wins at every batch size tested — ~47 vs ~76 ns
per env-step at 4096 envs, ~45 vs ~60 at 16384, ~52 vs ~69 at 65536. XLA's fusion
of this elementwise+reduce pattern runs at the VPU roofline, and its per-env
geometry reads stay hidden under the compute even at 64K envs. This kernel is
therefore NOT the default at any measured scale; it is kept as (a) the HBM
*capacity* path — geometry stays [num_tracks, S] instead of [num_envs, S], a
num_envs/num_tracks footprint reduction that matters when per-env gathered
geometry would not fit — and (b) a worked TPU-Pallas example of scalar-prefetched
block->row DMA. Outputs are bit-identical to the XLA path on TPU.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1-D f32 operands get an XLA layout tiled at 1024; Mosaic requires the block to
# match, so env blocks are 1024 envs.
DEFAULT_BLOCK_ENVS = 1024


def _kernel(ids_ref, ox_ref, oy_ref, ang_ref,
            sx_ref, sy_ref, vx_ref, vy_ref, c_ref, out_ref, *,
            rel_angles, max_dist):
    b = pl.program_id(0)
    tid = ids_ref[b]                     # this block's track row
    ox = ox_ref[:]                       # [BN]
    oy = oy_ref[:]
    ang = ang_ref[:]

    # the whole (small) track pool sits in VMEM; take this block's row once,
    # reuse it across all rays
    sx = sx_ref[tid, :]                  # [S]
    sy = sy_ref[tid, :]
    vx = vx_ref[tid, :]
    vy = vy_ref[tid, :]
    c = c_ref[tid, :]

    # cn is ray-independent: one [BN, S] pass shared by every sensor
    cn = oy[:, None] * vx[None, :] - ox[:, None] * vy[None, :] + c[None, :]

    for r, rel in enumerate(rel_angles):  # static unroll over sensors
        world = ang + jnp.float32(rel)
        dx = jnp.cos(world)
        dy = jnp.sin(world)
        # dotp = v2y*dx - v2x*dy ; sn = (dx*oy - dy*ox) + dy*sx - dx*sy
        dotp = vy[None, :] * dx[:, None] - vx[None, :] * dy[:, None]
        u = dx * oy - dy * ox
        sn = u[:, None] + dy[:, None] * sx[None, :] - dx[:, None] * sy[None, :]
        valid = jnp.abs(dotp) > 1e-10
        inv = 1.0 / jnp.where(valid, dotp, 1.0)
        t = cn * inv
        ss = sn * inv
        hit = valid & (t >= 0.0) & (ss >= 0.0) & (ss <= 1.0)
        tmin = jnp.min(jnp.where(hit, t, jnp.inf), axis=-1)
        out_ref[:, r] = jnp.where(jnp.isinf(tmin), jnp.float32(max_dist), tmin)


@functools.partial(
    jax.jit,
    static_argnames=("rel_angles", "max_dist", "block_envs", "interpret"),
)
def raycast_walls_grouped(ox, oy, angle, block_track_ids,
                          seg_sx, seg_sy, seg_vx, seg_vy, seg_c,
                          rel_angles, max_dist=50.0,
                          block_envs=DEFAULT_BLOCK_ENVS, interpret=False):
    """Raycast for track-grouped env batches.

    ox, oy, angle: [N] f32 car poses; env i uses track ``block_track_ids[i//block_envs]``
    (all envs within a block must share a track).
    seg_*: [K, S] per-track geometry (from a TrackArrays *pool*, not gathered per env).
    rel_angles: tuple of R static relative sensor angles.
    Returns [N, R] hit distances.
    """
    n = ox.shape[0]
    assert n % block_envs == 0, (n, block_envs)
    nb = n // block_envs
    r = len(rel_angles)

    env_spec = pl.BlockSpec((block_envs,), lambda b, ids: (b,),
                            memory_space=pltpu.VMEM)
    # whole pool resident in VMEM (K*S*4B per array; 16 tracks x 896 segs = 57KB each)
    seg_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, rel_angles=rel_angles, max_dist=float(max_dist)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                env_spec, env_spec, env_spec,            # ox, oy, angle
                seg_spec, seg_spec, seg_spec, seg_spec, seg_spec,
            ],
            out_specs=pl.BlockSpec((block_envs, r), lambda b, ids: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, r), jnp.float32),
        interpret=interpret,
    )(block_track_ids.astype(jnp.int32),
      ox.astype(jnp.float32), oy.astype(jnp.float32), angle.astype(jnp.float32),
      *(a.astype(jnp.float32) for a in (seg_sx, seg_sy, seg_vx, seg_vy, seg_c)))
    return out


def group_envs_by_track(num_envs: int, num_tracks: int,
                        block_envs: int = DEFAULT_BLOCK_ENVS):
    """Contiguous env->track assignment where each block shares one track.

    Returns (track_ids [num_envs], block_track_ids [num_envs // block_envs]).
    """
    assert num_envs % block_envs == 0
    nb = num_envs // block_envs
    block_ids = np.arange(nb) % num_tracks
    return np.repeat(block_ids, block_envs), block_ids
