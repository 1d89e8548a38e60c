"""Rendering: pygame frames + OpenCV video writing, from device-logged trajectories.

Covers /root/reference/utils/visualization.py (470 LoC): world->screen transform,
track boundary/start-line drawing, car rectangles with path trails, HUD text, mp4
output at 60fps, and the labeled video-grid composer (visualization.py:413-471).

TPU-first structure: the hot path never renders. Episodes are rolled out on device
with stacked per-step state (``record_trajectory``), and rendering is an offline host
pass over the logged arrays. Imports are gated so headless training never touches
pygame/cv2.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..envs import multi as menv
from ..envs import single as senv
from ..envs import track as trk
from . import metrics as M


def _pygame():
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import pygame

    if not pygame.get_init():
        pygame.init()
    return pygame


@functools.lru_cache(maxsize=None)
def _record_single_jit(env_cfg: senv.RacingConfig, max_steps: int, deterministic: bool):
    """One jitted recorder per (env_cfg, horizon, mode); track/params/obs_norm are
    arguments, never closure constants (CLAUDE.md rule), so repeated renders of
    different models reuse the compiled program."""

    def run(params, log_std, track, key, obs_norm):
        def body(carry, key):
            state, obs, active = carry
            action = M._policy_action(params, log_std, obs.astype(jnp.float32), key,
                                      deterministic, obs_norm)
            nstate, nobs, rew, term, trunc, info = senv.step(env_cfg, track, state, action)
            done = term | trunc
            out = {
                "x": nstate.car.x, "y": nstate.car.y, "angle": nstate.car.angle,
                "speed": info["speed"], "progress": info["progress"],
                "reward": rew, "active": active,
            }
            nactive = active & ~done
            keep = lambda new, old: jnp.where(
                jnp.reshape(nactive, nactive.shape + (1,) * (new.ndim - 1)), new, old)
            return (jax.tree.map(keep, nstate, state),
                    jnp.where(nactive[:, None], nobs, obs), nactive), out

        state, obs = senv.reset(env_cfg, track)
        keys = jax.random.split(key, max_steps)
        _, traj = jax.lax.scan(body, (state, obs, jnp.ones((obs.shape[0],), bool)), keys)
        return traj

    return jax.jit(run)


def record_trajectory_single(params, log_std, env_cfg: senv.RacingConfig,
                             track: trk.TrackArrays, key, max_steps=2000,
                             deterministic=True, obs_norm=None):
    """Roll one (batch-1) episode on device; return stacked host arrays of
    x, y, angle, speed, progress, reward, done per step."""
    run = _record_single_jit(env_cfg, max_steps, deterministic)
    traj = {k: np.asarray(v)[:, 0]
            for k, v in run(params, log_std, track, key, obs_norm).items()}
    # rows where active=True entering the step: 0..done-step inclusive — the row
    # after that would re-step the frozen terminal state (re-firing e.g. the crash
    # penalty), so it is excluded
    n = int(traj["active"].sum())
    return {k: v[:n] for k, v in traj.items()}


@functools.lru_cache(maxsize=None)
def _record_multi_jit(env_cfg: menv.MultiRacingConfig, max_steps: int,
                      deterministic: bool, per_seat: bool = False):
    """Multi-car analog of _record_single_jit. ``per_seat``: params/log_std/
    obs_norm carry a leading seat axis — one policy per car (match rendering)."""

    def run(params, log_std, track, key, obs_norm):
        k_reset, k_run = jax.random.split(key)

        def body(carry, key):
            state, obs, active = carry
            n, a = state.x.shape
            if per_seat:
                action = jax.vmap(
                    lambda p, ls, o, k, nrm: M._policy_action(
                        p, ls, o, k, deterministic, nrm),
                    in_axes=(0, 0, 1, 0, 0), out_axes=1,
                )(params, log_std, obs.astype(jnp.float32),
                  jax.random.split(key, a), obs_norm)
            else:
                action = M._policy_action(params, log_std,
                                          obs.reshape((n * a, -1)).astype(jnp.float32),
                                          key, deterministic, obs_norm)
                action = action.reshape((n, a, -1))
            nstate, nobs, rew, term, trunc, info = menv.step(env_cfg, track, state, action)
            done = term | trunc
            out = {
                "x": nstate.x, "y": nstate.y, "angle": nstate.angle,
                "speed": info["speed"], "progress": info["progress"],
                "reward": rew, "active": active,
            }
            nactive = active & ~done
            keep = lambda new, old: jnp.where(
                jnp.reshape(nactive, nactive.shape + (1,) * (new.ndim - 1)), new, old)
            return (jax.tree.map(keep, nstate, state),
                    jnp.where(nactive[:, None, None], nobs, obs), nactive), out

        state, obs = menv.reset(env_cfg, track, key=k_reset)
        keys = jax.random.split(k_run, max_steps)
        _, traj = jax.lax.scan(body, (state, obs, jnp.ones((state.x.shape[0],), bool)), keys)
        return traj

    return jax.jit(run)


def record_trajectory_multi(params, log_std, env_cfg: menv.MultiRacingConfig,
                            track: trk.TrackArrays, key, max_steps=3000,
                            deterministic=True, obs_norm=None):
    """Shared-policy multi-car episode; arrays shaped [T, A]."""
    run = _record_multi_jit(env_cfg, max_steps, deterministic)
    traj = {k: np.asarray(v)[:, 0]
            for k, v in run(params, log_std, track, key, obs_norm).items()}
    # exclude the row after the done step (it re-steps the frozen terminal state)
    n = int(traj["active"].sum())
    return {k: v[:n] for k, v in traj.items()}


def record_trajectory_match(bundles, env_cfg: menv.MultiRacingConfig,
                            track: trk.TrackArrays, key, max_steps=3000,
                            deterministic=True):
    """Head-to-head episode with one policy per seat (tournament-style match);
    ``bundles`` is a list of (params, log_std, obs_norm_or_None), one per car.
    Arrays shaped [T, A]."""
    from ..tournament import stack_bundles

    p, ls, nrm = stack_bundles(bundles, env_cfg.obs_dim)
    run = _record_multi_jit(env_cfg, max_steps, deterministic, per_seat=True)
    traj = {k: np.asarray(v)[:, 0] for k, v in run(p, ls, track, key, nrm).items()}
    n = int(traj["active"].sum())
    return {k: v[:n] for k, v in traj.items()}


class TrackRenderer:
    """World->screen transform + static track drawing (visualization.py:6-59)."""

    CAR_COLORS = [(220, 60, 60), (60, 120, 220), (60, 200, 120), (220, 180, 60)]

    def __init__(self, geometry: dict, size=(800, 600), margin=40):
        self.pg = _pygame()
        self.size = size
        wp = geometry["waypoints"]
        width = geometry["track_width"]
        self.left = wp + geometry["normals"] * width
        self.right = wp - geometry["normals"] * width
        self.wp = wp
        allpts = np.vstack([self.left, self.right])
        mn, mx = allpts.min(0), allpts.max(0)
        scale = min((size[0] - 2 * margin) / max(mx[0] - mn[0], 1e-9),
                    (size[1] - 2 * margin) / max(mx[1] - mn[1], 1e-9))
        self.scale = scale
        self.offset = (
            margin - mn[0] * scale + (size[0] - 2 * margin - (mx[0] - mn[0]) * scale) / 2,
            margin - mn[1] * scale + (size[1] - 2 * margin - (mx[1] - mn[1]) * scale) / 2,
        )
        self.surface = self.pg.Surface(size)
        self.font = self.pg.font.SysFont(None, 22)

    def to_screen(self, pts):
        pts = np.atleast_2d(pts)
        x = pts[:, 0] * self.scale + self.offset[0]
        y = self.size[1] - (pts[:, 1] * self.scale + self.offset[1])  # y up -> down
        return np.stack([x, y], 1)

    def draw_track(self):
        s = self.surface
        s.fill((28, 30, 34))
        road = np.vstack([self.to_screen(self.left),
                          self.to_screen(self.right)[::-1]])
        self.pg.draw.polygon(s, (60, 62, 66), road.tolist())
        for boundary, color in ((self.left, (230, 230, 230)),
                                (self.right, (230, 230, 230))):
            pts = self.to_screen(boundary)
            self.pg.draw.lines(s, color, True, pts.tolist(), 2)
        # start line across the track at waypoint 0
        a = self.to_screen(self.left[0])[0]
        b = self.to_screen(self.right[0])[0]
        self.pg.draw.line(s, (240, 220, 60), a.tolist(), b.tolist(), 3)

    def draw_car(self, x, y, angle, color, half_length=2.0, half_width=1.0):
        ca, sa = np.cos(angle), np.sin(angle)
        local = np.array([[half_length, half_width], [half_length, -half_width],
                          [-half_length, -half_width], [-half_length, half_width]])
        world = local @ np.array([[ca, sa], [-sa, ca]]) + np.array([x, y])
        self.pg.draw.polygon(self.surface, color, self.to_screen(world).tolist())

    def draw_trail(self, xs, ys, color):
        if len(xs) > 1:
            pts = self.to_screen(np.stack([xs, ys], 1))
            self.pg.draw.lines(self.surface, color, False, pts.tolist(), 1)

    def draw_hud(self, lines: Sequence[str]):
        for i, text in enumerate(lines):
            img = self.font.render(text, True, (240, 240, 240))
            self.surface.blit(img, (8, 8 + 20 * i))

    def frame(self):
        """Current frame as an RGB ndarray [H, W, 3]."""
        arr = self.pg.surfarray.array3d(self.surface)
        return np.transpose(arr, (1, 0, 2))


def render_video(geometry: dict, traj: dict, out_path: str, fps: int = 60,
                 label: Optional[str] = None, size=(800, 600), trail=True,
                 frame_skip: int = 1):
    """Write an mp4 of a logged trajectory. ``traj`` arrays may be [T] (single car)
    or [T, A] (multi). Returns the number of frames written."""
    import cv2

    r = TrackRenderer(geometry, size=size)
    xs, ys, angles = traj["x"], traj["y"], traj["angle"]
    if xs.ndim == 1:
        xs, ys, angles = xs[:, None], ys[:, None], angles[:, None]
    T, A = xs.shape
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    # cumulative reward up to each step, so frame_skip > 1 doesn't drop the
    # rewards of skipped steps from the HUD total
    rew = traj.get("reward")
    cum_r = None
    if rew is not None:
        rew2 = np.asarray(rew).reshape(T, -1)[:, :A]
        cum_r = np.cumsum(rew2, axis=0)
    total_r = np.zeros(A)
    for t in range(0, T, frame_skip):
        r.draw_track()
        for a in range(A):
            if trail:
                r.draw_trail(xs[: t + 1, a], ys[: t + 1, a],
                             r.CAR_COLORS[a % len(r.CAR_COLORS)])
            r.draw_car(xs[t, a], ys[t, a], angles[t, a],
                       r.CAR_COLORS[a % len(r.CAR_COLORS)])
        if cum_r is not None:
            total_r = cum_r[t]
        prog = np.atleast_1d(traj["progress"][t]).reshape(-1)
        speed = np.atleast_1d(traj["speed"][t]).reshape(-1)
        hud = ([label] if label else []) + [
            f"step {t}  progress {prog[0]*100:.1f}%  speed {speed[0]:.1f}"
            f"  reward {total_r[0]:.1f}"
        ]
        r.draw_hud(hud)
        writer.write(cv2.cvtColor(r.frame(), cv2.COLOR_RGB2BGR))
    writer.release()
    return (T + frame_skip - 1) // frame_skip


def visualization_grid(video_paths: Sequence[str], model_names: Sequence[str],
                       output_path: str, cell=(400, 300), fps: int = 60):
    """Compose N videos into a labeled 2-column grid mp4 (visualization.py:413-471)."""
    import cv2

    caps = [cv2.VideoCapture(p) for p in video_paths]
    cols = 2
    rows = (len(caps) + cols - 1) // cols
    size = (cell[0] * cols, cell[1] * rows)
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    font = cv2.FONT_HERSHEY_SIMPLEX
    last = [None] * len(caps)
    wrote = 0
    while True:
        frames = []
        alive = 0
        for i, cap in enumerate(caps):
            ok, fr = cap.read()
            if ok:
                last[i] = fr
                alive += 1
            fr = last[i]
            if fr is None:
                fr = np.zeros((cell[1], cell[0], 3), np.uint8)
            fr = cv2.resize(fr, cell)
            cv2.putText(fr, model_names[i], (10, 24), font, 0.7, (255, 255, 255), 2)
            frames.append(fr)
        if alive == 0:
            break
        while len(frames) < rows * cols:
            frames.append(np.zeros((cell[1], cell[0], 3), np.uint8))
        grid = np.vstack([np.hstack(frames[r * cols:(r + 1) * cols])
                          for r in range(rows)])
        writer.write(grid)
        wrote += 1
    writer.release()
    for cap in caps:
        cap.release()
    return wrote


def eval_training(data: dict, output_path: str):
    """Normalized learning-curve overlay (utils/metrics.py:11-37): ``data`` maps
    label -> training_info JSON path."""
    import json

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    loaded = {}
    for name, filepath in data.items():
        with open(filepath) as f:
            loaded[name] = json.load(f)
    min_len = min(len(d["steps"]) for d in loaded.values())
    plt.figure(figsize=(12, 7))
    for name, d in loaded.items():
        steps = d["steps"][:min_len]
        rewards = np.asarray(d["rewards"][:min_len], float)
        span = rewards.max() - rewards.min()
        normalized = (rewards - rewards.min()) / (span if span > 0 else 1.0)
        plt.plot(steps, normalized, label=name, linewidth=2, alpha=0.6)
    plt.xlabel("Training Steps")
    plt.ylabel("Normalized Rewards")
    plt.title("Learning Speed Comparison")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_path, dpi=150)
    plt.close()
