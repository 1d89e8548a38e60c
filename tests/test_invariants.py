"""Property / fuzz tests: long random rollouts must preserve env invariants.

These guard the branch-free rewrite against masking bugs that parity tests (which
follow specific trajectories) might miss: no NaN/Inf anywhere, progress in [0, 1),
sticky flags stay sticky, checkpoint monotonicity, step counters, placement validity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.envs import vector


def _finite(tree):
    return all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(tree)
               if np.asarray(l).dtype.kind == "f")


def test_single_env_invariants_under_fuzz():
    n = 32
    pool = trk.make_track_pool(trk.gen_tracks(4, seed=3), [5.0, 6.5, 8.0, 9.5])
    track = trk.gather_tracks(pool, np.arange(n) % 4)
    cfg = senv.RacingConfig(num_sensors=11)
    state, obs = senv.reset(cfg, track)
    vs = vector.init(state, n, jax.random.key(0))
    step = jax.jit(lambda vs, a: vector.step(
        vs, a,
        lambda s, a_, k: senv.transition(cfg, track, s, a_),
        lambda s: senv.observe(cfg, track, s),
        lambda k: senv.reset_state(cfg, track),
    ))
    rng = np.random.RandomState(0)
    prev_cp = np.zeros((n, 3), bool)
    for t in range(600):
        # adversarial actions: huge magnitudes, NaN-free but out of range
        a = jnp.asarray(rng.uniform(-10, 10, (n, 2)), jnp.float32)
        vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
        env = vs.env
        assert _finite((obs, rew, env.car.x, env.car.y, env.car.vx, env.car.vy))
        p = np.asarray(env.car.progress)
        assert ((p >= 0) & (p < 1)).all()
        speed = np.sqrt(np.asarray(env.car.vx) ** 2 + np.asarray(env.car.vy) ** 2)
        assert (speed <= cfg.car.max_speed + 1e-3).all()
        cp = np.stack([np.asarray(env.cp25), np.asarray(env.cp50),
                       np.asarray(env.cp75)], 1)
        fresh = np.asarray(vs.pending_reset) | (np.asarray(env.steps) <= 1)
        # checkpoints never un-set within an episode
        assert (cp | ~prev_cp | fresh[:, None]).all()
        prev_cp = cp & ~fresh[:, None]
    assert int(np.asarray(env.steps).max()) > 0


def test_multi_env_invariants_under_fuzz():
    n = 16
    pool = trk.make_track_pool(trk.gen_tracks(4, seed=5), [6.0] * 4)
    track = trk.gather_tracks(pool, np.arange(n) % 4)
    cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    key = jax.random.key(1)
    state, obs = menv.reset(cfg, track, key=key)
    step = jax.jit(lambda s, a: menv.step(cfg, track, s, a))
    rng = np.random.RandomState(1)
    dones = 0
    for t in range(500):
        a = jnp.asarray(rng.uniform(-5, 5, (n, 2, 2)), jnp.float32)
        state, obs, rew, term, trunc, info = step(state, a)
        assert _finite((obs, rew, state.x, state.vx))
        # crashed is sticky within the episode
        if t > 0:
            assert (np.asarray(state.crashed) | ~prev_crashed).all()
        prev_crashed = np.asarray(state.crashed)
        d = np.asarray(term | trunc)
        if d.any():
            dones += int(d.sum())
            pl = np.asarray(info["placement"])
            for i in np.nonzero(d)[0]:
                assert sorted(pl[i].tolist()) == [1, 2]
            # manual reset of finished envs (functional API leaves this to the caller)
            key, k = jax.random.split(key)
            fresh = menv.reset_state(cfg, track, key=k)
            state = jax.tree.map(
                lambda f, s: jnp.where(
                    jnp.reshape(jnp.asarray(d), d.shape + (1,) * (s.ndim - 1)), f, s
                ), fresh, state,
            )
            prev_crashed = np.asarray(state.crashed)
    assert dones > 0


def test_checkpoint_npz_path_and_key_roundtrip(tmp_path):
    """save/load agree on the meta sidecar for .npz-suffixed paths, and typed
    PRNG key leaves survive the round trip (rewrapped from raw key_data)."""
    import jax
    import jax.numpy as jnp
    from self_play_racing_tpu.utils import checkpoint as ckpt

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "key": jax.random.key(42)}
    path = str(tmp_path / "state.npz")
    ckpt.save_pytree(path, tree, {"tag": 7})
    out, meta = ckpt.load_pytree(path, tree)
    assert meta == {"tag": 7}
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
    # the restored key must be a *typed* key usable by jax.random
    k1, k2 = jax.random.split(out["key"])
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(out["key"])),
        np.asarray(jax.random.key_data(tree["key"])))


def test_multi_env_single_agent_config():
    """num_agents=1 is a valid MultiRacingEnv configuration (empty opponent
    block, like the reference's empty opp_features concatenate)."""
    import jax
    import jax.numpy as jnp
    from self_play_racing_tpu.envs import multi as menv
    from self_play_racing_tpu.envs import track as trk

    cfg = menv.MultiRacingConfig(num_agents=1, num_sensors=11)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0, 0])
    state, obs = menv.reset(cfg, track, key=jax.random.key(0))
    assert obs.shape == (2, 1, cfg.obs_dim)
    state, obs2, rew, term, trunc, info = menv.step(
        cfg, track, state, jnp.zeros((2, 1, 2), jnp.float32))
    assert obs2.shape == (2, 1, cfg.obs_dim)
    assert np.isfinite(np.asarray(rew)).all()
