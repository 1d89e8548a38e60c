"""Checkpoint schema versioning (VERDICT r4 #4).

Format v1 stores leaves name-addressed by flattened key path plus a
``format_version`` field, so a reordered/renamed pytree fails loudly at load
time instead of silently loading wrong leaves into wrong slots. Legacy (v0,
round ≤4) files still load positionally — including real round-4 self-play
checkpoints whose TrainState carried a dead device ``global_step`` leaf, which
load through the ``agent.ppo.legacy_v0_template`` shim and come out in the
current (dead-leaf-free) layout.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent import ppo
from self_play_racing_tpu.utils import checkpoint as ck

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4_CKPT = os.path.join(ROOT, "models", "checkpoint_update_50")


def test_v1_roundtrip_stores_names_and_version(tmp_path):
    path = str(tmp_path / "c.npz")
    tree = {"train": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
            "step": jnp.asarray(7, jnp.int32)}
    ck.save_pytree(path, tree, {"k": 1})
    assert ck.format_version(path) == ck.FORMAT_VERSION
    with np.load(path, allow_pickle=False) as data:
        names = [str(s) for s in data["leaf_names"]]
    # flattened key paths, in leaf order (dicts flatten by sorted key)
    assert names == ["['step']", "['train']['b']", "['train']['w']"]
    out, meta = ck.load_pytree(path, tree)
    assert meta == {"k": 1}
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v1_renamed_leaf_fails_loudly(tmp_path):
    path = str(tmp_path / "c.npz")
    tree = {"pool": jnp.zeros((5, 3)), "update": jnp.zeros((), jnp.int32)}
    ck.save_pytree(path, tree)
    renamed = {"pool": jnp.zeros((5, 3)), "step": jnp.zeros((), jnp.int32)}
    with pytest.raises(ValueError, match=r"\['update'\]"):
        ck.load_pytree(path, renamed)
    with pytest.raises(ValueError, match=r"\['step'\]"):
        ck.load_pytree(path, renamed)


def test_v1_reordered_fields_fail_loudly(tmp_path):
    """The round-3 failure class: same leaf shapes/dtypes in a different
    structural position must NOT load positionally. Two same-shape leaves
    swapped between containers is indistinguishable by shape/dtype — only the
    key paths catch it."""
    path = str(tmp_path / "c.npz")
    tree = {"a": {"x": jnp.zeros((4,))}, "b": {"y": jnp.zeros((4,))}}
    ck.save_pytree(path, tree)
    swapped = {"a": {"y": jnp.zeros((4,))}, "b": {"x": jnp.zeros((4,))}}
    with pytest.raises(ValueError, match="does not match the template's pytree"):
        ck.load_pytree(path, swapped)


def test_v1_missing_and_extra_leaves_fail_loudly(tmp_path):
    path = str(tmp_path / "c.npz")
    tree = {"pool": jnp.zeros((5, 3))}
    ck.save_pytree(path, tree)
    grown = {"pool": jnp.zeros((5, 3)), "extra": jnp.zeros(())}
    with pytest.raises(ValueError, match="missing from checkpoint"):
        ck.load_pytree(path, grown)
    ck.save_pytree(path, grown)
    with pytest.raises(ValueError, match="unknown to template"):
        ck.load_pytree(path, tree)


def test_train_state_has_no_dead_leaf():
    cfg_names = [f.name for f in ppo.TrainState.__dataclass_fields__.values()]
    assert "global_step" not in cfg_names
    assert cfg_names == ["params", "opt_state", "update"]


def _round4_trainer():
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import PPOConfig
    from self_play_racing_tpu.envs import multi as menv
    from self_play_racing_tpu.train import make_training_pool

    with open(R4_CKPT + ".meta.json") as f:
        meta = json.load(f)
    ckcfg = dict(meta["config"])
    ckcfg["hidden"] = tuple(ckcfg["hidden"])
    cfg = PPOConfig(**ckcfg)
    np.random.seed(cfg.seed)
    track = make_training_pool(cfg)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    return SelfPlayTrainer(cfg, env_cfg, track)


@pytest.mark.skipif(not os.path.exists(R4_CKPT + ".npz"),
                    reason="round-4 checkpoint not present")
def test_legacy_round4_checkpoint_loads_through_shim(tmp_path):
    """A REAL round-4 flagship checkpoint (index-addressed v0, dead global_step
    leaf as its final TrainState leaf) loads through the legacy shim into the
    current layout, and re-saves as v1."""
    assert ck.format_version(R4_CKPT) == 0
    tr = _round4_trainer()
    tr.load_checkpoint(R4_CKPT)
    assert int(tr.runner.train.update) == 50
    assert tr.num_snapshots == 3 and tr.pool_count == 3
    assert not hasattr(tr.runner.train, "global_step")
    # params actually loaded (orthogonal init would differ from trained weights)
    w0 = np.asarray(jax.tree.leaves(tr.runner.train.params)[0])
    assert np.isfinite(w0).all() and np.abs(w0).max() > 0

    # migration: the re-save is v1 and round-trips name-addressed
    out = str(tmp_path / "migrated")
    tr.save_checkpoint(out)
    assert ck.format_version(out) == ck.FORMAT_VERSION
    tr2 = _round4_trainer()
    tr2.load_checkpoint(out)
    for a, b in zip(jax.tree.leaves(tr.runner.train.params),
                    jax.tree.leaves(tr2.runner.train.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tr.pool), jax.tree.leaves(tr2.pool)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.exists(R4_CKPT + ".npz"),
                    reason="round-4 checkpoint not present")
def test_legacy_round4_without_shim_fails_loudly():
    """Loading a v0 file against the NEW TrainState template (one fewer leaf)
    must error, not positionally misload."""
    tr = _round4_trainer()
    with pytest.raises(ValueError, match="legacy .v0. checkpoint"):
        ck.load_pytree(R4_CKPT, tr._ckpt_tree())
