"""TPU-native self-play racing RL framework.

A from-scratch JAX/XLA re-design of the capabilities of LucasHJin/self-play-racing:
procedural racing environments (bicycle-style car dynamics, raycast sensors against
spline track boundaries, car-car SAT collisions, progress/checkpoint/placement reward
shaping), a from-scratch PPO learner (GAE, LR/log-std annealing, KL early stopping,
clipped value loss), and a snapshot-pool self-play trainer — all as a fully vectorized,
branch-free, on-device engine stepping thousands of environments in lockstep under
``jit``, scaling the env batch over ``jax.sharding`` meshes.

Layer map (mirrors reference layers, see SURVEY.md §1):

- ``ops``       — geometry/dynamics/GAE kernels (pure jnp, SoA layouts for the VPU)
- ``envs``      — track generation + functional single/multi/self-play environments
- ``models``    — actor-critic MLP (orthogonal init, annealed log-std buffer)
- ``agent``     — PPO + self-play trainers (single fused jit per update)
- ``parallel``  — device mesh / sharding / multi-host utilities
- ``utils``     — eval metrics, checkpointing, visualization, profiling
- ``configs``   — hyperparameter configs mirroring the reference's dict contract
"""

__version__ = "0.1.0"

# Lazy top-level exports of the main user-facing entry points; resolved on first
# access so that `import self_play_racing_tpu` stays light and optional deps
# (gymnasium for the adapters, cv2/pygame for viz) are only touched when used.
_EXPORTS = {
    "PPOConfig": ".configs",
    "base_config": ".configs",
    "self_play_config": ".configs",
    "PPOTrainer": ".agent.trainer",
    "SelfPlayTrainer": ".agent.self_play",
    "RacingEnv": ".envs.gym_adapter",
    "MultiRacingEnv": ".envs.gym_adapter",
    "SelfPlayWrapper": ".envs.gym_adapter",
    "Policy": ".serve",
    "load_policy": ".evaluate",
    "load_policy_bundle": ".evaluate",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target, __name__), name)


def __dir__():
    return __all__
