"""Hyperparameter configs mirroring the reference's dict contract."""
from .base import PPOConfig, base_config, self_play_config

__all__ = ["PPOConfig", "base_config", "self_play_config"]
