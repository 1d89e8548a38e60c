"""SB3 training-logger callback (reference utils/sb3_logger.py:4-26 equivalent).

Appends the mean episode reward of each rollout and dumps the same
``{"steps": [...], "rewards": [...]}`` JSON the native trainers write, so
``utils.viz.eval_training`` can overlay SB3 baselines with our learning curves.
Uses stable_baselines3's BaseCallback when installed, else the vendored
sb3_compat one (interop/sb3_compat.py) — the callback protocol is identical.
"""
from __future__ import annotations

import json

try:
    from stable_baselines3.common.callbacks import BaseCallback
except ImportError:  # SB3 absent: the vendored compat callback base
    from ..interop.sb3_compat import BaseCallback


class TrainingLoggerCallback(BaseCallback):
    def __init__(self, save_path="data/training_info_sb3.json", verbose=0):
        super().__init__(verbose)
        self.save_path = save_path
        self.training_info = {"steps": [], "rewards": []}

    def _on_step(self) -> bool:
        return True

    def _on_rollout_end(self) -> None:
        buf = self.model.ep_info_buffer
        if buf:
            mean_reward = sum(ep["r"] for ep in buf) / len(buf)
            self.training_info["steps"].append(self.num_timesteps)
            self.training_info["rewards"].append(float(mean_reward))

    def _on_training_end(self) -> None:
        try:
            with open(self.save_path, "w") as f:
                json.dump(self.training_info, f, indent=2)
        except OSError as e:
            print(f"Warning: could not save training data: {e}")
