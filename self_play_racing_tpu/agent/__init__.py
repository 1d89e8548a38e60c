"""Trainers: from-scratch PPO and snapshot-pool self-play PPO, fully jitted."""
