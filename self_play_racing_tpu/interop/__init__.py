"""Interop with external ecosystems (torch checkpoints, SB3-style baselines)."""
