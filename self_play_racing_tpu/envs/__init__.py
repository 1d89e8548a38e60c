"""Functional racing environments: track generation, single-agent, multi-agent,
self-play view, and lockstep vectorization with autoreset + episode statistics."""
