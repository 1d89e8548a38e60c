"""Compute kernels: geometry, car dynamics, GAE — pure jnp, batched, branch-free."""
