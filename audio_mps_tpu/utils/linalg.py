"""Small linear-algebra helpers.

`symmetrize` mirrors the reference utility (reference: utils.py:5-8) —
kept for API parity with the legacy full-Hamiltonian model (the reference
imports it at model.py:3 but its current classes no longer use it).
"""
from __future__ import annotations

import jax.numpy as jnp


def symmetrize(M):
    """Lower triangle + its transpose − diagonal: makes M symmetric using
    only its lower-triangular part (reference: utils.py:5-8)."""
    lower = jnp.tril(M)
    return lower + lower.T - jnp.diag(jnp.diag(M))
