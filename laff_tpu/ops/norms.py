"""Vector norms with reference-exact epsilon placement.

The reference adds its epsilons to the *norm* (denominator), not under the
sqrt (reference ``loss.py:8-21``): ``X / (sqrt(sum(X^2)) + eps + 1e-14)``.
Matching this exactly matters for checkpoint-parity evaluation, where tiny
normalization drift shifts ranks on near-tied scores.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-13, axis: int = -1) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)) + eps + 1e-14
    return x / norm


def l1norm(x: jnp.ndarray, eps: float = 1e-13, axis: int = -1) -> jnp.ndarray:
    norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True) + eps + 1e-14
    return x / norm
