"""Huber robust kernel (reference: `/root/reference/wild_completion/utils.py:327-358`).

The reference computes w = sqrt(rho(|r|)) / |r| with
rho(x) = x^2 inside the window and 2 b x - b^2 outside, then multiplies JtJ
and Jtr by w^2. Inside the window w = 1, outside w = sqrt(2b|r| - b^2)/|r|.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def huber_weights(res_norm: jnp.ndarray, b: float) -> jnp.ndarray:
    """w(|r|) = sqrt(rho(|r|))/|r|; w = 1 inside the window.

    Matches the reference exactly, including the quirk that w(0) = 0 (the
    reference guards the division with x[x==0] = 1 while rho(0) = 0,
    `utils.py:337-338`); harmless since zero residuals contribute nothing.
    """
    x = jnp.abs(res_norm)
    rho = jnp.where(x <= b, x * x, 2.0 * b * x - b * b)
    x_safe = jnp.where(x == 0.0, 1.0, x)
    return jnp.sqrt(jnp.maximum(rho, 0.0)) / x_safe


def robust_residuals(res: jnp.ndarray, b: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (w * r, w^2); w^2 reweights JtJ / Jtr in the normal equations."""
    w = huber_weights(res, b)
    return w * res, w * w
