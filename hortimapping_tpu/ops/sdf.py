"""SDF <-> occupancy conversions (reference: `/root/reference/wild_completion/utils.py:125-142`).

Used by the differentiable renderer: occupancy is 1 deep inside the object,
0 in free space, with a linear ramp (clamp) or logistic falloff of width set
by the occupancy cutoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Ratio between the sigma of a Gaussian fit and the logistic slope used by the
# reference when converting the SDF cutoff into a sigmoid scale
# (`wild_completion/loss.py:59-60`).
LOGISTIC_GAUSSIAN_RATIO = 0.55


def sdf_to_occupancy(sdf: jnp.ndarray, th: float = 0.01) -> jnp.ndarray:
    """Linear ramp: occ = 0.5 - clamp(sdf, -th, th) / (2 th)."""
    return 0.5 - jnp.clip(sdf, -th, th) / (2.0 * th)


def sdf_to_occupancy_log(sdf: jnp.ndarray, sigma: float = 0.01) -> jnp.ndarray:
    """Logistic: occ = sigmoid(-sdf / sigma)."""
    return jax.nn.sigmoid(-sdf / sigma)


def logistic_sigma(occ_cutoff: float) -> float:
    """Sigmoid scale derived from the cutoff, as in `loss.py:59-60`."""
    return occ_cutoff / 3.0 * LOGISTIC_GAUSSIAN_RATIO
