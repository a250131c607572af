"""Pytree containers for the fused LM optimization.

All arrays are fixed-shape; validity is carried in boolean masks so a batch
of fruits (leading axis via `vmap`) is one static XLA program. The
per-instance skip/continue control flow of the reference
(`optimizer.py:130-141,173-175`) becomes the `failed`/`done` lane flags.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FruitObservations(NamedTuple):
    """Per-fruit observation buffers (one fruit; add a leading axis to batch).

    Rays are laid out foreground-first: rows [0, n_fg) are fg samples, rows
    [n_fg, R) are bg samples (static split — `is_fg` is index < n_fg).
    """

    T_wc: jnp.ndarray          # [F, 4, 4] camera-to-world poses
    rays: jnp.ndarray          # [F, R, 3] cam-frame ray directions
    ray_valid: jnp.ndarray     # [F, R] bool padding mask
    depth_obs: jnp.ndarray     # [F, R] observed depths (0 = none)
    frame_valid: jnp.ndarray   # [F] bool
    points_w: jnp.ndarray      # [P, 3] measured surface points, world frame
    point_valid: jnp.ndarray   # [P] bool


class OptState(NamedTuple):
    """LM loop carry (per fruit)."""

    latent: jnp.ndarray        # [C]
    T_ow: jnp.ndarray          # [4, 4] world -> object (Sim(3))
    i: jnp.ndarray             # [] int32 next iteration index
    iter_count: jnp.ndarray    # [] int32 completed iterations (reference semantics)
    done: jnp.ndarray          # [] bool lane finished (converged | max-iter | failed)
    failed: jnp.ndarray        # [] bool no valid observations ("submap not valid")
    converged: jnp.ndarray     # [] bool a convergence TEST fired (vs max-iter cutoff)


class OptResult(NamedTuple):
    latent: jnp.ndarray
    T_ow: jnp.ndarray
    iter_count: jnp.ndarray
    failed: jnp.ndarray
    converged: jnp.ndarray


def init_state(latent: jnp.ndarray, T_ow: jnp.ndarray, i0: int = 0) -> OptState:
    return OptState(
        latent=latent,
        T_ow=T_ow,
        i=jnp.int32(i0),
        iter_count=jnp.int32(i0),
        done=jnp.asarray(False),
        failed=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
