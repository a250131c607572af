"""SDF reconstruction (3D consistency) residuals.

Re-design of `compute_sdf_loss` (`/root/reference/wild_completion/loss.py:219-242`):
the residual at each measured surface point (in object frame) is the decoded
SDF value itself; Jacobians chain the decoder input gradient to the shape
code directly and to the pose via the point-to-pose Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hortimapping_tpu.models.decoder import DecoderSpec, Params, decoder_sdf_and_input_grad
from hortimapping_tpu.ops.lie import (
    points_to_pose_jacobian_se3,
    points_to_pose_jacobian_sim3,
)


class SdfResiduals(NamedTuple):
    res: jnp.ndarray        # [N] sdf residuals
    jac: jnp.ndarray        # [N, pose_dim + C] (pose block first)
    point_ok: jnp.ndarray   # [N] bool validity (padding mask pass-through)


def sdf_residuals(
    params: Params,
    spec: DecoderSpec,
    latent: jnp.ndarray,       # [C]
    pts_obj: jnp.ndarray,      # [N, 3] surface points in object frame
    point_valid: jnp.ndarray,  # [N] bool (padding mask)
    scale_on: bool,
) -> SdfResiduals:
    n = pts_obj.shape[0]
    lat = jnp.broadcast_to(latent, (n,) + latent.shape)
    inputs = jnp.concatenate([lat, pts_obj], axis=-1)
    sdf, g = decoder_sdf_and_input_grad(params, spec, inputs)           # [N], [N, C+3]

    ds_dcode = g[:, : spec.code_length]
    ds_dx = g[:, spec.code_length :]
    if scale_on:
        dx_dT = points_to_pose_jacobian_sim3(pts_obj)                   # [N, 3, 7]
    else:
        dx_dT = points_to_pose_jacobian_se3(pts_obj)                    # [N, 3, 6]
    jac_pose = jnp.einsum("nk,nkp->np", ds_dx, dx_dT)

    okf = point_valid.astype(jnp.float32)
    res = sdf * okf
    jac = jnp.concatenate([jac_pose, ds_dcode], axis=-1) * okf[:, None]
    return SdfResiduals(res, jac, point_valid)
