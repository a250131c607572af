"""Clean-room sparse mirror of the reference render-loss semantics, in numpy.

Follows the documented behavior of `wild_completion/loss.py` (dynamic index
sets, per-ray scatter averaging) with explicit per-ray python loops so the
masked-dense TPU kernel can be differentially tested against it. SDF values
and input gradients come from the same JAX decoder under test, so any
mismatch isolates the renderer math itself.
"""

from __future__ import annotations

import numpy as np

from hortimapping_tpu.models.decoder import decoder_sdf_and_input_grad


def sparse_render_reference(
    params,
    spec,
    latent,
    rays,            # (R, 3) fg rows first
    n_fg,            # int: rays[:n_fg] are foreground
    depth_obs,       # (R,)
    T_oc,            # (4, 4)
    sampled_depths,  # (M,)
    *,
    scale_on=False,
    log_occ_on=False,
    occ_cutoff=0.01,
    bbx_radius=0.1,
    occlusion_on=True,
    occlusion_th=0.03,
    min_valid_sample=100,
    min_grad_th=1e-6,
):
    """Returns dict with per-ray residuals/jacobians keyed by ray index,
    or None if the frame is invalid (too few in-radius samples)."""
    import jax.numpy as jnp

    R = rays.shape[0]
    M = sampled_depths.shape[0]
    C = spec.code_length
    pose_dim = 7 if scale_on else 6

    pts_cam = rays[:, None, :] * sampled_depths[None, :, None]
    pts_obj = pts_cam @ T_oc[:3, :3].T + T_oc[:3, 3]

    valid = np.linalg.norm(pts_obj, axis=-1) < bbx_radius
    if valid.sum() < min_valid_sample:
        return None

    lat = np.broadcast_to(np.asarray(latent), (R, M, C))
    inp = np.concatenate([lat, pts_obj], axis=-1).astype(np.float32)
    sdf_j, g_j = decoder_sdf_and_input_grad(params, spec, jnp.asarray(inp))
    sdf = np.asarray(sdf_j)
    grad = np.asarray(g_j)

    if log_occ_on:
        sigma = occ_cutoff / 3.0 * 0.55
        occ_of = lambda s: 1.0 / (1.0 + np.exp(s / sigma))
    else:
        occ_of = lambda s: 0.5 - np.clip(s, -occ_cutoff, occ_cutoff) / (2 * occ_cutoff)

    occ = np.zeros((R, M), np.float64)
    occ[valid] = occ_of(sdf[valid])

    d_min, d_max = sampled_depths[0], sampled_depths[-1]
    delta_d = (d_max - d_min) / (M - 1)
    d_term_bg = d_max + delta_d

    out = {
        "res_d": {}, "jac_d": {}, "res_m": {}, "jac_m": {},
    }

    for r in range(R):
        acc_trans = np.cumprod(1.0 - occ[r], axis=-1)
        acc_aug = np.concatenate([[1.0], acc_trans[:-1]])
        term_prob = occ[r] * acc_aug
        term_end = acc_trans[-1]
        occ_ray = term_prob.sum()
        d_u = (sampled_depths * term_prob).sum() + d_term_bg * term_end

        is_fg = r < n_fg
        # occlusion rejection (whole ray: d_u identical for all its samples)
        if occlusion_on and (not is_fg) and depth_obs[r] > 0 and depth_obs[r] < d_u - occlusion_th:
            continue

        target = depth_obs[r] if is_fg else d_term_bg

        sum_jac_d = np.zeros(pose_dim + C)
        sum_jac_m = np.zeros(pose_dim + C)
        n_surv = 0
        for m in range(M):
            if not valid[r, m]:
                continue
            s = sdf[r, m]
            if not (-occ_cutoff < s < occ_cutoff):
                continue
            o = occ[r, m]
            de_do = acc_trans[m:].sum() * delta_d / (1.0 - o)
            if de_do <= min_grad_th:
                continue
            dm_do = term_end / (1.0 - o)
            if log_occ_on:
                do_ds = -o * (1.0 - o) / sigma
            else:
                do_ds = -1.0 / (2.0 * occ_cutoff)
            de_ds = de_do * do_ds
            dm_ds = dm_do * do_ds

            ds_dcode = grad[r, m, :C]
            ds_dx = grad[r, m, C:]
            x = pts_obj[r, m]
            hat = np.array([[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]])
            if scale_on:
                dx_dT = np.concatenate([np.eye(3), -hat, x[:, None]], axis=-1)
            else:
                dx_dT = np.concatenate([np.eye(3), -hat], axis=-1)
            ds_dT = ds_dx @ dx_dT

            sum_jac_d += de_ds * np.concatenate([ds_dT, ds_dcode])
            sum_jac_m += dm_ds * np.concatenate([ds_dT, ds_dcode])
            n_surv += 1

        if n_surv == 0:
            continue
        out["res_d"][r] = target - d_u
        out["res_m"][r] = occ_ray - (1.0 if is_fg else 0.0)
        out["jac_d"][r] = sum_jac_d
        out["jac_m"][r] = sum_jac_m

    return out
