"""Differential tests: masked-dense render kernel vs sparse reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hortimapping_tpu.models.decoder import init_decoder_params
from hortimapping_tpu.ops.recon import sdf_residuals
from hortimapping_tpu.ops.render import RenderConfig, render_residuals
from tests.render_ref import sparse_render_reference


def _scene(seed, R_fg=24, R_bg=24, M=24, radius=0.1):
    """Camera at origin looking down +z at an object centered ~0.3 m away."""
    rng = np.random.default_rng(seed)
    R = R_fg + R_bg
    # fg rays point near the object center, bg rays spread wider
    ang_fg = rng.normal(size=(R_fg, 2)) * 0.08
    ang_bg = rng.normal(size=(R_bg, 2)) * 0.35
    ang = np.concatenate([ang_fg, ang_bg])
    rays = np.concatenate([ang, np.ones((R, 1))], axis=-1).astype(np.float32)
    depth_obs = (0.3 + rng.normal(size=R) * 0.03).astype(np.float32)
    depth_obs[R_fg + 2] = 0.0  # a bg ray without depth
    # object frame: shifted/rotated slightly, mild scale
    T_co = np.eye(4, dtype=np.float32)
    T_co[:3, 3] = [0.01, -0.02, 0.3]
    c, s = np.cos(0.2), np.sin(0.2)
    T_co[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) * 1.1
    T_oc = np.linalg.inv(T_co).astype(np.float32)
    depths = np.linspace(0.2, 0.42, M).astype(np.float32)
    return rays, depth_obs, T_oc, depths


@pytest.mark.parametrize("scale_on", [False, True])
@pytest.mark.parametrize("log_occ", [False, True])
@pytest.mark.parametrize("occlusion", [False, True])
def test_render_parity(small_spec, scale_on, log_occ, occlusion):
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(1), (small_spec.code_length,)) * 0.05
    R_fg = 24
    rays, depth_obs, T_oc, depths = _scene(3)
    R = rays.shape[0]

    cfg = RenderConfig(
        scale_on=scale_on,
        log_occ_on=log_occ,
        occ_cutoff=0.15,
        occlusion_on=occlusion,
        min_valid_sample=10,
    )
    got = render_residuals(
        params, small_spec, latent,
        jnp.asarray(rays),
        jnp.arange(R) < R_fg,
        jnp.ones(R, bool),
        jnp.asarray(depth_obs),
        jnp.asarray(T_oc),
        jnp.asarray(depths),
        jnp.float32(0.12),
        cfg,
    )

    ref = sparse_render_reference(
        params, small_spec, latent, rays, R_fg, depth_obs, T_oc, depths,
        scale_on=scale_on, log_occ_on=log_occ, occ_cutoff=0.15,
        bbx_radius=0.12, occlusion_on=occlusion, min_valid_sample=10,
    )
    assert ref is not None
    assert bool(got.frame_ok)

    ok = np.asarray(got.ray_ok)
    ref_rays = set(ref["res_d"].keys())
    got_rays = set(np.nonzero(ok)[0].tolist())
    assert got_rays == ref_rays, f"surviving-ray sets differ: {got_rays ^ ref_rays}"
    assert len(ref_rays) > 5  # scenario exercises real geometry

    res_d, jac_d = np.asarray(got.res_d), np.asarray(got.jac_d)
    res_m, jac_m = np.asarray(got.res_m), np.asarray(got.jac_m)
    for r in ref_rays:
        np.testing.assert_allclose(res_d[r], ref["res_d"][r], atol=2e-5, err_msg=f"res_d ray {r}")
        np.testing.assert_allclose(res_m[r], ref["res_m"][r], atol=2e-5, err_msg=f"res_m ray {r}")
        np.testing.assert_allclose(jac_d[r], ref["jac_d"][r], atol=3e-4, err_msg=f"jac_d ray {r}")
        np.testing.assert_allclose(jac_m[r], ref["jac_m"][r], atol=3e-4, err_msg=f"jac_m ray {r}")
    # non-surviving rays contribute exactly zero
    np.testing.assert_array_equal(res_d[~ok], 0.0)
    np.testing.assert_array_equal(jac_d[~ok], 0.0)


def test_render_invalid_frame(small_spec):
    """Too few in-radius samples -> frame_ok False and zero contributions."""
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    latent = jnp.zeros(small_spec.code_length)
    rays, depth_obs, T_oc, depths = _scene(5)
    R = rays.shape[0]
    got = render_residuals(
        params, small_spec, latent,
        jnp.asarray(rays), jnp.arange(R) < 24, jnp.ones(R, bool),
        jnp.asarray(depth_obs), jnp.asarray(T_oc), jnp.asarray(depths),
        jnp.float32(0.001),  # tiny radius: nothing inside
        RenderConfig(min_valid_sample=100),
    )
    assert not bool(got.frame_ok)
    assert not np.asarray(got.ray_ok).any()
    np.testing.assert_array_equal(np.asarray(got.res_d), 0.0)


def test_render_padded_rays_ignored(small_spec):
    """Padding rays (ray_valid=False) must not change valid-ray outputs."""
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(1), (small_spec.code_length,)) * 0.05
    rays, depth_obs, T_oc, depths = _scene(7)
    R = rays.shape[0]
    cfg = RenderConfig(occ_cutoff=0.15, min_valid_sample=10)
    base = render_residuals(
        params, small_spec, latent, jnp.asarray(rays), jnp.arange(R) < 24,
        jnp.ones(R, bool), jnp.asarray(depth_obs), jnp.asarray(T_oc),
        jnp.asarray(depths), jnp.float32(0.12), cfg,
    )
    # append garbage rays marked invalid
    pad = 8
    rays_p = np.concatenate([rays, np.full((pad, 3), 5.0, np.float32)])
    obs_p = np.concatenate([depth_obs, np.full(pad, 0.3, np.float32)])
    got = render_residuals(
        params, small_spec, latent, jnp.asarray(rays_p),
        jnp.arange(R + pad) < 24,
        jnp.arange(R + pad) < R,
        jnp.asarray(obs_p), jnp.asarray(T_oc), jnp.asarray(depths),
        jnp.float32(0.12), cfg,
    )
    np.testing.assert_allclose(np.asarray(got.res_d)[:R], np.asarray(base.res_d), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.jac_d)[:R], np.asarray(base.jac_d), atol=1e-7)
    assert not np.asarray(got.ray_ok)[R:].any()


def test_sdf_residuals_basic(small_spec):
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(2), (small_spec.code_length,)) * 0.1
    pts = jax.random.normal(jax.random.PRNGKey(3), (50, 3)) * 0.05
    valid = jnp.arange(50) < 40
    out = sdf_residuals(params, small_spec, latent, pts, valid, scale_on=True)
    assert out.res.shape == (50,)
    assert out.jac.shape == (50, 7 + small_spec.code_length)
    np.testing.assert_array_equal(np.asarray(out.res)[40:], 0.0)
    np.testing.assert_array_equal(np.asarray(out.jac)[40:], 0.0)

    # residual equals decoded sdf; code Jacobian equals decoder code gradient
    from hortimapping_tpu.models.decoder import decoder_sdf_grad_at

    sdf, dcode, dxyz = decoder_sdf_grad_at(params, small_spec, latent, pts)
    np.testing.assert_allclose(np.asarray(out.res)[:40], np.asarray(sdf)[:40], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.jac)[:40, 7:], np.asarray(dcode)[:40], atol=1e-6)
    # pose Jacobian: translation block is dsdf/dx directly ([I | -x^ | x])
    np.testing.assert_allclose(np.asarray(out.jac)[:40, :3], np.asarray(dxyz)[:40], atol=1e-6)
