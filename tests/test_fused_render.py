"""Fused render kernel (ops/pallas_render.py) vs the dense masked path.

The fused kernel is the same math as the dense [R, M] path (which is itself
differentially tested against a sparse reference implementation in
test_render.py), so exact f32 agreement is required — interpreter mode on
CPU, f32 compute.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from hortimapping_tpu.models.decoder import DecoderSpec, init_decoder_params
from hortimapping_tpu.ops.render import RenderConfig, render_residuals

# hidden width must be a multiple of 128 for the Pallas kernels
SPEC = DecoderSpec(code_length=8, dims=(128,) * 4, latent_in=(2,), clamping_distance=0.1)


def _scene(seed, R_fg=24, R_bg=24, M=24):
    rng = np.random.default_rng(seed)
    R = R_fg + R_bg
    ang_fg = rng.normal(size=(R_fg, 2)) * 0.08
    ang_bg = rng.normal(size=(R_bg, 2)) * 0.35
    ang = np.concatenate([ang_fg, ang_bg])
    rays = np.concatenate([ang, np.ones((R, 1))], axis=-1).astype(np.float32)
    depth_obs = (0.3 + rng.normal(size=R) * 0.03).astype(np.float32)
    depth_obs[R_fg + 2] = 0.0  # a bg ray without depth
    T_co = np.eye(4, dtype=np.float32)
    T_co[:3, 3] = [0.01, -0.02, 0.3]
    c, s = np.cos(0.2), np.sin(0.2)
    T_co[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) * 1.1
    T_oc = np.linalg.inv(T_co).astype(np.float32)
    depths = np.linspace(0.2, 0.42, M).astype(np.float32)
    return rays, depth_obs, T_oc, depths


@pytest.fixture(scope="module")
def world():
    params = init_decoder_params(SPEC, jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(1), (SPEC.code_length,)) * 0.05
    return params, latent


def _compare(params, latent, base, R_fg=24, seed=3, M=24, ray_valid=None):
    rays, depth_obs, T_oc, depths = _scene(seed, R_fg=R_fg, M=M)
    R = rays.shape[0]
    rv = jnp.ones(R, bool) if ray_valid is None else ray_valid
    args = (
        params, SPEC, latent, jnp.asarray(rays), jnp.arange(R) < R_fg,
        rv, jnp.asarray(depth_obs), jnp.asarray(T_oc), jnp.asarray(depths),
        jnp.float32(0.12),
    )
    want = render_residuals(*args, base)
    got = render_residuals(
        *args, dataclasses.replace(base, fused=True, fused_bf16=False)
    )
    np.testing.assert_array_equal(np.asarray(got.ray_ok), np.asarray(want.ray_ok))
    assert bool(got.frame_ok) == bool(want.frame_ok)
    for name in ("res_d", "res_m", "jac_d", "jac_m"):
        a, b = np.asarray(getattr(got, name)), np.asarray(getattr(want, name))
        scale = max(np.max(np.abs(b)), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=name)
    return got, want


@pytest.mark.parametrize("scale_on", [False, True])
@pytest.mark.parametrize("log_occ", [False, True])
def test_fused_matches_dense(world, scale_on, log_occ):
    params, latent = world
    base = RenderConfig(scale_on=scale_on, log_occ_on=log_occ, occ_cutoff=0.15,
                        occlusion_on=True, min_valid_sample=10)
    _compare(params, latent, base)


def test_fused_no_latent_in_skip(world):
    """Architecture without the latent_in re-concat exercises the ps.li=0
    branches of the forward and backward chains."""
    spec = DecoderSpec(code_length=8, dims=(128,) * 3, latent_in=(),
                       clamping_distance=0.1)
    params = init_decoder_params(spec, jax.random.PRNGKey(2))
    latent = jax.random.normal(jax.random.PRNGKey(3), (spec.code_length,)) * 0.05
    rays, depth_obs, T_oc, depths = _scene(4)
    R = rays.shape[0]
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=True,
                        min_valid_sample=10)
    args = (
        params, spec, latent, jnp.asarray(rays), jnp.arange(R) < 24,
        jnp.ones(R, bool), jnp.asarray(depth_obs), jnp.asarray(T_oc),
        jnp.asarray(depths), jnp.float32(0.12),
    )
    want = render_residuals(*args, base)
    got = render_residuals(
        *args, dataclasses.replace(base, fused=True, fused_bf16=False)
    )
    np.testing.assert_array_equal(np.asarray(got.ray_ok), np.asarray(want.ray_ok))
    for name in ("res_d", "res_m", "jac_d", "jac_m"):
        a, b = np.asarray(getattr(got, name)), np.asarray(getattr(want, name))
        scale = max(np.max(np.abs(b)), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=name)


def test_fused_occlusion_off(world):
    params, latent = world
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=False,
                        min_valid_sample=10)
    _compare(params, latent, base)


def test_fused_nondivisible_shapes(world):
    """R not a tile multiple and M != 32 exercise ray and sample padding."""
    params, latent = world
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=True,
                        min_valid_sample=10, fused_tr=16)
    _compare(params, latent, base, R_fg=21, M=19)


def test_fused_padded_rays_ignored(world):
    params, latent = world
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=True,
                        min_valid_sample=10)
    rv = jnp.arange(48) < 40  # last 8 rays are padding
    got, want = _compare(params, latent, base, ray_valid=rv)
    assert not np.any(np.asarray(got.ray_ok)[40:])
    assert np.all(np.asarray(got.jac_d)[40:] == 0.0)


def test_fused_inactive_lane_all_zero(world):
    """lane_active=False (frozen LM lane) skips all compute -> zero outputs."""
    params, latent = world
    rays, depth_obs, T_oc, depths = _scene(3)
    R = rays.shape[0]
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=True,
                        min_valid_sample=10)
    got = render_residuals(
        params, SPEC, latent, jnp.asarray(rays), jnp.arange(R) < 24,
        jnp.ones(R, bool), jnp.asarray(depth_obs), jnp.asarray(T_oc),
        jnp.asarray(depths), jnp.float32(0.12),
        dataclasses.replace(base, fused=True, fused_bf16=False),
        jnp.asarray(False),
    )
    assert not bool(got.frame_ok)
    for name in ("res_d", "res_m", "jac_d", "jac_m"):
        assert np.all(np.asarray(getattr(got, name)) == 0.0), name


def test_fused_invalid_frame(world):
    """Too few in-radius samples -> frame_ok False, everything zeroed."""
    params, latent = world
    rays, depth_obs, T_oc, depths = _scene(3)
    R = rays.shape[0]
    base = RenderConfig(scale_on=True, occ_cutoff=0.15, occlusion_on=True,
                        min_valid_sample=100000)
    got = render_residuals(
        params, SPEC, latent, jnp.asarray(rays), jnp.arange(R) < 24,
        jnp.ones(R, bool), jnp.asarray(depth_obs), jnp.asarray(T_oc),
        jnp.asarray(depths), jnp.float32(0.12),
        dataclasses.replace(base, fused=True, fused_bf16=False),
    )
    assert not bool(got.frame_ok)
    assert not np.any(np.asarray(got.ray_ok))
    assert np.all(np.asarray(got.res_d) == 0.0)
    assert np.all(np.asarray(got.jac_d) == 0.0)
