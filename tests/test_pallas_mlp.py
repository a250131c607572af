"""Pallas fused MLP kernels vs the XLA decoder (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hortimapping_tpu.models.decoder import (
    DecoderSpec,
    decoder_apply,
    decoder_sdf_and_input_grad,
    init_decoder_params,
)
from hortimapping_tpu.ops import pallas_mlp


# hidden width must be a multiple of 128 for the kernels; use a narrow-width
# variant of the flagship architecture to keep interpreter-mode tests fast
SPEC = DecoderSpec(code_length=8, dims=(128,) * 4, latent_in=(2,), clamping_distance=0.1)
SPEC_NOSKIP = DecoderSpec(code_length=8, dims=(128,) * 3, latent_in=(), clamping_distance=0.1)


@pytest.fixture(scope="module")
def world():
    params = init_decoder_params(SPEC, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(1000, SPEC.in_dim)) * 0.3, jnp.float32)
    return params, inputs


def test_supported():
    assert pallas_mlp.supported(SPEC)
    assert pallas_mlp.supported(SPEC_NOSKIP)
    assert not pallas_mlp.supported(
        DecoderSpec(code_length=8, dims=(64,) * 4, latent_in=(2,))
    )  # width < 128
    assert not pallas_mlp.supported(
        DecoderSpec(code_length=8, dims=(128, 256, 128), latent_in=())
    )  # non-uniform


def test_fwd_matches_xla(world):
    params, inputs = world
    packed = pallas_mlp.pack_params(params, SPEC, jnp.float32)
    ps = pallas_mlp.packed_spec(SPEC)
    got = pallas_mlp.mlp_sdf(packed, ps, inputs, bf16=False, tile=256)
    want = decoder_apply(params, SPEC, inputs)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fwd_grad_matches_xla(world):
    params, inputs = world
    packed = pallas_mlp.pack_params(params, SPEC, jnp.float32)
    ps = pallas_mlp.packed_spec(SPEC)
    sdf, grad = pallas_mlp.mlp_sdf_and_input_grad(packed, ps, inputs, bf16=False, tile=256)
    want_sdf, want_grad = decoder_sdf_and_input_grad(params, SPEC, inputs)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(want_sdf), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad), atol=2e-5)


def test_fwd_no_skip_arch():
    params = init_decoder_params(SPEC_NOSKIP, jax.random.PRNGKey(5))
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(rng.normal(size=(300, SPEC_NOSKIP.in_dim)) * 0.3, jnp.float32)
    packed = pallas_mlp.pack_params(params, SPEC_NOSKIP, jnp.float32)
    ps = pallas_mlp.packed_spec(SPEC_NOSKIP)
    got = pallas_mlp.mlp_sdf(packed, ps, inputs, bf16=False, tile=256)
    want = decoder_apply(params, SPEC_NOSKIP, inputs)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_batched_shapes(world):
    params, _ = world
    packed = pallas_mlp.pack_params(params, SPEC, jnp.float32)
    ps = pallas_mlp.packed_spec(SPEC)
    rng = np.random.default_rng(2)
    inputs = jnp.asarray(rng.normal(size=(3, 7, 11, SPEC.in_dim)) * 0.3, jnp.float32)
    sdf, grad = pallas_mlp.mlp_sdf_and_input_grad(packed, ps, inputs, tile=256)
    assert sdf.shape == (3, 7, 11)
    assert grad.shape == (3, 7, 11, SPEC.in_dim)
    want = decoder_apply(params, SPEC, inputs)[..., 0]
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(want), atol=2e-6)


def test_bf16_fwd_close(world):
    params, inputs = world
    packed = pallas_mlp.pack_params(params, SPEC, jnp.bfloat16)
    ps = pallas_mlp.packed_spec(SPEC)
    got = pallas_mlp.mlp_sdf(packed, ps, inputs, bf16=True, tile=256)
    want = decoder_apply(params, SPEC, inputs)[..., 0]
    # tanh output in [-1, 1]: bf16 matmul chain stays within ~1e-2 absolute
    assert float(jnp.max(jnp.abs(got - want))) < 2e-2


def test_shared_latent_matches_xla(world):
    params, _ = world
    latent = jnp.asarray(np.random.default_rng(4).normal(size=SPEC.code_length),
                         jnp.float32) * 0.2
    pts = jnp.asarray(np.random.default_rng(5).normal(size=(777, 3)) * 0.3,
                      jnp.float32)
    packed = pallas_mlp.pack_params(params, SPEC, jnp.float32)
    ps = pallas_mlp.packed_spec(SPEC)
    got = pallas_mlp.mlp_sdf_shared_latent(packed, ps, latent, pts, bf16=False)
    from hortimapping_tpu.models.decoder import decoder_sdf

    want = decoder_sdf(params, SPEC, latent, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
