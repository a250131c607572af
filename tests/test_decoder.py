"""Decoder parity vs torch + checkpoint conversion round-trips."""

import os
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hortimapping_tpu.models.decoder import (
    DecoderSpec,
    count_params,
    decoder_apply,
    decoder_sdf,
    decoder_sdf_and_input_grad,
    decoder_sdf_grad_at,
    init_decoder_params,
)
from hortimapping_tpu.models import workspace
from tests.torch_ref import (
    make_torch_state_dict,
    torch_decoder_forward,
    torch_decoder_input_grad,
)


def _convert(state, spec, tmpdir, weight_norm=True):
    path = os.path.join(tmpdir, "latest.pth")
    torch.save({"model_state_dict": state, "epoch": 0}, path)
    return workspace.convert_torch_checkpoint(path, spec)


@pytest.mark.parametrize("weight_norm", [True, False])
@pytest.mark.parametrize("prefix", [True, False])
def test_forward_parity_small(small_spec, weight_norm, prefix):
    state = make_torch_state_dict(small_spec, seed=3, weight_norm=weight_norm,
                                  data_parallel_prefix=prefix)
    with tempfile.TemporaryDirectory() as d:
        params = _convert(state, small_spec, d, weight_norm)
    x = torch.randn(257, small_spec.in_dim, generator=torch.Generator().manual_seed(1))
    ref = torch_decoder_forward(state, small_spec, x).numpy()
    got = np.asarray(decoder_apply(params, small_spec, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_forward_parity_full_arch(full_spec):
    """Production 8x512 architecture with latent_in=[4] skip."""
    state = make_torch_state_dict(full_spec, seed=7)
    with tempfile.TemporaryDirectory() as d:
        params = _convert(state, full_spec, d)
    assert count_params(params) > 1.5e6  # ~1.8M like the reference decoder
    x = torch.randn(64, full_spec.in_dim, generator=torch.Generator().manual_seed(2))
    ref = torch_decoder_forward(state, full_spec, x).numpy()
    got = np.asarray(decoder_apply(params, full_spec, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_input_grad_parity(small_spec):
    state = make_torch_state_dict(small_spec, seed=11)
    with tempfile.TemporaryDirectory() as d:
        params = _convert(state, small_spec, d)
    x = torch.randn(97, small_spec.in_dim, generator=torch.Generator().manual_seed(5)) * 0.3
    sdf_ref, grad_ref = torch_decoder_input_grad(state, small_spec, x)
    sdf, grad = decoder_sdf_and_input_grad(params, small_spec, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(sdf), sdf_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grad), grad_ref, atol=2e-5)


def test_input_grad_vs_forward_mode(small_spec):
    """Reverse-mode input Jacobian must equal exact forward-mode AD."""
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, small_spec.in_dim)) * 0.2
    _, grad = decoder_sdf_and_input_grad(params, small_spec, x)
    f = lambda row: decoder_apply(params, small_spec, row)[..., 0]
    jac = jax.vmap(jax.jacfwd(f))(x)  # (5, in_dim)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(jac), atol=1e-6)


def test_sdf_grad_split(small_spec):
    params = init_decoder_params(small_spec, jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(2), (small_spec.code_length,)) * 0.1
    xyz = jax.random.normal(jax.random.PRNGKey(3), (17, 3)) * 0.5
    sdf, dcode, dxyz = decoder_sdf_grad_at(params, small_spec, latent, xyz)
    assert sdf.shape == (17,)
    assert dcode.shape == (17, small_spec.code_length)
    assert dxyz.shape == (17, 3)
    sdf2 = decoder_sdf(params, small_spec, latent, xyz)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf2), atol=1e-6)


def test_native_checkpoint_roundtrip(small_spec):
    params = init_decoder_params(small_spec, jax.random.PRNGKey(9))
    codes = np.random.default_rng(0).normal(size=(13, small_spec.code_length)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        workspace.save_native_checkpoint(d, "latest", params, small_spec, codes)
        p2, spec2 = workspace.load_native_checkpoint(os.path.join(d, "native", "latest.npz"))
        got_codes = workspace.load_latent_vectors(d, "latest")
    assert spec2 == small_spec
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]["w"]), np.asarray(p2[name]["w"]))
    np.testing.assert_array_equal(np.asarray(got_codes), codes)


def test_config_decoder_from_torch_dir(small_spec):
    """Full experiment-dir convention: specs.json + ModelParameters/*.pth."""
    state = make_torch_state_dict(small_spec, seed=21, data_parallel_prefix=True)
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "specs.json"), "w") as f:
            import json

            json.dump(
                {
                    "NetworkArch": "deep_sdf_decoder",
                    "CodeLength": small_spec.code_length,
                    "ClampingDistance": small_spec.clamping_distance,
                    "NetworkSpecs": {
                        "dims": list(small_spec.dims),
                        "latent_in": list(small_spec.latent_in),
                        "weight_norm": True,
                    },
                },
                f,
            )
        os.makedirs(os.path.join(d, "ModelParameters"))
        torch.save({"model_state_dict": state, "epoch": 0},
                   os.path.join(d, "ModelParameters", "latest.pth"))
        params, spec = workspace.config_decoder(d, "latest")
        # conversion caches a native checkpoint; reload must agree
        params2, _ = workspace.config_decoder(d, "latest")
    x = torch.randn(31, small_spec.in_dim, generator=torch.Generator().manual_seed(4))
    ref = torch_decoder_forward(state, small_spec, x).numpy()
    got = np.asarray(decoder_apply(params, spec, jnp.asarray(x.numpy())))
    got2 = np.asarray(decoder_apply(params2, spec, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    np.testing.assert_array_equal(got, got2)


def test_latent_vectors_torch_formats(small_spec):
    rng = np.random.default_rng(1)
    codes = rng.normal(size=(9, small_spec.code_length)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "LatentCodes"))
        # raw tensor format
        torch.save({"latent_codes": torch.tensor(codes)}, os.path.join(d, "LatentCodes", "latest.pth"))
        got = workspace.load_latent_vectors(d, "latest")
        np.testing.assert_allclose(np.asarray(got), codes, atol=0)
        # embedding format
        torch.save({"latent_codes": {"weight": torch.tensor(codes)}},
                   os.path.join(d, "LatentCodes", "emb.pth"))
        got2 = workspace.load_latent_vectors(d, "emb")
        np.testing.assert_allclose(np.asarray(got2), codes, atol=0)


def test_orbax_checkpoint_roundtrip(tmp_path, small_spec):
    """Orbax save/restore preserves params, spec, and latent codes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hortimapping_tpu.models.decoder import decoder_sdf, init_decoder_params
    from hortimapping_tpu.models.workspace import (
        load_orbax_checkpoint,
        save_orbax_checkpoint,
    )

    params = init_decoder_params(small_spec, jax.random.PRNGKey(7))
    codes = np.random.default_rng(0).normal(size=(5, small_spec.code_length)).astype(np.float32)
    path = save_orbax_checkpoint(str(tmp_path), "latest", params, small_spec, codes)
    p2, spec2, codes2 = load_orbax_checkpoint(path)
    assert spec2 == small_spec
    np.testing.assert_array_equal(np.asarray(codes2), codes)
    xyz = jnp.asarray(np.random.default_rng(1).normal(size=(50, 3)) * 0.05, jnp.float32)
    lat = jnp.zeros((small_spec.code_length,))
    np.testing.assert_allclose(
        np.asarray(decoder_sdf(p2, spec2, lat, xyz)),
        np.asarray(decoder_sdf(params, small_spec, lat, xyz)),
        atol=1e-7,
    )
