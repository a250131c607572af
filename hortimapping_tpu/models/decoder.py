"""TPU-native DeepSDF decoder.

Functional re-design of the reference decoder
(`/root/reference/deepsdf/networks/deep_sdf_decoder.py:10-110`): an 8x512 MLP
taking concat(latent_code[C], xyz[3]) and emitting tanh(SDF), with the input
re-concatenated at the `latent_in` layers (skip connection) and weight
normalization on every hidden layer.

TPU-first differences from the reference:
  * Inference only — dropout and the weight-norm parameterization are
    inference-inert, so weight norm is folded into plain dense weights at
    checkpoint-load time (W_eff = g * v / ||v||_row) and dropout is dropped.
  * Parameters are a flat pytree of `[in, out]`-shaped f32 matrices so the
    apply is a chain of row-vector matmuls that XLA tiles straight onto the
    MXU for any leading batch shape.
  * The input Jacobian (d sdf / d [code, xyz]) — which the reference gets from
    `torch.autograd.grad` per call (`wild_completion/utils.py:175-193`) — is a
    single batched VJP here: per-sample scalar outputs mean one reverse sweep
    yields the full (N, C+3) Jacobian at ~2x forward cost, all MXU matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class DecoderSpec:
    """Static architecture description (hashable -> safe as a jit static arg).

    Mirrors the `NetworkSpecs` block of the DeepSDF `specs.json`
    (reference: `deepsdf/models/sweetpepper_32/specs.json`).
    """

    code_length: int = 32
    dims: Tuple[int, ...] = (512,) * 8
    latent_in: Tuple[int, ...] = (4,)
    clamping_distance: float = 0.1

    @property
    def in_dim(self) -> int:
        return self.code_length + 3

    @property
    def num_linear(self) -> int:
        # hidden layers + final projection to 1
        return len(self.dims) + 1

    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        """(fan_in, fan_out) of every linear layer after weight-norm folding.

        Layer l feeding a `latent_in` layer l+1 has its width reduced by
        `in_dim` so that re-concatenating the input restores the nominal
        width (reference: `deep_sdf_decoder.py:42-47`).
        """
        full = (self.in_dim,) + tuple(self.dims) + (1,)
        out = []
        for l in range(self.num_linear):
            fan_in = full[l]
            if l in self.latent_in:
                fan_in = full[l]  # width restored by concat below
            fan_out = full[l + 1]
            if (l + 1) in self.latent_in:
                fan_out = full[l + 1] - self.in_dim
            out.append((fan_in, fan_out))
        return out

    @classmethod
    def from_specs_json(cls, specs: Dict[str, Any]) -> "DecoderSpec":
        ns = specs["NetworkSpecs"]
        return cls(
            code_length=int(specs["CodeLength"]),
            dims=tuple(int(d) for d in ns["dims"]),
            latent_in=tuple(int(i) for i in ns.get("latent_in", ())),
            clamping_distance=float(specs.get("ClampingDistance", 0.1)),
        )


def init_decoder_params(spec: DecoderSpec, key: jax.Array) -> Params:
    """Random (He-ish) init — used for tests and synthetic checkpoints."""
    params: Params = {}
    for l, (fan_in, fan_out) in enumerate(spec.layer_dims()):
        key, wk = jax.random.split(key)
        w = jax.random.normal(wk, (fan_in, fan_out), jnp.float32)
        w = w * jnp.sqrt(2.0 / fan_in)
        params[f"lin{l}"] = {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}
    return params


def decoder_apply(
    params: Params,
    spec: DecoderSpec,
    inputs: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Forward pass.

    inputs: (..., C+3) = concat(latent, xyz). Returns (..., 1) tanh(SDF).
    Semantics match the reference forward (`deep_sdf_decoder.py:75-110`) with
    eval-mode dropout (=identity) and folded weight norm.

    `compute_dtype=jnp.bfloat16` runs the matmuls at the MXU's native rate
    (inputs/weights cast per layer, f32 accumulation via
    `preferred_element_type`, bias-add and activation in f32) — ~0.4 %
    relative activation error, used for the forward-only render pass where
    residual precision is bounded by the occupancy cutoff anyway.
    """
    x = inputs
    last = spec.num_linear - 1
    for l in range(spec.num_linear):
        if l in spec.latent_in:
            x = jnp.concatenate([x, inputs], axis=-1)
        p = params[f"lin{l}"]
        x = jnp.dot(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) + p["b"]
        if l < last:
            x = jax.nn.relu(x)
    return jnp.tanh(x)


def decoder_sdf(
    params: Params,
    spec: DecoderSpec,
    latent: jnp.ndarray,
    xyz: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """SDF at query points.

    latent: (C,) shared code; xyz: (..., 3). Returns (...,) SDF values.
    Replaces the chunked `decode_sdf` (`wild_completion/utils.py:144-172`) —
    no chunking needed: one jitted apply over the whole batch.
    """
    lat = jnp.broadcast_to(latent, xyz.shape[:-1] + latent.shape)
    inp = jnp.concatenate([lat, xyz], axis=-1)
    return decoder_apply(params, spec, inp, compute_dtype)[..., 0]


def decoder_sdf_and_input_grad(
    params: Params, spec: DecoderSpec, inputs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDF and full input Jacobian in one reverse sweep.

    inputs: (..., C+3). Returns (sdf (...,), grad (..., C+3)).
    Replaces `get_batch_sdf_jacobian` (`wild_completion/utils.py:175-193`).
    Because each output is a scalar function of its own row, a single VJP with
    a ones cotangent yields every per-sample gradient exactly.
    """
    f = lambda z: decoder_apply(params, spec, z)[..., 0]
    sdf, vjp = jax.vjp(f, inputs)
    (grad,) = vjp(jnp.ones_like(sdf))
    return sdf, grad


def decoder_sdf_grad_at(
    params: Params, spec: DecoderSpec, latent: jnp.ndarray, xyz: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper: (sdf, dsdf_dcode, dsdf_dxyz) at points xyz.

    latent: (C,), xyz: (..., 3) -> sdf (...,), dcode (..., C), dxyz (..., 3).
    """
    lat = jnp.broadcast_to(latent, xyz.shape[:-1] + latent.shape)
    inp = jnp.concatenate([lat, xyz], axis=-1)
    sdf, g = decoder_sdf_and_input_grad(params, spec, inp)
    return sdf, g[..., : spec.code_length], g[..., spec.code_length :]


def count_params(params: Params) -> int:
    return sum(int(np.prod(p["w"].shape)) + int(np.prod(p["b"].shape)) for p in params.values())
