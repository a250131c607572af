"""Pallas TPU kernels: fused DeepSDF MLP forward and forward+input-gradient.

Why: the XLA path materializes every hidden activation ([N, 512] per layer)
in HBM — at the render workload (N ~ 2M samples/iter) that is ~60 GB of
activation traffic per LM iteration, which bounds the decoder cost. These
kernels tile N, keep ALL weights and per-tile activations resident in VMEM
(weights ~4 MB bf16 / 8 MB f32 incl. padding), and write only the outputs:
HBM traffic drops to inputs + outputs.

Layout (everything 128-lane aligned, no sub-lane slicing):
  * input dim C+3 (35) is zero-padded to 128; W0 rows likewise;
  * the `latent_in` skip (input re-concatenated at layer `li`,
    reference `deepsdf/networks/deep_sdf_decoder.py:42-47,103-104`) becomes
    an ADD of `x @ P`, P a constant placement matrix P[i, D-(C+3)+i] = 1 —
    layer li-1's weight columns beyond D-(C+3) are zero, so
    h_in_li = h_out_{li-1} + x @ P is exactly the concat, with the concat
    turned into one tiny MXU matmul;
  * the scalar head is zero-padded to 128 output columns (column 0 real).

The backward computes ONLY input gradients (the decoder is frozen —
reference semantics, `wild_completion/utils.py:175-193`): one reverse chain
of `g @ W^T` matmuls (dot_general contracting the output dim, so no
transposed weight copies) with ReLU masks from the in-VMEM forward
activations. No weight gradients, no HBM round trips.

Supported architecture: uniform hidden width (multiple of 128), at most one
latent_in layer — i.e. the DeepSDF family actually shipped
(`deepsdf/models/*/specs.json`). Anything else uses the XLA path in
models/decoder.py. All entry points here are jit-safe (weights may be
tracers; packing is jnp ops that XLA hoists out of loops).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hortimapping_tpu.models.decoder import DecoderSpec, Params

LANE = 128
DEFAULT_TILE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(spec: DecoderSpec) -> bool:
    return (
        len(set(spec.dims)) == 1
        and len(spec.latent_in) <= 1
        and spec.dims[0] >= LANE
        and spec.dims[0] % LANE == 0
        and spec.in_dim <= LANE
        and (not spec.latent_in or 1 <= spec.latent_in[0] <= spec.num_linear - 1)
    )


@dataclasses.dataclass(frozen=True)
class PackedSpec:
    d: int          # hidden width
    n_mid: int      # number of stacked middle layers (l1 .. l_{last-1})
    li: int         # latent_in layer index (0 = none)
    in_dim: int     # true input dim (C+3)


def packed_spec(spec: DecoderSpec) -> PackedSpec:
    return PackedSpec(
        d=spec.dims[0],
        n_mid=spec.num_linear - 2,
        li=spec.latent_in[0] if spec.latent_in else 0,
        in_dim=spec.in_dim,
    )


def pack_params(
    params: Params, spec: DecoderSpec, dtype: jnp.dtype = jnp.float32
) -> Tuple[jnp.ndarray, ...]:
    """Pad/stack decoder weights for the kernels (jit-safe jnp ops).

    Returns (w0 [LANE, D], wm [n_mid, D, D], wl [D, LANE], p [LANE, D],
    b0 [1, D], bm [n_mid, 1, D], bl [1, LANE]). Matmul weights are cast to
    `dtype`; biases stay f32 (added after f32 accumulation).
    """
    ps = packed_spec(spec)
    d, n_lin = ps.d, spec.num_linear

    def pad_w(a, shape):
        return jnp.zeros(shape, jnp.float32).at[: a.shape[0], : a.shape[1]].set(a)

    def pad_b(a, n):
        return jnp.zeros((1, n), jnp.float32).at[0, : a.shape[0]].set(a)

    w0 = pad_w(params["lin0"]["w"], (LANE, d)).astype(dtype)
    b0 = pad_b(params["lin0"]["b"], d)
    wm = jnp.stack(
        [pad_w(params[f"lin{l}"]["w"], (d, d)) for l in range(1, n_lin - 1)]
    ).astype(dtype)
    bm = jnp.stack([pad_b(params[f"lin{l}"]["b"], d) for l in range(1, n_lin - 1)])
    wl = pad_w(params[f"lin{n_lin - 1}"]["w"], (d, LANE)).astype(dtype)
    bl = pad_b(params[f"lin{n_lin - 1}"]["b"], LANE)
    p_np = np.zeros((LANE, d), np.float32)
    if ps.li:
        for i in range(ps.in_dim):
            p_np[i, d - ps.in_dim + i] = 1.0
    p = jnp.asarray(p_np, dtype)
    return (w0, wm, wl, p, b0, bm, bl)


def _prec(cdt):
    """Matmul precision for the kernels' compute dtype. Mosaic lowers f32
    dots to a SINGLE bf16 MXU pass at default precision — measured on v5e:
    cdt=f32 and cdt=bf16 produced bit-identical kernel outputs — so an f32
    compute dtype must request HIGHEST (multi-pass) to actually be f32.
    bf16 inputs keep the default single pass (that IS the production mode)."""
    return jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None


def _fwd_chain(x, w0, wm, wl, p, b0, bm, bl, ps: PackedSpec, cdt, save=None):
    """Forward chain on one tile. x: [T, LANE] f32 -> tanh out [T, LANE]
    (column 0 real). Appends post-ReLU activations to `save` if given —
    stored in the compute dtype: the backward uses them only as ReLU sign
    masks and matmul inputs, so keeping them bf16 halves the VMEM they pin
    (which is what bounds the ray-tile size of the fused render kernel)."""
    f32 = jnp.float32
    pr = _prec(cdt)
    h = jnp.dot(x.astype(cdt), w0, preferred_element_type=f32, precision=pr) + b0
    h = jnp.maximum(h, 0.0)
    if save is not None:
        save.append(h.astype(cdt))
    skip = None
    if ps.li:
        skip = jnp.dot(x.astype(cdt), p, preferred_element_type=f32, precision=pr)
    for j in range(ps.n_mid):
        if j + 1 == ps.li:
            h = h + skip
        h = jnp.dot(h.astype(cdt), wm[j], preferred_element_type=f32,
                    precision=pr) + bm[j]
        h = jnp.maximum(h, 0.0)
        if save is not None:
            save.append(h.astype(cdt))
    if ps.n_mid + 1 == ps.li:
        h = h + skip
    return jnp.tanh(jnp.dot(h.astype(cdt), wl, preferred_element_type=f32,
                            precision=pr) + bl)


def _relu_mask(a):
    """ReLU sign mask from a saved activation. Mosaic has no bf16 compare,
    so compare in f32 (the cast is a cheap VPU op)."""
    return (a.astype(jnp.float32) > 0.0).astype(jnp.float32)


def _dot_t(g, w, cdt):
    """g [T, out] @ w^T -> [T, in], contracting the output dim of w [in, out]."""
    return jax.lax.dot_general(
        g.astype(cdt), w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cdt),
    )


def _fwd_kernel(x_ref, w0_ref, wm_ref, wl_ref, p_ref, b0_ref, bm_ref, bl_ref,
                sdf_ref, *, ps: PackedSpec, cdt):
    sdf_ref[:] = _fwd_chain(
        x_ref[:], w0_ref[:], wm_ref[:], wl_ref[:], p_ref[:],
        b0_ref[:], bm_ref[:], bl_ref[:], ps, cdt,
    )


def input_grad_chain(y, acts, x, wl, wm, w0, p, ps: PackedSpec, cdt):
    """Input gradient of column 0 of tanh(h @ wl + bl): one reverse chain of
    `g @ W^T` matmuls with ReLU masks from the saved forward activations.
    Shared by the two-pass band kernel and the fused render kernel
    (ops/pallas_render.py) so the frozen-decoder backward can never drift
    between the two paths. Returns G [T, LANE]."""
    f32 = jnp.float32
    col0 = (jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) == 0).astype(f32)
    g = _dot_t((1.0 - y * y) * col0, wl, cdt)                      # [T, D]
    grad_x = jnp.zeros_like(x)
    if ps.n_mid + 1 == ps.li:
        grad_x = grad_x + _dot_t(g, p, cdt)
    for j in range(ps.n_mid - 1, -1, -1):
        g = g * _relu_mask(acts[j + 1])
        g = _dot_t(g, wm[j], cdt)
        if j + 1 == ps.li:
            grad_x = grad_x + _dot_t(g, p, cdt)
    g = g * _relu_mask(acts[0])
    return grad_x + _dot_t(g, w0, cdt)


def _fwd_grad_kernel(x_ref, w0_ref, wm_ref, wl_ref, p_ref, b0_ref, bm_ref,
                     bl_ref, sdf_ref, grad_ref, *, ps: PackedSpec, cdt):
    x = x_ref[:]
    acts = []
    y = _fwd_chain(x, w0_ref[:], wm_ref[:], wl_ref[:], p_ref[:],
                   b0_ref[:], bm_ref[:], bl_ref[:], ps, cdt, save=acts)
    sdf_ref[:] = y
    grad_ref[:] = input_grad_chain(y, acts, x, wl_ref[:], wm_ref[:],
                                   w0_ref[:], p_ref[:], ps, cdt)


def _interpret() -> bool:
    """Compiled Mosaic only on real TPU; interpreter elsewhere (tests)."""
    return jax.default_backend() != "tpu"


def _pad_inputs(inputs: jnp.ndarray, tile: int):
    lead = inputs.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    flat = inputs.reshape(n, inputs.shape[-1]).astype(jnp.float32)
    n_pad = _round_up(max(n, tile), tile)
    x = jnp.zeros((n_pad, LANE), jnp.float32)
    x = x.at[:n, : inputs.shape[-1]].set(flat)
    return x, n, lead


def mlp_sdf(
    packed: Tuple[jnp.ndarray, ...],
    ps: PackedSpec,
    inputs: jnp.ndarray,
    bf16: bool = True,
    tile: int = DEFAULT_TILE,
) -> jnp.ndarray:
    """(..., C+3) -> (...,) tanh SDF via the fused forward kernel."""
    x, n, lead = _pad_inputs(inputs, tile)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kernel = functools.partial(_fwd_kernel, ps=ps, cdt=cdt)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], LANE), jnp.float32),
        grid=(x.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, *packed)
    return out[:n, 0].reshape(lead)


def mlp_sdf_and_input_grad(
    packed: Tuple[jnp.ndarray, ...],
    ps: PackedSpec,
    inputs: jnp.ndarray,
    bf16: bool = False,
    tile: int = DEFAULT_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., C+3) -> (sdf (...,), input grad (..., C+3)) via the fused
    forward+backward kernel."""
    x, n, lead = _pad_inputs(inputs, tile)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kernel = functools.partial(_fwd_grad_kernel, ps=ps, cdt=cdt)
    sdf, grad = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], LANE), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], LANE), jnp.float32),
        ),
        grid=(x.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        ],
        out_specs=(
            pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x, *packed)
    return sdf[:n, 0].reshape(lead), grad[:n, : ps.in_dim].reshape(lead + (ps.in_dim,))


class PallasDecoder:
    """Convenience wrapper with packed weights held as device arrays
    (for the mesher / tools; inside jitted code use the functional API)."""

    def __init__(self, params: Params, spec: DecoderSpec, bf16: bool = True,
                 tile: int = DEFAULT_TILE):
        if not supported(spec):
            raise ValueError(f"architecture not kernel-supported: {spec}")
        self.spec = spec
        self.bf16 = bf16
        self.tile = tile
        self.ps = packed_spec(spec)
        self.packed = pack_params(params, spec, jnp.bfloat16 if bf16 else jnp.float32)
        self.packed_f32 = pack_params(params, spec, jnp.float32)

    def sdf(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return mlp_sdf(self.packed, self.ps, inputs, self.bf16, self.tile)

    def sdf_and_input_grad(self, inputs: jnp.ndarray):
        return mlp_sdf_and_input_grad(self.packed_f32, self.ps, inputs, False, self.tile)


def _shared_latent_kernel(px_ref, py_ref, pz_ref, lat_ref,
                          w0_ref, wm_ref, wl_ref, p_ref, b0_ref, bm_ref, bl_ref,
                          out_ref, *, ps: PackedSpec, cdt, rows: int, cols: int, C: int):
    """Forward chain over a [rows, cols] grid of points sharing one latent.

    The [T, LANE] MLP input is built in VMEM (latent broadcast + coordinate
    placement by lane masks), so HBM only carries the compact [rows, cols]
    coordinate planes — the generic `mlp_sdf` path materializes a padded
    [N, 128] input in HBM, which costs more than the decode it feeds
    (measured on the 40^3/80^3 mesher grids)."""
    f32 = jnp.float32
    T = rows * cols
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANE), 1)
    # row-major [rows, cols] <-> sample-major [T, 1] via selector matmuls
    # (Mosaic cannot shape-cast across the sublane/lane split)
    sel2 = (jax.lax.broadcasted_iota(jnp.int32, (T, rows), 0) // cols
            == jax.lax.broadcasted_iota(jnp.int32, (T, rows), 1)).astype(f32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, cols), 0) % cols
              == jax.lax.broadcasted_iota(jnp.int32, (T, cols), 1)).astype(f32)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1) // cols
           == jax.lax.broadcasted_iota(jnp.int32, (rows, T), 0)).astype(f32)

    # layout matmuls move values, they must not round them (Mosaic's default
    # f32 dot is a single bf16 pass — see _prec) — HIGHEST is exact for f32
    lprec = jax.lax.Precision.HIGHEST

    def to_sample(v):
        return jnp.sum(jnp.dot(sel2, v.astype(f32), preferred_element_type=f32,
                               precision=lprec)
                       * onehot, axis=1, keepdims=True)

    x = (
        jnp.broadcast_to(lat_ref[:], (T, LANE))
        + to_sample(px_ref[:]) * (lane == C).astype(f32)
        + to_sample(py_ref[:]) * (lane == C + 1).astype(f32)
        + to_sample(pz_ref[:]) * (lane == C + 2).astype(f32)
    )
    y = _fwd_chain(x, w0_ref[:], wm_ref[:], wl_ref[:], p_ref[:],
                   b0_ref[:], bm_ref[:], bl_ref[:], ps, cdt)
    sdf_s = jnp.sum(y * (lane == 0).astype(f32), axis=1, keepdims=True)
    out_ref[:] = jnp.dot(sel, sdf_s * onehot, preferred_element_type=f32,
                         precision=lprec)


def mlp_sdf_shared_latent(
    packed: Tuple[jnp.ndarray, ...],
    ps: PackedSpec,
    latent: jnp.ndarray,   # [C]
    pts: jnp.ndarray,      # [N, 3]
    bf16: bool = True,
    rows_per_tile: int = 16,
    cols: int = 32,
) -> jnp.ndarray:
    """(N, 3) points sharing one latent -> (N,) tanh SDF values."""
    N = pts.shape[0]
    C = latent.shape[-1]
    f32 = jnp.float32
    per_tile = rows_per_tile * cols
    n_rows = _round_up(max(N, per_tile), per_tile) // cols
    planes = []
    for k in range(3):
        v = jnp.zeros((n_rows * cols,), f32).at[:N].set(pts[:, k])
        planes.append(v.reshape(n_rows, cols))
    lat = jnp.zeros((1, LANE), f32).at[0, :C].set(latent)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    kernel = functools.partial(
        _shared_latent_kernel, ps=ps, cdt=cdt, rows=rows_per_tile, cols=cols, C=C
    )
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, cols), jnp.float32),
        grid=(n_rows // rows_per_tile,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=vm),
            *[pl.BlockSpec(memory_space=vm) for _ in range(7)],
        ],
        out_specs=pl.BlockSpec((rows_per_tile, cols), lambda i: (i, 0), memory_space=vm),
        interpret=_interpret(),
    )(*planes, lat, *packed)
    return out.reshape(-1)[:N]
