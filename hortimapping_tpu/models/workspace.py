"""Checkpoint workspace: load DeepSDF experiment directories into JAX pytrees.

Replaces the reference loader (`/root/reference/deepsdf/deep_sdf/workspace.py`)
which builds a torch module, wraps it in DataParallel, loads
`ModelParameters/<ckpt>.pth` and unwraps. Here the torch checkpoint is parsed
directly into a flat pytree of folded dense weights (no torch module is ever
constructed), and a TPU-native `.npz` checkpoint format is provided so torch
is not needed at inference time at all.

Directory convention (same as the reference, `workspace.py:8-21`):
    <experiment_dir>/specs.json
    <experiment_dir>/ModelParameters/<checkpoint>.pth   (torch)
    <experiment_dir>/LatentCodes/<checkpoint>.pth       (torch)
    <experiment_dir>/native/<checkpoint>.npz            (ours, preferred)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hortimapping_tpu.models.decoder import DecoderSpec, Params

MODEL_PARAMS_SUBDIR = "ModelParameters"
LATENT_CODES_SUBDIR = "LatentCodes"
NATIVE_SUBDIR = "native"
SPECS_FILENAME = "specs.json"


def load_specs(experiment_directory: str) -> Dict:
    path = os.path.join(experiment_directory, SPECS_FILENAME)
    if not os.path.isfile(path):
        raise FileNotFoundError(f"missing {SPECS_FILENAME} in {experiment_directory}")
    with open(path) as f:
        return json.load(f)


def _strip_prefix(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Drop a DataParallel 'module.' prefix if present (workspace.py:216-221)."""
    if any(k.startswith("module.") for k in state_dict):
        return {k[len("module."):]: v for k, v in state_dict.items() if k.startswith("module.")}
    return dict(state_dict)


def _fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm: W = g * v / ||v||, norms over each output row.

    torch Linear weights are [out, in]; weight_g is [out, 1].
    """
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1, keepdims=True)
    return (g.reshape(-1, 1) / norm) * v


def convert_torch_checkpoint(pth_path: str, spec: DecoderSpec) -> Params:
    """Parse a torch DeepSDF `ModelParameters/*.pth` into folded JAX params.

    Handles both weight-normed (`lin{i}.weight_v` / `weight_g`) and plain
    (`lin{i}.weight`) parameterizations, with or without a DataParallel
    `module.` prefix. Weights are transposed to [in, out] for row-vector
    matmul on TPU.
    """
    import torch  # local import: torch only needed for conversion

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    state = blob["model_state_dict"] if "model_state_dict" in blob else blob
    state = _strip_prefix({k: np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
                           if hasattr(v, "detach") else np.asarray(v, dtype=np.float32)
                           for k, v in state.items()})

    params: Params = {}
    for l in range(spec.num_linear):
        name = f"lin{l}"
        if f"{name}.weight_v" in state:
            w = _fold_weight_norm(state[f"{name}.weight_v"], state[f"{name}.weight_g"])
        elif f"{name}.weight" in state:
            w = state[f"{name}.weight"]
        # torch>=2.1 parametrize-style weight norm
        elif f"{name}.parametrizations.weight.original1" in state:
            w = _fold_weight_norm(
                state[f"{name}.parametrizations.weight.original1"],
                state[f"{name}.parametrizations.weight.original0"],
            )
        else:
            raise KeyError(f"no weights found for layer {name} in {pth_path}")
        b = state[f"{name}.bias"]
        params[name] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    return params


def load_latent_vectors(experiment_directory: str, checkpoint: str = "latest") -> jnp.ndarray:
    """Load the trained latent-code table as an (N, C) array.

    Native `.npz` is preferred; falls back to the torch format, handling both
    the raw-tensor and the `nn.Embedding` state-dict layouts
    (reference: `workspace.py:82-114`).
    """
    npz_path = os.path.join(experiment_directory, NATIVE_SUBDIR, checkpoint + ".npz")
    if os.path.isfile(npz_path):
        with np.load(npz_path) as z:
            if "latent_codes" in z:
                return jnp.asarray(z["latent_codes"], jnp.float32)

    pth_path = os.path.join(experiment_directory, LATENT_CODES_SUBDIR, checkpoint + ".pth")
    if not os.path.isfile(pth_path):
        raise FileNotFoundError(f"no latent codes for checkpoint '{checkpoint}' in {experiment_directory}")
    import torch

    data = torch.load(pth_path, map_location="cpu", weights_only=False)
    codes = data["latent_codes"]
    if isinstance(codes, dict):  # nn.Embedding state dict
        codes = codes["weight"]
    return jnp.asarray(np.asarray(codes.detach().cpu().numpy(), dtype=np.float32))


def save_native_checkpoint(
    experiment_directory: str,
    checkpoint: str,
    params: Params,
    spec: DecoderSpec,
    latent_codes: Optional[np.ndarray] = None,
) -> str:
    """Write the TPU-native `.npz` checkpoint (folded weights + spec + codes)."""
    out_dir = os.path.join(experiment_directory, NATIVE_SUBDIR)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, checkpoint + ".npz")
    arrays = {}
    for name, p in params.items():
        arrays[f"{name}.w"] = np.asarray(p["w"], np.float32)
        arrays[f"{name}.b"] = np.asarray(p["b"], np.float32)
    arrays["spec.code_length"] = np.int32(spec.code_length)
    arrays["spec.dims"] = np.asarray(spec.dims, np.int32)
    arrays["spec.latent_in"] = np.asarray(spec.latent_in, np.int32)
    arrays["spec.clamping_distance"] = np.float64(spec.clamping_distance)
    if latent_codes is not None:
        arrays["latent_codes"] = np.asarray(latent_codes, np.float32)
    np.savez(path, **arrays)
    return path


def load_native_checkpoint(path: str) -> Tuple[Params, DecoderSpec]:
    with np.load(path) as z:
        spec = DecoderSpec(
            code_length=int(z["spec.code_length"]),
            dims=tuple(int(d) for d in z["spec.dims"]),
            latent_in=tuple(int(i) for i in z["spec.latent_in"]),
            clamping_distance=float(z["spec.clamping_distance"]),
        )
        params: Params = {}
        l = 0
        while f"lin{l}.w" in z:
            params[f"lin{l}"] = {"w": jnp.asarray(z[f"lin{l}.w"]), "b": jnp.asarray(z[f"lin{l}.b"])}
            l += 1
    return params, spec


def save_orbax_checkpoint(
    experiment_directory: str,
    checkpoint: str,
    params: Params,
    spec: DecoderSpec,
    latent_codes: Optional[np.ndarray] = None,
) -> str:
    """Write an Orbax checkpoint (`<dir>/orbax/<checkpoint>/`) — the
    ecosystem-standard format for sharded/async TPU checkpointing; the
    `.npz` native format stays the default for small single-host decoders."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(experiment_directory, "orbax", checkpoint))
    tree = {
        "params": {k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in params.items()},
        "spec": {
            "code_length": np.int32(spec.code_length),
            "dims": np.asarray(spec.dims, np.int32),
            "latent_in": np.asarray(spec.latent_in, np.int32),
            "clamping_distance": np.float64(spec.clamping_distance),
        },
    }
    if latent_codes is not None:
        tree["latent_codes"] = np.asarray(latent_codes, np.float32)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax_checkpoint(path: str) -> Tuple[Params, DecoderSpec, Optional[jnp.ndarray]]:
    """Load an Orbax checkpoint written by `save_orbax_checkpoint`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    spec = DecoderSpec(
        code_length=int(tree["spec"]["code_length"]),
        dims=tuple(int(d) for d in tree["spec"]["dims"]),
        latent_in=tuple(int(i) for i in tree["spec"]["latent_in"]),
        clamping_distance=float(tree["spec"]["clamping_distance"]),
    )
    params: Params = {
        k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
        for k, v in tree["params"].items()
    }
    codes = tree.get("latent_codes")
    return params, spec, (jnp.asarray(codes) if codes is not None else None)


def config_decoder(
    experiment_directory: str, checkpoint: str = "latest"
) -> Tuple[Params, DecoderSpec]:
    """Load a decoder from a DeepSDF experiment dir (reference: workspace.py:203-225).

    Prefers the native `.npz`; otherwise converts the torch checkpoint on the
    fly (and caches the native form next to it for subsequent runs).
    """
    spec = DecoderSpec.from_specs_json(load_specs(experiment_directory))
    npz_path = os.path.join(experiment_directory, NATIVE_SUBDIR, checkpoint + ".npz")
    if os.path.isfile(npz_path):
        params, spec_loaded = load_native_checkpoint(npz_path)
        return params, spec_loaded

    pth_path = os.path.join(experiment_directory, MODEL_PARAMS_SUBDIR, checkpoint + ".pth")
    if not os.path.isfile(pth_path):
        raise FileNotFoundError(
            f"no checkpoint '{checkpoint}' (native or torch) in {experiment_directory}"
        )
    params = convert_torch_checkpoint(pth_path, spec)
    try:
        save_native_checkpoint(experiment_directory, checkpoint, params, spec)
    except OSError:
        pass  # read-only experiment dir: conversion stays in-memory
    return params, spec
