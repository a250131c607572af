"""Clean-room torch implementations of reference semantics, for differential tests.

These are NOT copies of the reference code: they re-express the documented
behavior (DeepSDF decoder forward with weight norm + latent_in skip; weight
normalization fold) directly with torch tensor ops so the JAX implementations
can be checked bit-for-bit against PyTorch numerics on random weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import torch


def make_torch_state_dict(spec, seed: int = 0, weight_norm: bool = True,
                          data_parallel_prefix: bool = False) -> Dict[str, torch.Tensor]:
    """Random DeepSDF-format state dict (torch [out, in] weight layout)."""
    g = torch.Generator().manual_seed(seed)
    state: Dict[str, torch.Tensor] = {}
    prefix = "module." if data_parallel_prefix else ""
    for l, (fan_in, fan_out) in enumerate(spec.layer_dims()):
        w = torch.randn(fan_out, fan_in, generator=g) * (2.0 / fan_in) ** 0.5
        b = torch.randn(fan_out, generator=g) * 0.01
        if weight_norm:
            # decompose W into (g, v) such that g * v/||v|| == W
            v = torch.randn(fan_out, fan_in, generator=g)
            gn = w.norm(dim=1, keepdim=True)
            # choose v with the direction of w and arbitrary magnitude
            v = w / gn * (1.0 + torch.rand(fan_out, 1, generator=g))
            state[f"{prefix}lin{l}.weight_v"] = v
            state[f"{prefix}lin{l}.weight_g"] = gn * (v.norm(dim=1, keepdim=True) / v.norm(dim=1, keepdim=True))
            # fix g so that g * v/||v|| == w exactly
            state[f"{prefix}lin{l}.weight_g"] = gn
        else:
            state[f"{prefix}lin{l}.weight"] = w
        state[f"{prefix}lin{l}.bias"] = b
    return state


def torch_decoder_forward(state: Dict[str, torch.Tensor], spec, inputs: torch.Tensor) -> torch.Tensor:
    """Eval-mode forward matching the reference decoder semantics.

    inputs: (N, C+3); returns (N, 1). Weight norm folded on the fly; dropout
    inactive at eval; ReLU between hidden layers; final tanh.
    """
    state = {k.replace("module.", ""): v for k, v in state.items()}

    def weight(l: int) -> torch.Tensor:
        if f"lin{l}.weight_v" in state:
            v = state[f"lin{l}.weight_v"]
            gn = state[f"lin{l}.weight_g"]
            return gn * v / v.norm(dim=1, keepdim=True)
        return state[f"lin{l}.weight"]

    x = inputs
    n_lin = spec.num_linear
    for l in range(n_lin):
        if l in spec.latent_in:
            x = torch.cat([x, inputs], dim=-1)
        x = torch.nn.functional.linear(x, weight(l), state[f"lin{l}.bias"])
        if l < n_lin - 1:
            x = torch.relu(x)
    return torch.tanh(x)


def torch_decoder_input_grad(state, spec, inputs: torch.Tensor) -> Tuple[np.ndarray, np.ndarray]:
    """(sdf, d sdf/d inputs) via torch autograd, mirroring utils.py:175-193."""
    x = inputs.clone().requires_grad_(True)
    y = torch_decoder_forward(state, spec, x)
    (grad,) = torch.autograd.grad(y, x, torch.ones_like(y))
    return y.detach().numpy()[..., 0], grad.detach().numpy()
