"""Generate the synthetic decoder checkpoints shipped with the framework.

The reference's pretrained DeepSDF weights are not in this mount
(`/root/reference/.MISSING_LARGE_BLOBS`), so the framework ships synthetic
categories trained on the analytic ellipsoid family (tools/synthetic.py):

  assets/synthetic_small_8/     4x64 MLP, C=8  — fast CPU tests
  assets/synthetic_pepper_32/   8x512 MLP, C=32 — flagship (reference arch,
                                `deepsdf/models/sweetpepper_32/specs.json`)

Each directory follows the DeepSDF experiment-dir convention (specs.json +
native/latest.npz) so `workspace.config_decoder` loads them like any real
checkpoint. The npz additionally stores the ellipsoid projection matrix
(ground truth generator) and a table of sample latent codes whose mean is
the init code, mirroring `LatentCodes/latest.pth` usage
(`test_wild_completion.py:46-47`).

Run:  python -m hortimapping_tpu.tools.make_assets [--out assets]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from hortimapping_tpu.models.decoder import DecoderSpec
from hortimapping_tpu.models.workspace import save_native_checkpoint
from hortimapping_tpu.tools.synthetic import SyntheticCategory, train_synthetic_decoder


CATEGORIES = {
    "synthetic_small_8": dict(
        spec=DecoderSpec(code_length=8, dims=(64,) * 4, latent_in=(2,), clamping_distance=0.1),
        base_radius=0.05,
        steps=8000,
        batch=4096,
        lr=1e-3,
    ),
    "synthetic_pepper_32": dict(
        spec=DecoderSpec(code_length=32, dims=(512,) * 8, latent_in=(4,), clamping_distance=0.1),
        base_radius=0.06,
        steps=12000,
        batch=8192,
        lr=3e-4,
    ),
    # second category, mirroring the reference's strawberry decoder
    # (`deepsdf/models/strawberry_32/specs.json`: ClampingDistance 0.05,
    # smaller fruit geometry — lab_berry.yaml radius 0.04 m)
    "synthetic_berry_32": dict(
        spec=DecoderSpec(code_length=32, dims=(512,) * 8, latent_in=(4,), clamping_distance=0.05),
        base_radius=0.03,
        steps=12000,
        batch=8192,
        lr=3e-4,
    ),
}


def make_category(name: str, out_root: str, seed: int = 0) -> str:
    cfg = CATEGORIES[name]
    spec: DecoderSpec = cfg["spec"]
    cat = SyntheticCategory(spec=spec, base_radius=cfg["base_radius"])
    t0 = time.time()
    params, proj = train_synthetic_decoder(
        cat, jax.random.PRNGKey(seed), steps=cfg["steps"], batch=cfg["batch"], lr=cfg["lr"]
    )
    print(f"[{name}] trained in {time.time() - t0:.1f}s")

    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "specs.json"), "w") as f:
        json.dump(
            {
                "Description": f"Synthetic ellipsoid category {name} (analytic GT)",
                "NetworkArch": "deep_sdf_decoder",
                "CodeLength": spec.code_length,
                "ClampingDistance": spec.clamping_distance,
                "NetworkSpecs": {
                    "dims": list(spec.dims),
                    "latent_in": list(spec.latent_in),
                    "weight_norm": True,
                },
                "synthetic": {"base_radius": cat.base_radius, "proj_scale": cat.proj_scale},
            },
            f,
            indent=2,
        )
    rng = np.random.default_rng(seed)
    codes = (rng.normal(size=(256, spec.code_length)) * 0.5).astype(np.float32)
    path = save_native_checkpoint(out_dir, "latest", params, spec, codes)
    # append the GT projection so scenes can be regenerated from the checkpoint
    with np.load(path) as z:
        arrays = dict(z)
    arrays["synthetic.projection"] = proj.astype(np.float32)
    arrays["synthetic.base_radius"] = np.float64(cat.base_radius)
    np.savez(path, **arrays)
    print(f"[{name}] saved to {out_dir}")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "..", "assets"))
    ap.add_argument("--only", default=None, help="category name to (re)build")
    args = ap.parse_args()
    for name in CATEGORIES:
        if args.only and name != args.only:
            continue
        make_category(name, args.out)


if __name__ == "__main__":
    main()
