"""Full-size trainer quality bar + TPU training throughput (VERDICT r3 #5).

The TPU DeepSDF trainer (train/deepsdf.py) was previously validated only on
a tiny decoder (tests/test_train.py). This tool exercises it at the
reference's full scale and gates the result end to end:

  1. generate a DeepSDF-convention dataset: N_SCENES (default 512) shapes
     of the flagship analytic ellipsoid family (the same deterministic
     projection as assets/synthetic_pepper_32 — SyntheticCategory seeds its
     projection at 1234), written as `SdfSamples/<name>.npz` pos/neg banks
     exactly like the upstream preprocessing output;
  2. train the reference architecture (32-d code, 8x512 weight-norm MLP,
     `/root/reference/deepsdf/models/sweetpepper_32/specs.json`) from
     scratch ON the real chip via `train_deepsdf`; report steps/s,
     samples/s and wall-clock;
  3. direct quality: mean |pred - analytic sdf| of the trained decoder on
     held-out near-surface points of its LEARNED codes (auto-decoder
     convention — codes are optimized, not given);
  4. end-to-end gate: run the ECCV-challenge pipeline twice on ONE shared
     dataset — once with the shipped asset decoder, once with the freshly
     trained experiment dir — and require the trained CD within
     `CD_MARGIN_MM` of the shipped CD (same solver variant both runs).

Prints one JSON line; exit 1 if the gate fails. Results recorded in
docs/PERF.md ("trainer quality bar", round 4).

Usage:
    python tools/train_quality_gate.py [--scenes 512] [--epochs 1000]
                                       [--variant retrieval] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

CD_MARGIN_MM = 0.5  # trained-vs-shipped challenge CD gap the gate allows


def _category_asset(category: str) -> tuple:
    """-> (asset dir, base radius, object radius, mc res [mm]) — pepper is
    the sweetpepper_32-scale stand-in, berry the strawberry_32 one
    (ClampingDistance 0.05, 0.03 m base radius; the challenge gate then
    meshes at the lab_berry.yaml scale, 0.04 m / 1 mm)."""
    if category == "berry":
        return (os.path.join(ROOT, "assets", "synthetic_berry_32"),
                0.03, 0.04, 1.0)
    return (os.path.join(ROOT, "assets", "synthetic_pepper_32"),
            0.06, 0.08, 4.0)


def make_sdf_dataset(data_dir: str, n_scenes: int, n_cap: int = 16384,
                     seed: int = 7, category: str = "pepper") -> None:
    """Analytic-family SdfSamples in the upstream layout (pure numpy)."""
    from hortimapping_tpu.models.workspace import load_specs
    from hortimapping_tpu.models.decoder import DecoderSpec
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, _ellipsoid_sdf_np

    asset, base_radius, _, _ = _category_asset(category)
    spec = DecoderSpec.from_specs_json(load_specs(asset))
    cat = SyntheticCategory(spec=spec, base_radius=base_radius)
    proj = cat.projection()
    out = os.path.join(data_dir, "SdfSamples")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    extent = 2.5 * cat.base_radius
    n_draw = 3 * n_cap
    for s in range(n_scenes):
        code = (rng.normal(size=spec.code_length) * 0.5).astype(np.float32)
        radii = cat.base_radius * np.exp(proj @ code)
        # half uniform in the sampling box, half near the surface at two
        # noise scales (the upstream preprocessing's near/far surface bands)
        x_uni = rng.uniform(-extent, extent, size=(n_draw // 2, 3))
        dirs = rng.normal(size=(n_draw // 2, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        noise = np.where(rng.random(n_draw // 2) < 0.5,
                         rng.normal(size=n_draw // 2) * 0.005 / cat.base_radius,
                         rng.normal(size=n_draw // 2) * 0.05)
        x_surf = dirs * radii * (1.0 + noise[:, None])
        x = np.concatenate([x_uni, x_surf]).astype(np.float32)
        sdf = _ellipsoid_sdf_np(x, radii).astype(np.float32)
        rows = np.concatenate([x, sdf[:, None]], axis=1)
        pos, neg = rows[sdf >= 0], rows[sdf < 0]
        np.savez(
            os.path.join(out, f"shape_{s:04d}.npz"),
            pos=pos[rng.choice(len(pos), min(n_cap, len(pos)), replace=False)],
            neg=neg[rng.choice(len(neg), min(n_cap, len(neg)), replace=False)],
            # the generating code (extra key, ignored by load_sdf_samples):
            # lets the quality probe score the LEARNED code for this scene
            # against the analytic shape that generated it
            gen_code=code,
        )


def make_experiment(exp_dir: str, data_dir: str, epochs: int,
                    category: str = "pepper") -> None:
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(_category_asset(category)[0], "specs.json")) as f:
        specs = json.load(f)
    # reference-scale training fields (sweetpepper_32 specs.json convention)
    specs.update({
        "Description": "Full-size trainer quality bar (round 4)",
        "DataSource": data_dir,
        "ScenesPerBatch": 64,
        "SamplesPerScene": 8192,
        "NumEpochs": epochs,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeInitStdDev": 0.01,
        "CodeBound": 1.0,
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 5e-4, "Interval": max(1, epochs // 2),
             "Factor": 0.5},
            {"Type": "Step", "Initial": 1e-3, "Interval": max(1, epochs // 2),
             "Factor": 0.5},
        ],
    })
    with open(os.path.join(exp_dir, "specs.json"), "w") as f:
        json.dump(specs, f, indent=1)


def sdf_accuracy(exp_dir: str, n_probe: int = 32,
                 category: str = "pepper") -> float:
    """Mean |pred - analytic| [m] on near-surface points of learned codes.

    The auto-decoder's learned code for scene s embeds the shape that
    generated `SdfSamples/shape_s.npz`; decode accuracy is measured against
    that shape's analytic SDF at fresh near-surface points."""
    import jax.numpy as jnp

    from hortimapping_tpu.models.decoder import decoder_sdf
    from hortimapping_tpu.models.workspace import (config_decoder,
                                                   load_latent_vectors, load_specs)
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, _ellipsoid_sdf_np

    params, spec = config_decoder(exp_dir)
    codes = np.asarray(load_latent_vectors(exp_dir))
    cat = SyntheticCategory(spec=spec,
                            base_radius=_category_asset(category)[1])
    proj = cat.projection()
    specs = load_specs(exp_dir)
    sdf_dir = os.path.join(specs["DataSource"], "SdfSamples")
    errs = []
    probe_rng = np.random.default_rng(99)
    for s in range(min(n_probe, len(codes))):
        with np.load(os.path.join(sdf_dir, f"shape_{s:04d}.npz")) as z:
            gen_code = np.asarray(z["gen_code"], np.float32)
        radii = cat.base_radius * np.exp(proj @ gen_code)
        dirs = probe_rng.normal(size=(512, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        x = (dirs * radii * (1.0 + probe_rng.normal(size=(512, 1)) * 0.05)).astype(np.float32)
        gt = _ellipsoid_sdf_np(x, radii)
        pred = np.asarray(decoder_sdf(params, spec, jnp.asarray(codes[s]),
                                      jnp.asarray(x)))
        # clamped-distance convention on BOTH sides (training only ever
        # supervises within +-ClampingDistance; raw outputs outside it are
        # unconstrained by design)
        c = spec.clamping_distance
        errs.append(np.abs(np.clip(pred, -c, c) - np.clip(gt, -c, c)).mean())
    return float(np.mean(errs))


def challenge_cd(deepsdf_dir: str, data_dir: str, variant: str,
                 category: str = "pepper") -> tuple:
    """-> (mean CD [mm], n_empty). Instances whose completed mesh came out
    EMPTY score CD = 0 by the reference's own metric convention
    (`/root/reference/metrics_3d/chamfer_distance.py:17-18`) — a "perfect"
    score for predicting nothing — so the gate counts them separately and
    fails on any."""
    from challenge_probe import variant_tpu_block

    from hortimapping_tpu.config import load_config
    from hortimapping_tpu.pipeline.challenge import run_challenge

    cfg = load_config(os.path.join(
        ROOT, "configs", "shape_completion_challenge_pepper.yaml"))
    if category == "berry":
        _, _, radius, mc_res = _category_asset(category)
        cfg["vis"]["object_radius_max_m"] = radius
        cfg["vis"]["mc_res_mm"] = mc_res
    cfg["data_dir"] = data_dir
    cfg["split"] = "val"
    cfg["deepsdf_dir"] = deepsdf_dir
    cfg["run_name"] = "train_gate"
    tpu, max_iter = variant_tpu_block(variant)
    cfg.setdefault("opt", {})["tpu"] = tpu
    if max_iter is not None:
        cfg["opt"].setdefault("converge", {})["max_iter"] = max_iter
    summary = run_challenge(cfg, log=lambda *a: None)
    shutil.rmtree(os.path.join(data_dir, "results"), ignore_errors=True)
    per = summary.get("cd_per_fruit_mm", [])
    n_empty = sum(1 for c in per if c == 0.0)
    return float(summary["CD[mm]"]), n_empty


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--variant", default="retrieval")
    ap.add_argument("--category", choices=["pepper", "berry"],
                    default="pepper",
                    help="train/gate the pepper (sweetpepper_32-scale) or "
                         "berry (strawberry_32-scale, ClampingDistance 0.05) "
                         "category")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing trained checkpoint")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))

    data_dir = os.path.join(
        ROOT, "data", f"train_full_{args.category}_{args.scenes}")
    exp_dir = os.path.join(
        ROOT, "data", f"exp_{args.category}_32_trained_{args.scenes}")
    rec = {"metric": "trainer_quality_gate", "scenes": args.scenes,
           "epochs": args.epochs, "variant": args.variant,
           "category": args.category}

    if not os.path.isdir(os.path.join(data_dir, "SdfSamples")):
        print(f"generating {args.scenes}-scene SdfSamples...", file=sys.stderr)
        make_sdf_dataset(data_dir, args.scenes, category=args.category)
    make_experiment(exp_dir, data_dir, args.epochs, category=args.category)

    if not (args.skip_train and os.path.isfile(
            os.path.join(exp_dir, "native", "latest.npz"))):
        from hortimapping_tpu.train import train_deepsdf

        t0 = time.perf_counter()
        result = train_deepsdf(exp_dir, log=lambda m: print(m, file=sys.stderr))
        wall = time.perf_counter() - t0
        spe = (result.timing or {}).get("steps_per_epoch",
                                        max(1, args.scenes // 64))
        steps = args.epochs * spe
        rec["train_wall_s"] = round(wall, 1)
        rec["steps_per_s"] = round(steps / wall, 2)
        rec["samples_per_s"] = round(steps * 64 * 8192 / wall / 1e6, 2)
        rec["samples_per_s_unit"] = "M/s"
        # steady state: excludes jit compile + first-chunk warmup
        tm = result.timing or {}
        if tm.get("steady_epochs") and tm.get("steady_wall_s"):
            st_steps = tm["steady_epochs"] * spe
            rec["steps_per_s_steady"] = round(st_steps / tm["steady_wall_s"], 2)
            rec["samples_per_s_steady"] = round(
                st_steps * 64 * 8192 / tm["steady_wall_s"] / 1e6, 2)
        rec["final_loss"] = float(result.losses[-1])

    rec["sdf_mae_mm"] = round(
        sdf_accuracy(exp_dir, category=args.category) * 1e3, 4)

    # one shared challenge dataset; GT comes from the analytic family both
    # decoders model
    asset = _category_asset(args.category)[0]
    ch_tag = "" if args.category == "pepper" else f"_{args.category}"
    ch_dir = os.path.join(ROOT, "data",
                          f"train_gate_challenge{ch_tag}_s55_n12")
    if not os.path.isdir(os.path.join(ch_dir, "val")):
        from hortimapping_tpu.tools.make_demo_data import make_challenge_dataset

        make_challenge_dataset(ch_dir, asset,
                               split="val", n_fruits=12, n_frames=3, seed=55)
    cd_shipped, empty_shipped = challenge_cd(
        asset, ch_dir, args.variant, category=args.category)
    cd_trained, empty_trained = challenge_cd(
        exp_dir, ch_dir, args.variant, category=args.category)
    rec["challenge_cd_shipped_mm"] = round(cd_shipped, 4)
    rec["challenge_cd_trained_mm"] = round(cd_trained, 4)
    rec["empty_meshes_shipped"] = empty_shipped
    rec["empty_meshes_trained"] = empty_trained
    rec["cd_margin_mm"] = CD_MARGIN_MM
    # an empty mesh scores CD 0 under the reference metric convention, so a
    # degenerate decoder could "pass" on CD alone — require zero empties
    rec["pass"] = bool(
        empty_trained == 0
        and np.isfinite(cd_trained) and cd_trained > 0.0
        and cd_trained <= cd_shipped + CD_MARGIN_MM
    )
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
