"""Lab + greenhouse end-to-end head-to-head vs the ACTUAL reference.

Completes round 2's missing evidence (VERDICT item 4): the challenge and
wild drivers already have genuine head-to-heads; this drives the LAB
single-frame eval (`/root/reference/eval_lab_single_frame.py`) and the
GREENHOUSE single-frame eval (`eval_wild_single_frame.py`) equivalents end
to end on identical inputs:

  * ours:      `pipeline/lab.run_lab_eval` / `pipeline/greenhouse.
               run_greenhouse_eval` (batched fused LM),
  * reference: the genuine `wild_completion.optimizer.Optimizer`
               (cuda-shimmed on CPU torch, tests/reference_shim.py), fed
               the SAME per-instance render_data/points from the pipelines'
               own `prepare_*_instances` (deterministic seeded prep — no
               duplicated preprocessing to drift).

Compares CD (both) and the pose metrics (translation error [mm], z-axis
rotation error [deg] — greenhouse only, `eval_wild_single_frame.py:281-308`)
with paired per-instance deltas. Usage:

    python tools/reference_head2head_lab.py --family lab        [--n-fruits 4]
    python tools/reference_head2head_lab.py --family greenhouse [--n-fruits 4]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _lab_cfg(data_dir: str, deepsdf_dir: str, category: str = "pepper") -> dict:
    cfg = {
        "run_name": "h2h_lab", "deepsdf_dir": deepsdf_dir,
        "data_dir": data_dir, "fruit_id": "none",
        "split": os.path.join(data_dir, "split.json"),
        "baseline_name": "none", "frame_per_fruit": 3, "device": "tpu",
        "opt": {
            "scale_on": False,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3, "s_damp": 1e-3},
            "pose_init": {"rot_on": False, "scale_on": False},
            "recon": {"n_pts": 600, "cluster_dist_m": 0.01, "robust_th_m": 0.005},
            "render": {
                "n_fg_pix": 100, "n_bg_pix": 60, "n_bg_pad": 10, "n_frame": 3,
                "n_sample_on_ray": 20, "log_sdf_occ": False, "occ_cutoff_m": 0.005,
                "occlusion_on": False, "robust_th_m": 0.02,
            },
            "weight": {"w_recon": 1.0, "w_depth": 5e-2, "w_mask": 1e-4,
                       "w_codereg": 1e-4},
            "converge": {"max_iter": 20, "epsilon_g": 1e-5, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 5,
        },
        "vis": {"log_on": False, "vis_on": False, "wandb_log_on": False,
                "object_radius_max_m": 0.08, "mc_res_mm": 4.0},
    }
    if category == "berry":
        # strawberry-scale knobs from the reference's lab_berry.yaml (vs
        # lab_pepper.yaml): Sim(3) scale estimation on, lambda_0 1.0 with no
        # extra scale damping, tighter recon clustering/robust thresholds,
        # logistic sdf->occ conversion, 0.04 m radius at 1 mm meshing
        # (/root/reference/configs/lab_berry.yaml:28-70). Sampling counts
        # stay at the tool's reduced-budget values (same both sides).
        cfg["opt"]["scale_on"] = True
        cfg["opt"]["lm"].update({"lm_lambda_0": 1.0, "s_damp": 0.0})
        cfg["opt"]["recon"].update({"cluster_dist_m": 0.008,
                                    "robust_th_m": 0.003})
        cfg["opt"]["render"].update({"log_sdf_occ": True,
                                     "occ_cutoff_m": 0.005})
        cfg["vis"].update({"object_radius_max_m": 0.04, "mc_res_mm": 1.0})
    return cfg


def _gh_cfg(data_dir: str, deepsdf_dir: str) -> dict:
    return {
        "run_name": "h2h_gh", "use_homa": True, "useable_only": False,
        "baseline_name": "none", "deepsdf_dir": deepsdf_dir,
        "data_dir": [data_dir], "fruit_id": "none",
        "frame_per_fruit": 3, "device": "tpu",
        "opt": {
            "scale_on": True,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3, "s_damp": 1e-3},
            "pose_init": {"rot_on": True, "scale_on": True},
            "recon": {"n_pts": 600, "cluster_dist_m": 0.01, "robust_th_m": 0.01},
            "render": {
                "n_fg_pix": 100, "n_bg_pix": 60, "n_bg_pad": 8, "n_frame": 3,
                "n_sample_on_ray": 20, "log_sdf_occ": True, "occ_cutoff_m": 0.01,
                "occlusion_on": True, "robust_th_m": 0.05,
            },
            "weight": {"w_recon": 1.0, "w_depth": 5e-2, "w_mask": 1e-3,
                       "w_codereg": 5e-4},
            "converge": {"max_iter": 20, "epsilon_g": 1e-4, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 2,
            "outlier": {"scale_max": 2.0, "scale_min": 0.3, "rot_max_deg": 80},
        },
        "vis": {"log_on": False, "vis_on": False, "wandb_log_on": False,
                "object_radius_max_m": 0.08, "mc_res_mm": 4.0},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["lab", "greenhouse"], required=True)
    ap.add_argument("--category", choices=["pepper", "berry"], default="pepper",
                    help="fruit category: pepper (sweetpepper_32 stand-in) or "
                         "berry (strawberry_32-scale asset + lab_berry.yaml "
                         "config; lab family only)")
    ap.add_argument("--n-fruits", type=int, default=4)
    ap.add_argument("--n-frames", type=int, default=6)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--multi", action="store_true",
                    help="multi-frame mode (integrated map / submap input, "
                         "all sampled frames feed one render term)")
    ap.add_argument("--cpu", action="store_true",
                    help="run ours on CPU (exact f32, torch threads pinned) — "
                         "the pinned comparison environment; on TPU the bf16 "
                         "matmul passes shift the basin-unstable lab workload")
    ap.add_argument("--variant", default="mean",
                    help="opt.tpu solver/init variant for the OURS side only "
                         "(challenge_probe grammar, e.g. retrieval, "
                         "retrieval_s1); the reference side always runs the "
                         "genuine solver from the table-mean init")
    ap.add_argument("--json-out", default=None,
                    help="write per-instance paired rows as JSON (for "
                         "pooling multiple seeds into one N>=16 verdict)")
    ap.add_argument("--reuse-ref", default=None,
                    help="path to a prior --json-out file for the SAME "
                         "(family, multi, seed, n_fruits): reuse its genuine "
                         "reference per-instance rows instead of re-running "
                         "the slow CPU-torch side — dataset generation is "
                         "seed-deterministic, so the pairing stays valid "
                         "when only the OURS-side variant changes")
    args = ap.parse_args()

    import torch

    if args.cpu:
        import jax

        # the axon sitecustomize force-sets jax_platforms at interpreter
        # start; the config update (not the env var) is what wins
        jax.config.update("jax_platforms", "cpu")
        torch.set_num_threads(1)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.data.preprocess import get_deg_between_vectors
    from hortimapping_tpu.metrics import ChamferDistance, PrecisionRecall
    from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.utils.misc import set_random_seed

    from tests import reference_shim as rs

    if args.category == "berry" and args.family != "lab":
        sys.exit("--category berry is lab-only (the reference's strawberry "
                 "experiments are the IGG lab dataset)")
    deepsdf_dir = os.path.join(ROOT, "assets",
                               f"synthetic_{args.category}_32")
    cat_tag = "" if args.category == "pepper" else f"_{args.category}"
    data_dir = os.path.join(
        ROOT, "data",
        f"h2h_{args.family}{cat_tag}_s{args.seed}_n{args.n_fruits}")

    if args.family == "lab":
        from hortimapping_tpu.pipeline.lab import (
            lab_T_ow0, prepare_lab_instances, run_lab_eval)
        from hortimapping_tpu.tools.make_demo_data import make_lab_dataset

        if not os.path.isdir(data_dir):
            print(f"generating lab dataset in {data_dir}")
            make_lab_dataset(data_dir, deepsdf_dir, n_fruits=args.n_fruits,
                             n_frames=args.n_frames, seed=args.seed)
        cfg = _lab_cfg(data_dir, deepsdf_dir, args.category)
        run_eval = lambda: run_lab_eval(cfg, multi_frame=args.multi,
                                        log=lambda *a: None)
        prep = lambda oc: prepare_lab_instances(cfg, oc, multi_frame=args.multi)
    else:
        from hortimapping_tpu.pipeline.greenhouse import (
            prepare_greenhouse_instances, run_greenhouse_eval)
        from hortimapping_tpu.tools.make_demo_data import make_greenhouse_dataset

        if not os.path.isdir(data_dir):
            print(f"generating greenhouse dataset in {data_dir}")
            make_greenhouse_dataset(data_dir, deepsdf_dir,
                                    n_fruits=args.n_fruits,
                                    n_frames=args.n_frames, seed=args.seed)
        cfg = _gh_cfg(data_dir, deepsdf_dir)
        run_eval = lambda: run_greenhouse_eval(cfg, multi_frame=args.multi,
                                               log=lambda *a: None)
        prep = lambda oc: prepare_greenhouse_instances(cfg, oc,
                                                       multi_frame=args.multi)

    # The reference side must always run the genuine (pre-variant)
    # configuration — a variant that changes e.g. max_iter would otherwise
    # leak through reference_cfg() and the head-to-head would compare
    # against a non-reference baseline (tools/reference_head2head.py builds
    # the same clean split).
    ref_opt_cfg = JointOptConfig.from_dict(copy.deepcopy(cfg))

    if args.variant != "mean":
        sys.path.insert(0, os.path.join(ROOT, "tools"))
        from challenge_probe import variant_tpu_block

        tpu, max_iter = variant_tpu_block(args.variant)
        cfg.setdefault("opt", {})["tpu"] = tpu
        if max_iter is not None:
            cfg["opt"].setdefault("converge", {})["max_iter"] = max_iter

    opt_cfg = JointOptConfig.from_dict(cfg)
    radius = float(cfg["vis"]["object_radius_max_m"])
    voxels_dim = int(2 * radius * 1e3 / float(cfg["vis"]["mc_res_mm"]))

    mode = "multi-frame" if args.multi else "single-frame"
    # ---------------- ours ----------------
    print(f"== ours (pipeline/{args.family}, {mode}) ==")
    summary_ours = run_eval()
    from hortimapping_tpu.optim import warmstart as _ws

    if _ws.LAST_RESCUE_INFO:
        summary_ours["rescue"] = dict(_ws.LAST_RESCUE_INFO)
        print(f"rescue: {summary_ours['rescue']}")
    print(f"ours: CD {summary_ours['CD[mm]']:.4f} mm  "
          f"F1 {summary_ours['F-score[%]']:.2f}%  "
          f"iters {summary_ours['iteration']:.1f} over {summary_ours['frames']} instances")

    # ---------------- reference ----------------
    if args.reuse_ref:
        import json

        with open(args.reuse_ref) as f:
            prior = json.load(f)
        key = ("family", "multi", "seed", "n_fruits")
        assert tuple(prior[k] for k in key) == (
            args.family, bool(args.multi), args.seed, args.n_fruits), (
            "reuse-ref file is for a different workload: "
            f"{ {k: prior[k] for k in key} }")
        assert prior.get("category", "pepper") == args.category
        ref_rows = [
            [i["label"], i["ref_cd_mm"], -1]
            + ([i["ref_trans_mm"], i["ref_rot_deg"]]
               if args.family == "greenhouse" else [])
            for i in prior["instances"]
        ]
        assert len(ref_rows) == summary_ours["frames"], (
            "stored reference rows diverged from the pipeline's own prep")
        cd = float(np.mean([r[1] for r in ref_rows])) * 1e-3
        f1 = float(prior["summary"]["F-score[%]"][1])
        print(f"== reference (genuine rows reused from {args.reuse_ref}) ==")
        print(f"reference: CD {cd*1e3:.4f} mm  F1 {f1:.2f}%")
        _paired_table(args, summary_ours, ref_rows, cd, f1)
        return

    print("== reference (shimmed /root/reference optimizer, CPU torch) ==")
    params, spec = config_decoder(deepsdf_dir, "latest")
    init_latent = np.asarray(jnp.mean(load_latent_vectors(deepsdf_dir), axis=0))
    dec = rs.torch_decoder_from_params(params, spec)
    _, _, ref_optimizer = rs.import_reference()
    opt = ref_optimizer.Optimizer(rs.reference_cfg(ref_opt_cfg), dec,
                                  mesher=None, vis=None)
    mesher = MeshExtractor(params, spec, voxels_dim, radius)

    set_random_seed(42)
    instances = prep(opt_cfg)
    assert len(instances) == summary_ours["frames"], (
        "reference prep diverged from the pipeline's own prep")

    cd_ref = ChamferDistance()
    pr_ref = PrecisionRecall(min_t=0.001, max_t=0.01, num=100)
    ref_rows = []  # (label, cd_mm, iters[, tran_mm, rot_deg])
    t_ref = 0.0
    for inst in instances:
        if args.family == "lab":
            T_ow0 = lab_T_ow0(inst["center"])
            gt_pts = inst["gt_points"]
        else:
            T_ow0 = inst["T_ow0"]
            gt_pts = inst["gt_points_w"]
        t0 = time.perf_counter()
        lat, T_ow_t, iters = opt.shape_pose_joint_opt(
            torch.from_numpy(init_latent.copy()),
            torch.from_numpy(np.asarray(T_ow0, np.float32)),
            rs.torch_render_data(inst["rd"]),
            torch.from_numpy(np.asarray(inst["points_w"], np.float32)),
            radius, None, False,
        )
        t_ref += time.perf_counter() - t0
        T_wo = np.linalg.inv(T_ow_t.detach().numpy())
        mesh = mesher.complete_mesh(jnp.asarray(lat.detach().numpy()), T_wo)
        pts = mesh.sample_points_uniformly(inst["gt_count"]).points
        i0 = len(cd_ref.cd_array)
        cd_ref.update(gt_pts, pts)
        pr_ref.update(gt_pts, pts)
        row = [inst["label"], cd_ref.cd_array[i0] * 1e3, int(iters)]
        if args.family == "greenhouse":
            s = np.linalg.det(T_wo[:3, :3]) ** (1.0 / 3.0)
            T_d = T_wo.copy()
            T_d[:3, :3] /= s
            row += [np.linalg.norm(inst["T_wg"][:3, 3] - T_d[:3, 3]) * 1e3,
                    get_deg_between_vectors(T_d[:3, 2], inst["T_wg"][:3, 2])]
        ref_rows.append(row)

    pr, re, f1, _ = pr_ref.compute_at_threshold(0.005)
    cd = cd_ref.compute()
    print(f"reference: CD {cd*1e3:.4f} mm  F1 {f1:.2f}%  "
          f"iters {np.mean([r[2] for r in ref_rows]):.1f}  "
          f"time/inst {t_ref/len(ref_rows):.2f}s")

    _paired_table(args, summary_ours, ref_rows, cd, f1)


def _paired_table(args, summary_ours, ref_rows, cd, f1) -> None:
    # ---------------- paired table ----------------
    print("\n== head-to-head ==")
    rows = [("CD[mm]", summary_ours["CD[mm]"], cd * 1e3),
            ("F-score[%]", summary_ours["F-score[%]"], f1)]
    if args.family == "greenhouse":
        rows += [("Error_trans[mm]", summary_ours["Error_trans[mm]"],
                  float(np.mean([r[3] for r in ref_rows]))),
                 ("Error_rot[deg]", summary_ours["Error_rot[deg]"],
                  float(np.mean([r[4] for r in ref_rows])))]
    print(f"{'metric':<16}{'ours':>10}{'reference':>12}{'delta':>10}")
    for key, ours_v, ref_v in rows:
        d = (ours_v - ref_v) / ref_v * 100.0 if ref_v else float("nan")
        print(f"{key:<16}{ours_v:>10.4f}{ref_v:>12.4f}{d:>+9.2f}%")

    ours_cds = summary_ours["cd_per_fruit_mm"]
    deltas = np.array([o - r[1] for o, r in zip(ours_cds, ref_rows)])
    print(f"\n{'instance':<22}{'ours CD':>9}{'ref CD':>9}{'delta':>9}")
    for o, r in zip(ours_cds, ref_rows):
        print(f"{r[0]:<22}{o:>9.4f}{r[1]:>9.4f}{o - r[1]:>+9.4f}")
    sem = deltas.std(ddof=1) / np.sqrt(len(deltas)) if len(deltas) > 1 else float("nan")
    print(f"paired CD delta {deltas.mean():+.4f} mm  sem {sem:.4f}  "
          f"(ours better on {int((deltas < 0).sum())}/{len(deltas)})")

    if args.json_out:
        import json

        rec = {
            "family": args.family, "multi": bool(args.multi),
            "category": args.category,
            "seed": args.seed, "n_fruits": args.n_fruits,
            "variant": args.variant, "cpu": bool(args.cpu),
            "summary": {k: (float(ov), float(rv)) for k, ov, rv in rows},
            **({"rescue": summary_ours["rescue"]}
               if "rescue" in summary_ours else {}),
            "instances": [
                {"label": r[0], "ours_cd_mm": float(o), "ref_cd_mm": float(r[1]),
                 **({"ours_trans_mm": float(to), "ref_trans_mm": float(r[3]),
                     "ours_rot_deg": float(ro), "ref_rot_deg": float(r[4])}
                    if args.family == "greenhouse" else {})}
                for (o, r, to, ro) in zip(
                    ours_cds, ref_rows,
                    summary_ours.get("tran_err_per_fruit_mm", [None] * len(ref_rows)),
                    summary_ours.get("rot_err_per_fruit_deg", [None] * len(ref_rows)))
            ],
        }
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
