"""Same-data end-to-end head-to-head: this framework vs the ACTUAL reference.

Generates a synthetic ECCV-challenge dataset, then completes every fruit two
ways from IDENTICAL inputs (same decoder weights, same preprocessing, same
ray samples, same init):

  * ours:      `pipeline/challenge.run_challenge` (batched fused LM on the
               default backend),
  * reference: the genuine `wild_completion.optimizer.Optimizer
               .shape_pose_joint_opt` imported from /root/reference
               (cuda-shimmed to CPU torch, tests/reference_shim.py), fed the
               same render_data/points, with the decoder exported to the
               real reference Decoder class.

Meshing and metrics are shared (ops/mesher + metrics/) so the comparison
isolates the solver. Prints a table: CD/F1 for both sides + per-fruit CD
delta — the BASELINE.md "Chamfer-L1 within 1% of the PyTorch reference" bar,
measured. Usage:

    python tools/reference_head2head.py [--n-fruits 6] [--data-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fruits", type=int, default=6)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--config", default=os.path.join(
        ROOT, "configs", "shape_completion_challenge_pepper.yaml"))
    ap.add_argument("--variant", default="mean",
                    help="ours-side solver/init variant "
                         "(challenge_probe grammar, e.g. retrieval_tr)")
    args = ap.parse_args()
    if args.data_dir is None:
        args.data_dir = os.path.join(
            ROOT, "data", f"h2h_challenge_s{args.seed}_n{args.n_fruits}"
        ) if (args.seed != 11 or args.n_fruits != 6) else os.path.join(
            ROOT, "data", "h2h_challenge")

    import torch

    import jax.numpy as jnp

    from hortimapping_tpu.config import JointOptConfig, load_config
    from hortimapping_tpu.data.challenge import ShapeCompletionDataset
    from hortimapping_tpu.data.mesh import PointCloud
    from hortimapping_tpu.data.preprocess import clean_pcd
    from hortimapping_tpu.data.rays import get_render_data
    from hortimapping_tpu.metrics import ChamferDistance, PrecisionRecall
    from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.pipeline.challenge import run_challenge
    from hortimapping_tpu.tools.make_demo_data import make_challenge_dataset
    from hortimapping_tpu.utils.misc import set_random_seed

    from tests import reference_shim as rs

    deepsdf_dir = os.path.join(ROOT, "assets", "synthetic_pepper_32")
    if not os.path.isdir(os.path.join(args.data_dir, "val")):
        print(f"generating {args.n_fruits}-fruit challenge dataset in {args.data_dir}")
        make_challenge_dataset(args.data_dir, deepsdf_dir, split="val",
                               n_fruits=args.n_fruits, n_frames=5,
                               seed=args.seed)

    cfg = load_config(args.config)
    cfg["data_dir"] = args.data_dir
    cfg["split"] = "val"
    cfg["deepsdf_dir"] = deepsdf_dir
    cfg["run_name"] = "h2h_ours"
    if args.variant != "mean":
        from challenge_probe import variant_tpu_block

        tpu, max_iter = variant_tpu_block(args.variant)
        cfg.setdefault("opt", {})["tpu"] = tpu
        if max_iter is not None:
            cfg["opt"].setdefault("converge", {})["max_iter"] = max_iter
    opt_cfg = JointOptConfig.from_dict(cfg)
    # the REFERENCE side always runs the reference configuration (mean init,
    # fixed-lambda LM, the YAML's max_iter) — args.variant is ours-only
    ref_opt_cfg = JointOptConfig.from_dict(load_config(args.config))

    # ---------------- ours ----------------
    print(f"== ours (pipeline/challenge, variant {args.variant}) ==")
    summary_ours = run_challenge(cfg)

    # ---------------- reference ----------------
    print("== reference (shimmed /root/reference optimizer, CPU torch) ==")
    params, spec = config_decoder(deepsdf_dir, "latest")
    init_latent = np.asarray(jnp.mean(load_latent_vectors(deepsdf_dir), axis=0))
    dec = rs.torch_decoder_from_params(params, spec)
    _, _, ref_optimizer = rs.import_reference()
    opt = ref_optimizer.Optimizer(rs.reference_cfg(ref_opt_cfg), dec, mesher=None, vis=None)

    radius = float(cfg["vis"]["object_radius_max_m"])
    mc_res_mm = float(cfg["vis"]["mc_res_mm"])
    voxels_dim = int(2 * radius * 1e3 / mc_res_mm)
    mesher = MeshExtractor(params, spec, voxels_dim, radius)
    frame_per_fruit = int(cfg.get("frame_per_fruit", opt_cfg.n_frame))

    # preprocessing identical to pipeline/challenge.py phase 1 (same seed)
    set_random_seed(42)
    rng = np.random.default_rng(42)
    dataset = ShapeCompletionDataset(args.data_dir, "val")
    cd_ref = ChamferDistance()
    pr_ref = PrecisionRecall(min_t=0.001, max_t=0.01, num=100)
    per_fruit = []
    t_ref_total = 0.0
    for fruit in dataset:
        fid = fruit["fid"]
        K = fruit["rgbd_intrinsic"]
        frames = fruit["rgbd_frames"]
        frame_ids = np.array(list(frames.keys()))
        sample_idx = np.linspace(
            0, len(frame_ids) - 1, min(len(frame_ids), frame_per_fruit)
        ).astype(np.int32)
        img_size = frames[frame_ids[0]]["rgb"].shape[:-1]

        map_pcd: PointCloud = fruit["rgbd_pcd"]
        bound = np.ones(3) * radius * 1.5
        map_pcd = map_pcd.crop(-bound, bound)
        if len(map_pcd) == 0:
            continue
        ratio = min(opt_cfg.recon_n_pts / len(map_pcd), 1.0)
        map_pcd = map_pcd.select(rng.random(len(map_pcd)) < ratio)
        map_pcd = clean_pcd(map_pcd, opt_cfg.recon_cluster_dist_m)

        id_imgs, depth_imgs, poses = {}, {}, {}
        for idx in frame_ids[sample_idx]:
            fr = frames[idx]
            id_imgs[fr["fname"]] = (np.asarray(fr["mask"]) > 0).astype(np.int32)
            depth_imgs[fr["fname"]] = fr["depth"]
            poses[fr["fname"]] = fr["pose"]
        render_data = get_render_data(
            1, id_imgs, depth_imgs, poses, img_size, np.linalg.inv(K),
            n_fg_pix=opt_cfg.n_fg_pix, n_bg_pix=opt_cfg.n_bg_pix,
            n_bg_pad=opt_cfg.n_bg_pad, max_bbx_size=1000,
        )

        t0 = time.perf_counter()
        lat, T_ow_t, iters = opt.shape_pose_joint_opt(
            torch.from_numpy(init_latent.copy()),
            torch.eye(4, dtype=torch.float32),
            rs.torch_render_data(render_data),
            torch.from_numpy(np.asarray(map_pcd.points, np.float32)),
            radius, None, True,  # pose_known=True (scale free)
        )
        t_ref_total += time.perf_counter() - t0
        T_wo = np.linalg.inv(T_ow_t.detach().numpy())
        mesh = mesher.complete_mesh(jnp.asarray(lat.detach().numpy()), T_wo)
        gt = fruit.get("groundtruth_pcd")
        if gt is not None:
            pts = mesh.sample_points_uniformly(len(gt)).points
            cd_before = len(cd_ref.cd_array)
            cd_ref.update(gt.points, pts)
            pr_ref.update(gt.points, pts)
            per_fruit.append((fid, cd_ref.cd_array[cd_before], int(iters)))

    pr, re, f1, _ = pr_ref.compute_at_threshold(0.005)
    cd = cd_ref.compute()
    n = len(per_fruit)
    print(f"reference: CD {cd*1e3:.4f} mm  F1 {f1:.2f}%  P {pr:.2f}%  R {re:.2f}%  "
          f"time/fruit {t_ref_total/max(n,1):.2f}s over {n} fruits")

    print("\n== head-to-head ==")
    print(f"{'metric':<14}{'ours':>12}{'reference':>12}{'delta':>10}")
    for key, refv in [("CD[mm]", cd * 1e3), ("F-score[%]", f1),
                      ("Precision[%]", pr), ("Recall[%]", re)]:
        ours = summary_ours.get(key, float("nan"))
        delta = (ours - refv) / refv * 100.0 if refv else float("nan")
        print(f"{key:<14}{ours:>12.4f}{refv:>12.4f}{delta:>+9.2f}%")
    print(f"{'time/fruit[s]':<14}{summary_ours.get('timing_s', float('nan')):>12.4f}"
          f"{t_ref_total/max(n,1):>12.4f}")

    # paired per-fruit comparison: the per-fruit CD spread dwarfs the mean
    # delta, so only the PAIRED differences say whether a win is real
    ours_cds = summary_ours.get("cd_per_fruit_mm")
    if ours_cds is not None and len(ours_cds) == len(per_fruit):
        deltas = []
        print(f"\n{'fruit':<12}{'ours CD[mm]':>12}{'ref CD[mm]':>12}{'delta':>10}{'ref iters':>10}")
        for (fid, c_ref, it), c_ours in zip(per_fruit, ours_cds):
            deltas.append(c_ours - c_ref * 1e3)
            print(f"{fid:<12}{c_ours:>12.4f}{c_ref*1e3:>12.4f}"
                  f"{c_ours - c_ref*1e3:>+10.4f}{it:>10d}")  # both columns mm
        deltas = np.asarray(deltas)
        sem = deltas.std(ddof=1) / np.sqrt(len(deltas)) if len(deltas) > 1 else float("nan")
        print(f"paired mean delta {deltas.mean():+.4f} mm  sem {sem:.4f}  "
              f"(delta < 0 on {int((deltas < 0).sum())}/{len(deltas)} fruits)")
    else:
        for fid, c, it in per_fruit:
            print(f"  {fid}: reference CD {c*1e3:.4f} mm, iters {it}")


if __name__ == "__main__":
    main()
