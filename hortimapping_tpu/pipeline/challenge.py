"""ECCV shape-completion challenge runner.

Reference: `/root/reference/run_shape_completion_challenge.py` — per fruit:
crop the fused masked-RGBD cloud to a 1.5-radius box, random-downsample to
`recon.n_pts`, largest-cluster filter, identity pose init with
`pose_known=True` (scale still free) or the DeepSDF shape-only baseline,
write `results/<run>/<split>/<fid>.ply`, and report Chamfer-L1, P/R/F1 at
5 mm, mean time, and mean iterations.

TPU-native: all fruits are prepared host-side first, then solved in one
batched fused-LM program; the timing report divides the batch wall time over
fruits (the per-fruit metric the reference prints).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.data.challenge import ShapeCompletionDataset
from hortimapping_tpu.data.mesh import PointCloud
from hortimapping_tpu.data.ply import write_mesh
from hortimapping_tpu.data.preprocess import clean_pcd
from hortimapping_tpu.data.rays import get_render_data, render_data_to_observations, stack_observations
from hortimapping_tpu.metrics import ChamferDistance, PrecisionRecall
from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
from hortimapping_tpu.ops.mesher import MeshExtractor
from hortimapping_tpu.optim.lm import shape_opt_deepsdf_batched
from hortimapping_tpu.utils.misc import get_time, set_random_seed, wandb_log_summary


def run_challenge(cfg: Dict, log=print) -> Dict:
    import jax
    import jax.numpy as jnp

    set_random_seed(42)
    opt_cfg = JointOptConfig.from_dict(cfg)
    log_on = cfg.get("vis", {}).get("log_on", False)

    params, spec = config_decoder(cfg["deepsdf_dir"], "latest")
    latents_train = load_latent_vectors(cfg["deepsdf_dir"], "latest")
    init_latent = np.asarray(jnp.mean(latents_train, axis=0))

    object_radius_max_m = float(cfg["vis"]["object_radius_max_m"])
    mc_res_mm = float(cfg["vis"]["mc_res_mm"])
    voxels_dim = int(2 * object_radius_max_m * 1e3 / mc_res_mm)
    deepsdf_baseline = cfg.get("baseline_name") == "DeepSDF"
    frame_per_fruit = int(cfg.get("frame_per_fruit", opt_cfg.n_frame))

    dataset = ShapeCompletionDataset(cfg["data_dir"], cfg["split"])
    result_folder = os.path.join(cfg["data_dir"], "results", cfg["run_name"], cfg["split"])
    os.makedirs(result_folder, exist_ok=True)

    cd_metric = ChamferDistance()
    pr_metric = PrecisionRecall(min_t=0.001, max_t=0.01, num=100)
    cur_submap_id = 1  # masks are 0/1; the fruit is instance 1

    # ---------------- phase 1: host preprocessing ----------------
    prepared = []  # (fid, obs, points_obj, gt_pcd | None)
    rng = np.random.default_rng(42)
    for fruit in dataset:
        fid = fruit["fid"]
        if "lab" in fid and cfg.get("skip_lab_data", False):
            continue
        K = fruit["rgbd_intrinsic"]
        invK = np.linalg.inv(K)
        frames = fruit["rgbd_frames"]
        frame_ids = np.array(list(frames.keys()))
        sample_idx = np.linspace(
            0, len(frame_ids) - 1, min(len(frame_ids), frame_per_fruit)
        ).astype(np.int32)
        first_rgb = frames[frame_ids[0]]["rgb"]
        img_size = first_rgb.shape[:-1]

        # fused masked cloud -> crop to 1.5 r box -> downsample -> clean
        # (run_shape_completion_challenge.py:137-146)
        map_pcd: PointCloud = fruit["rgbd_pcd"]
        bound = np.ones(3) * object_radius_max_m * 1.5
        map_pcd = map_pcd.crop(-bound, bound)
        n0 = len(map_pcd)
        if n0 == 0:
            continue
        ratio = min(opt_cfg.recon_n_pts / n0, 1.0)
        sel = rng.random(n0) < ratio
        map_pcd = map_pcd.select(sel)
        map_pcd = clean_pcd(map_pcd, opt_cfg.recon_cluster_dist_m)

        id_imgs, depth_imgs, poses = {}, {}, {}
        for idx in frame_ids[sample_idx]:
            fr = frames[idx]
            id_imgs[fr["fname"]] = (np.asarray(fr["mask"]) > 0).astype(np.int32)
            depth_imgs[fr["fname"]] = fr["depth"]
            poses[fr["fname"]] = fr["pose"]
        render_data = get_render_data(
            cur_submap_id, id_imgs, depth_imgs, poses, img_size, invK,
            n_fg_pix=opt_cfg.n_fg_pix, n_bg_pix=opt_cfg.n_bg_pix,
            n_bg_pad=opt_cfg.n_bg_pad, max_bbx_size=1000,
        )
        obs = render_data_to_observations(
            render_data, map_pcd.points, opt_cfg.n_frame,
            opt_cfg.n_fg_pix, opt_cfg.n_bg_pix, opt_cfg.recon_n_pts,
        )
        prepared.append((fid, obs, map_pcd, fruit.get("groundtruth_pcd")))

    if not prepared:
        log("no fruits found")
        return {}

    # ---------------- phase 2: batched solve ----------------
    B = len(prepared)
    lat0 = jnp.tile(jnp.asarray(init_latent)[None, :], (B, 1))
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
    t0 = get_time()
    if deepsdf_baseline:
        # shape-only baseline, pose frozen at identity (points already ~object
        # frame) — all fruits in one vmapped solve, one device->host fetch
        obs_b = stack_observations([p[1] for p in prepared])
        lat_b, iter_b = shape_opt_deepsdf_batched(
            params, spec, opt_cfg, obs_b.points_w, obs_b.point_valid, lat0
        )
        latents = np.asarray(lat_b)
        T_ows = np.asarray(T0)
        iters = np.asarray(iter_b)
        failed = np.zeros(B, bool)
    else:
        obs_b = stack_observations([p[1] for p in prepared])
        # retrieval warm start + optional multi-start + configured solver
        # (optim/warmstart.warmstart_solve; the reference always starts from
        # the table mean, `run_shape_completion_challenge.py:74-77`)
        from hortimapping_tpu.optim.warmstart import warmstart_solve

        res = warmstart_solve(
            params, spec, opt_cfg, jnp.asarray(latents_train), obs_b,
            lat0, T0, object_radius_max_m, pose_known=True,
        )
        latents = np.asarray(res.latent)
        T_ows = np.asarray(res.T_ow)
        iters = np.asarray(res.iter_count)
        failed = np.asarray(res.failed)
    t_total = get_time() - t0

    # ---------------- phase 3: meshing, metrics, summary ----------------
    mesher = MeshExtractor(params, spec, voxels_dim, object_radius_max_m,
                           method=cfg["vis"].get("iso_method", "mt"))
    meshes = mesher.complete_mesh_batch(
        jnp.asarray(latents), [np.linalg.inv(T) for T in T_ows]
    )
    gt_valid = cfg["split"] != "test"
    for (fid, _, _, gt_pcd), mesh in zip(prepared, meshes):
        write_mesh(os.path.join(result_folder, fid + ".ply"), mesh)
        if gt_valid and gt_pcd is not None:
            complete_pcd = mesh.sample_points_uniformly(len(gt_pcd))
            cd_metric.update(gt_pcd.points, complete_pcd.points)
            pr_metric.update(gt_pcd.points, complete_pcd.points)

    summary: Dict = {
        "fruits": B,
        "failed": int(failed.sum()),
        "timing_s": t_total / B,
        "iteration": float(np.mean(iters)),
    }
    if gt_valid:
        pr, re, f1, thre = pr_metric.compute_at_threshold(0.005)
        cd = cd_metric.compute()
        summary.update({
            "CD[mm]": cd * 1e3, "F-score[%]": f1, "Precision[%]": pr,
            "Recall[%]": re, "threshold[mm]": thre,
            # per-fruit CDs [mm] in dataset order: paired comparisons
            # against another solver/run need per-instance values, not means
            "cd_per_fruit_mm": [float(c) * 1e3 for c in cd_metric.cd_array],
        })
        log(f"Results on the {cfg['split']} set")
        log(f"CD        [mm]: {cd * 1e3}")
        log(f"F-score    [%]: {f1}")
        log(f"Precision  [%]: {pr}")
        log(f"Recall:    [%]: {re}")
        log(f"threshold [mm]: {thre}")
    log(f"timing     [s]: {summary['timing_s']}")
    log(f"iteration     : {summary['iteration']}")
    log(f"calculated over {B} fruits")
    wandb_log_summary("HOMA", cfg["run_name"], summary,
                      cfg.get("vis", {}).get("wandb_log_on", False))
    return summary
