"""Commercial-greenhouse (CKA) evaluation with measured ground-truth fruits.

Reference: `/root/reference/eval_wild_single_frame.py` and
`eval_wild_multi_frames.py`. `fruits_measured/info.json` maps fruit id ->
{submap_id, begin_frame, end_frame}; each fruit dir carries
tf/tf_allposes.npz (T_gc per frame), tf/tf.npz (T_mg to the metashape
recon), tf/bounding_box.npz and laser/fruit_clean.ply (1 mm-downsampled GT).

single-frame: per sampled frame, a masked-depth back-projection is the
surface cloud with fixed extrinsic T_cw = [[0,0,-1],[-1,0,0],[0,1,0]]
(`eval_wild_single_frame.py:114-115`); GT pose T_wg = T_wc @ inv(T_gc).
multi-frame: either the HortiMapping submap mesh (+ bg-based pose init) or
the offline photogrammetry recon is the surface input; metashape-aligned
camera poses feed a multi-frame render term; T_wg = T_wm @ T_mg with
T_wm = (inv(ros_tfs[0]) @ T_bc) @ inv(metashape_poses[0])
(`eval_wild_multi_frames.py:86-89,148-155,180-181`).

Both report shape metrics (CD, P/R/F1 @ 5 mm) and pose metrics: translation
error ||t_wg - t_wo|| [mm] and rotation error = angle between the z-axes of
the de-scaled estimate and GT (`eval_wild_single_frame.py:281-308`), and
write per-fruit result dirs (complete_mesh / gt_pcd / estimated_pose /
gt_pose .ply).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.data.mesh import PointCloud, TriangleMesh
from hortimapping_tpu.data.ply import read_mesh, read_point_cloud, write_mesh, write_point_cloud
from hortimapping_tpu.data.preprocess import (
    build_T_wo,
    clean_mesh,
    clean_pcd,
    get_deg_between_vectors,
    get_pose_init,
)
from hortimapping_tpu.data.rays import get_render_data, render_data_to_observations, stack_observations
from hortimapping_tpu.data.rgbd import backproject
from hortimapping_tpu.metrics import ChamferDistance, PrecisionRecall
from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
from hortimapping_tpu.ops.mesher import MeshExtractor
from hortimapping_tpu.optim.lm import shape_opt_deepsdf_batched
from hortimapping_tpu.utils.misc import get_time, set_random_seed, wandb_log_summary

# fixed extrinsic initial guess of the handheld single-frame setup
# (`eval_wild_single_frame.py:114-115`)
T_CW_SINGLE = np.array(
    [[0, 0, -1, 0], [-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float64
)
# hand-fixed base->camera transform of the robot (`eval_wild_multi_frames.py:86-89`)
T_BC = np.array(
    [[0.0, -1.0, 0.0, 1.85999882],
     [0.0, 0.0, 1.0, -0.23719681],
     [-1.0, 0.0, 0.0, 2.02642561],
     [0.0, 0.0, 0.0, 1.0]]
)


def _coordinate_frame_mesh(size: float = 0.1) -> TriangleMesh:
    """Small RGB-axis triad mesh (stand-in for Open3D's coordinate frame):
    three thin axis-aligned quads colored x=red, y=green, z=blue."""
    w = size * 0.02
    verts, faces, colors = [], [], []
    axes = [(0, [1.0, 0, 0]), (1, [0, 1.0, 0]), (2, [0, 0, 1.0])]
    for ax, col in axes:
        base = len(verts)
        for corner in range(4):
            v = np.zeros(3)
            v[ax] = size if corner >= 2 else 0.0
            v[(ax + 1) % 3] = w if corner % 2 else -w
            verts.append(v)
            colors.append(col)
        faces += [[base, base + 1, base + 2], [base + 1, base + 3, base + 2]]
    return TriangleMesh(
        np.asarray(verts, np.float32), np.asarray(faces, np.int32),
        np.asarray(colors, np.float64),
    )


def _load_intrinsics(rgbd_base: str):
    with open(os.path.join(rgbd_base, "intrinsic.json")) as f:
        cam = json.load(f)
    K = np.array(cam["intrinsic_matrix"]).reshape(3, 3).T
    return K, [cam["height"], cam["width"]], cam["depth_scale"]


def prepare_greenhouse_instances(cfg: Dict, opt_cfg: JointOptConfig,
                                 multi_frame: bool) -> List[Dict]:
    """Host preprocessing for every optimization instance. Deterministic
    (seeded rng) so the differential head-to-head tools can call it again
    and feed the shimmed reference optimizer bit-identical inputs. Each
    dict: label, rd, obs, points_w, T_ow0, T_wg, gt_points_w, gt_count,
    result_dir."""
    import cv2

    object_radius_max_m = float(cfg["vis"]["object_radius_max_m"])
    deepsdf_baseline = cfg.get("baseline_name") == "DeepSDF"
    frame_per_fruit = int(cfg.get("frame_per_fruit", 20))
    data_dirs = cfg["data_dir"]
    if isinstance(data_dirs, str):
        data_dirs = [data_dirs]

    rng = np.random.default_rng(42)
    prepared: List[Dict] = []
    for data_dir in data_dirs:
        # both modes read the "before" capture sequence
        # (`eval_wild_single_frame.py:81`, `eval_wild_multi_frames.py:95`)
        input_base = os.path.join(data_dir, "before")
        rgbd_base = os.path.join(input_base, "realsense")
        K, img_size, depth_scale = _load_intrinsics(rgbd_base)
        invK = np.linalg.inv(K)
        rgb_folder = os.path.join(rgbd_base, "color")
        depth_folder = os.path.join(rgbd_base, "depth")
        submap_id_folder = os.path.join(rgbd_base, "submap_ids")
        rgb_files = sorted(os.listdir(rgb_folder))

        gt_base = os.path.join(data_dir, "fruits_measured")
        info_name = "info_usable.json" if cfg.get("useable_only") else "info.json"
        with open(os.path.join(gt_base, info_name)) as f:
            gt_fruits_info = json.load(f)
        if cfg.get("fruit_id", "none") != "none":
            gt_fruits_info = {cfg["fruit_id"]: gt_fruits_info[cfg["fruit_id"]]}

        if multi_frame:
            ros_tfs = np.load(os.path.join(input_base, "rostf_poses_no_jump.npz"),
                              allow_pickle=True)["arr_0"]
            cam_tfs = np.load(
                os.path.join(input_base, "rostf_poses_metashape_aligned.npz"),
                allow_pickle=True)["arr_0"]
            metashape_poses = np.load(
                os.path.join(input_base, "metashape", "scaled_poses.npz"),
                allow_pickle=True)["arr_0"]
            T_wm = (np.linalg.inv(ros_tfs[0]) @ T_BC) @ np.linalg.inv(metashape_poses[0])
            submap_folder = os.path.join(input_base, "submaps")
            bg_mesh = read_mesh(os.path.join(submap_folder, "00001_Background.ply"))
            bg_pcd = bg_mesh.sample_points_uniformly(500000).voxel_down_sample(0.01)

        for fruit_id, fruit_info in gt_fruits_info.items():
            cur_submap_id = fruit_info["submap_id"]
            begin_frame, end_frame = fruit_info["begin_frame"], fruit_info["end_frame"]
            fruit_base = os.path.join(gt_base, fruit_id)
            tf_folder = os.path.join(fruit_base, "tf")
            tfs_cam = np.load(os.path.join(tf_folder, "tf_allposes.npz"),
                              allow_pickle=True)["arr_0"]
            result_dir = os.path.join(fruit_base, "result_" + cfg["run_name"])
            os.makedirs(result_dir, exist_ok=True)
            gt_pcd = read_point_cloud(
                os.path.join(fruit_base, "laser", "fruit_clean.ply")
            ).voxel_down_sample(1e-3)
            sample_idx = np.linspace(
                begin_frame, end_frame - 1,
                min(end_frame - begin_frame + 1, frame_per_fruit),
            ).astype(np.int32)

            if multi_frame:
                T_mg = np.load(os.path.join(tf_folder, "tf.npz"),
                               allow_pickle=True)["arr_0"]
                T_wg = T_wm @ T_mg
                if cfg.get("use_homa", True):
                    submap_mesh = read_mesh(os.path.join(
                        submap_folder, f"{cur_submap_id:05d}_Sweetpepper.ply"))
                    pcd_w = clean_mesh(submap_mesh, opt_cfg.recon_n_pts,
                                       opt_cfg.recon_cluster_dist_m)
                    center, yaw, bbx_size, valid = get_pose_init(pcd_w, bg_pcd)
                    if not valid:
                        continue
                    scale_init = (
                        max(bbx_size / (2 * object_radius_max_m * 0.8), 0.5)
                        if (opt_cfg.pose_init_scale_on and not deepsdf_baseline) else 1.0
                    )
                    T_wo0 = build_T_wo(
                        center, yaw, scale_init,
                        rot_on=opt_cfg.pose_init_rot_on and not deepsdf_baseline,
                    )
                else:
                    recon = read_point_cloud(
                        os.path.join(fruit_base, "reconstruction.ply"))
                    bbx = np.load(os.path.join(tf_folder, "bounding_box.npz"),
                                  allow_pickle=True)["arr_0"]
                    recon_g = recon.transform(np.linalg.inv(T_mg)).crop(bbx[0], bbx[1])
                    pcd_w = recon_g.transform(T_mg).transform(T_wm)
                    n0 = len(pcd_w)
                    if n0 == 0:
                        continue
                    pcd_w = pcd_w.select(rng.random(n0) < min(opt_cfg.recon_n_pts / n0, 1.0))
                    pcd_w = clean_pcd(pcd_w, opt_cfg.recon_cluster_dist_m)
                    T_wo0 = np.eye(4)
                    T_wo0[:3, 3] = np.mean(pcd_w.aabb(), axis=0)

                id_imgs, depth_imgs, poses = {}, {}, {}
                for img_id in sample_idx:
                    img_id_str = rgb_files[img_id].split(".")[0]
                    sid_path = os.path.join(submap_id_folder, img_id_str + "_submap_id.png")
                    if not os.path.exists(sid_path):
                        continue
                    sid_img = cv2.imread(sid_path, cv2.IMREAD_GRAYSCALE)
                    sid_img[sid_img != cur_submap_id] = 0
                    depth_m = np.load(os.path.join(depth_folder, img_id_str + ".npy")) / depth_scale
                    id_imgs[img_id_str] = sid_img
                    depth_imgs[img_id_str] = depth_m
                    poses[img_id_str] = cam_tfs[img_id]
                rd = get_render_data(
                    cur_submap_id, id_imgs, depth_imgs, poses, img_size, invK,
                    n_fg_pix=opt_cfg.n_fg_pix, n_bg_pix=opt_cfg.n_bg_pix,
                    n_bg_pad=opt_cfg.n_bg_pad, max_bbx_size=400,
                )
                if rd["count"] == 0:
                    continue
                obs = render_data_to_observations(
                    rd, pcd_w.points, opt_cfg.n_frame,
                    opt_cfg.n_fg_pix, opt_cfg.n_bg_pix, opt_cfg.recon_n_pts,
                )
                prepared.append(dict(
                    label=fruit_id, rd=rd, obs=obs, points_w=pcd_w.points,
                    T_ow0=np.linalg.inv(T_wo0), T_wg=T_wg,
                    gt_points_w=gt_pcd.transform(T_wg).points,
                    gt_count=len(gt_pcd), result_dir=result_dir))
            else:
                T_wc = np.linalg.inv(T_CW_SINGLE)
                for img_id in sample_idx:
                    img_id_str = rgb_files[img_id].split(".")[0]
                    sid_path = os.path.join(submap_id_folder, img_id_str + "_submap_id.png")
                    if not os.path.exists(sid_path):
                        continue
                    sid_img = cv2.imread(sid_path, cv2.IMREAD_GRAYSCALE)
                    sid_img[sid_img != cur_submap_id] = 0
                    depth_m = np.load(os.path.join(depth_folder, img_id_str + ".npy")) / depth_scale
                    pcd = backproject(depth_m, K, pose=T_wc, mask=sid_img > 0, depth_trunc=1.0)
                    n0 = len(pcd)
                    if n0 < 0.2 * opt_cfg.recon_n_pts:
                        continue
                    pcd = pcd.select(rng.random(n0) < min(opt_cfg.recon_n_pts / n0, 1.0))
                    pcd = clean_pcd(pcd, opt_cfg.recon_cluster_dist_m)
                    T_wo0 = np.eye(4)
                    T_wo0[:3, 3] = np.mean(pcd.aabb(), axis=0)
                    rd = get_render_data(
                        cur_submap_id, {img_id_str: sid_img}, {img_id_str: depth_m},
                        {img_id_str: T_wc}, img_size, invK,
                        n_fg_pix=opt_cfg.n_fg_pix, n_bg_pix=opt_cfg.n_bg_pix,
                        n_bg_pad=opt_cfg.n_bg_pad, max_bbx_size=400,
                    )
                    if rd["count"] == 0:
                        continue
                    obs = render_data_to_observations(
                        rd, pcd.points, opt_cfg.n_frame,
                        opt_cfg.n_fg_pix, opt_cfg.n_bg_pix, opt_cfg.recon_n_pts,
                    )
                    T_wg = T_wc @ np.linalg.inv(tfs_cam[img_id])
                    prepared.append(dict(
                        label=f"{fruit_id}/{img_id_str}", rd=rd, obs=obs,
                        points_w=pcd.points,
                        T_ow0=np.linalg.inv(T_wo0), T_wg=T_wg,
                        gt_points_w=gt_pcd.transform(T_wg).points,
                        gt_count=len(gt_pcd), result_dir=result_dir))
    return prepared


def run_greenhouse_eval(cfg: Dict, multi_frame: bool, log=print) -> Dict:
    import jax
    import jax.numpy as jnp

    set_random_seed(42)
    opt_cfg = JointOptConfig.from_dict(cfg)
    params, spec = config_decoder(cfg["deepsdf_dir"], "latest")
    latents_train = load_latent_vectors(cfg["deepsdf_dir"], "latest")
    init_latent = np.asarray(jnp.mean(latents_train, axis=0))

    object_radius_max_m = float(cfg["vis"]["object_radius_max_m"])
    mc_res_mm = float(cfg["vis"]["mc_res_mm"])
    voxels_dim = int(2 * object_radius_max_m * 1e3 / mc_res_mm)
    deepsdf_baseline = cfg.get("baseline_name") == "DeepSDF"

    prepared = prepare_greenhouse_instances(cfg, opt_cfg, multi_frame)
    if not prepared:
        log("no valid instances")
        return {}

    # ---------------- batched solve ----------------
    B = len(prepared)
    lat0 = jnp.tile(jnp.asarray(init_latent)[None, :], (B, 1))
    T0 = jnp.asarray(np.stack([p["T_ow0"] for p in prepared]).astype(np.float32))
    obs_b = stack_observations([p["obs"] for p in prepared])
    t0 = get_time()
    if deepsdf_baseline:
        # baseline keeps the reference's table-mean init and fixed pose (see
        # pipeline/lab.py) — retrieval must not contaminate baseline numbers
        lat_b, it_b = shape_opt_deepsdf_batched(
            params, spec, opt_cfg, obs_b.points_w, obs_b.point_valid, lat0
        )
        latents, T_ows, iters = np.asarray(lat_b), np.asarray(T0), np.asarray(it_b)
    else:
        from hortimapping_tpu.optim.warmstart import warmstart_solve

        res = warmstart_solve(
            params, spec, opt_cfg, jnp.asarray(latents_train), obs_b,
            lat0, T0, object_radius_max_m,
        )
        latents, T_ows, iters = (np.asarray(res.latent), np.asarray(res.T_ow),
                                 np.asarray(res.iter_count))
    t_total = get_time() - t0

    # ---------------- meshing, pose metrics, outputs ----------------
    mesher = MeshExtractor(params, spec, voxels_dim, object_radius_max_m,
                           method=cfg["vis"].get("iso_method", "mt"))
    meshes = mesher.complete_mesh_batch(
        jnp.asarray(latents), [np.linalg.inv(T) for T in T_ows]
    )
    cd_metric = ChamferDistance()
    pr_metric = PrecisionRecall(min_t=0.001, max_t=0.01, num=100)
    tran_err, rot_err = [], []
    for i, (p, mesh) in enumerate(zip(prepared, meshes)):
        T_wg, gt_pts_w, gt_count = p["T_wg"], p["gt_points_w"], p["gt_count"]
        result_dir = p["result_dir"]
        T_wo = np.linalg.inv(T_ows[i])
        complete = mesh.sample_points_uniformly(gt_count)
        cd_metric.update(gt_pts_w, complete.points)
        pr_metric.update(gt_pts_w, complete.points)

        final_scale = np.linalg.det(T_wo[:3, :3]) ** (1.0 / 3.0)
        T_wo_descale = T_wo.copy()
        T_wo_descale[:3, :3] /= final_scale
        tran_err.append(np.linalg.norm(T_wg[:3, 3] - T_wo_descale[:3, 3]) * 1e3)
        rot_err.append(get_deg_between_vectors(T_wo_descale[:3, 2], T_wg[:3, 2]))

        write_mesh(os.path.join(result_dir, "complete_mesh.ply"), mesh)
        write_point_cloud(os.path.join(result_dir, "gt_pcd.ply"), PointCloud(gt_pts_w))
        write_mesh(os.path.join(result_dir, "estimated_pose.ply"),
                   _coordinate_frame_mesh().transform(T_wo_descale))
        write_mesh(os.path.join(result_dir, "gt_pose.ply"),
                   _coordinate_frame_mesh().transform(T_wg))

    pr, re, f1, thre = pr_metric.compute_at_threshold(0.005)
    cd = cd_metric.compute()
    summary = {
        "CD[mm]": cd * 1e3, "F-score[%]": f1, "Precision[%]": pr, "Recall[%]": re,
        "threshold[mm]": thre,
        "Error_trans[mm]": float(np.mean(tran_err)), "TransStd[mm]": float(np.std(tran_err)),
        "Error_rot[deg]": float(np.mean(rot_err)), "RotStd[deg]": float(np.std(rot_err)),
        "cd_per_fruit_mm": [float(c) * 1e3 for c in cd_metric.cd_array],
        "tran_err_per_fruit_mm": [float(t) for t in tran_err],
        "rot_err_per_fruit_deg": [float(r) for r in rot_err],
        "timing_s": t_total / B, "iteration": float(np.mean(iters)), "frames": B,
    }
    target = "the whole test set" if cfg.get("fruit_id", "none") == "none" else cfg["fruit_id"]
    log(f"Results on {target}")
    log(f"CD        [mm]: {summary['CD[mm]']}")
    log(f"F-score    [%]: {f1}")
    log(f"Precision  [%]: {pr}")
    log(f"Recall:    [%]: {re}")
    log(f"TransError[mm]: {summary['Error_trans[mm]']}")
    log(f"TransStd  [mm]: {summary['TransStd[mm]']}")
    log(f"RotError [deg]: {summary['Error_rot[deg]']}")
    log(f"RotStd   [deg]: {summary['RotStd[deg]']}")
    log(f"timing     [s]: {summary['timing_s']}")
    log(f"iteration     : {summary['iteration']}")
    log(f"calculated over {B} frames")
    wandb_log_summary("HOMA", cfg["run_name"], summary,
                      cfg.get("vis", {}).get("wandb_log_on", False))
    return summary
