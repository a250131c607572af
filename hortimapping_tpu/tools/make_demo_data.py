"""Generate a synthetic BUP20-style demo dataset for the wild pipeline.

The reference's example data is downloaded from an external server
(`/root/reference/scripts/download_bup_example.sh`, zero-egress here), so
the framework ships a generator that renders a fully self-consistent scene
from the synthetic ellipsoid world (`tools/synthetic.py`): N fruits with
known codes/poses in front of a background wall, observed by an orbiting
pinhole camera. Output layout matches what `test_wild_completion.py`
consumes (reference `test_wild_completion.py:92-122,140-151`):

    <out>/cam_info.yaml
    <out>/<frame>_submap_id.png      instance-id image (uint8)
    <out>/<frame>_depth.tiff         z-depth [m] (float32 tiff)
    <out>/<frame>_color.png          RGB (flat instance colors)
    <out>/<frame>_pose.txt           T_wc row-major
    <out>/submaps/00001_Background.ply
    <out>/submaps/<id>_Sweetpepper.ply   (partial observed-side mesh)
    <out>/gt_poses.npz, gt_codes.npz     ground truth for evaluation

Run:  python -m hortimapping_tpu.tools.make_demo_data --out data/synthetic_bup
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Tuple

import numpy as np

from hortimapping_tpu import native
from hortimapping_tpu.data.mesh import TriangleMesh
from hortimapping_tpu.data.ply import write_mesh
from hortimapping_tpu.models.workspace import load_specs
from hortimapping_tpu.tools.synthetic import SyntheticCategory, _ellipsoid_sdf_np
from hortimapping_tpu.vis import color_table


def scene_sdf(x_w: np.ndarray, fruits: List[Tuple[np.ndarray, np.ndarray]],
              wall_z: float) -> Tuple[np.ndarray, np.ndarray]:
    """(distance, instance) of the union scene. instance 0 = none, 1 = wall,
    k+2 = fruit k. x_w: (..., 3) world points."""
    d = wall_z - x_w[..., 2]                 # plane z = wall_z, normal -z
    inst = np.ones(x_w.shape[:-1], np.int32)
    for k, (T_ow, radii) in enumerate(fruits):
        s = np.linalg.det(T_ow[:3, :3]) ** (1.0 / 3.0)
        x_o = x_w @ T_ow[:3, :3].T + T_ow[:3, 3]
        dk = _ellipsoid_sdf_np(x_o, radii) / s
        closer = dk < d
        d = np.where(closer, dk, d)
        inst = np.where(closer, k + 2, inst)
    return d, inst


def render_frame(T_wc: np.ndarray, K: np.ndarray, W: int, H: int,
                 fruits, wall_z: float):
    """Ray-march every pixel; returns (depth z [m], instance id, rgb)."""
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    invK = np.linalg.inv(K)
    pix = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3).astype(np.float64)
    dirs_c = pix @ invK.T                     # z=1-normalized
    norms = np.linalg.norm(dirs_c, axis=-1, keepdims=True)
    dirs_w = (dirs_c / norms) @ T_wc[:3, :3].T
    origin = T_wc[:3, 3]

    t = np.full(dirs_w.shape[0], 0.05)
    for _ in range(96):
        x = origin + t[:, None] * dirs_w
        d, _ = scene_sdf(x, fruits, wall_z)
        t = t + np.clip(d, -0.05, 0.5)
    x = origin + t[:, None] * dirs_w
    d, inst = scene_sdf(x, fruits, wall_z)
    hit = (np.abs(d) < 1e-3) & (t > 0) & (t < 5.0)
    inst = np.where(hit, inst, 0)

    x_c = (x - origin) @ T_wc[:3, :3]         # world -> cam
    depth = np.where(hit, x_c[:, 2], 0.0)
    rgb = np.zeros((H * W, 3), np.uint8)
    rgb[inst == 1] = (90, 90, 90)
    for k in range(len(fruits)):
        rgb[inst == k + 2] = tuple(int(c * 255) for c in color_table[(k + 2) % 10])
    return (depth.reshape(H, W).astype(np.float32),
            inst.reshape(H, W).astype(np.uint8),
            rgb.reshape(H, W, 3))


def partial_fruit_mesh(T_wo: np.ndarray, radii: np.ndarray,
                       keep_dir_w: np.ndarray, grid_n: int = 48) -> TriangleMesh:
    """Observed-side mesh: iso-surface of the ellipsoid, keeping triangles
    whose centroid faces `keep_dir_w` (simulates a partial submap)."""
    r = float(np.max(radii)) * 1.3
    g = np.linspace(-r, r, grid_n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1)
    sdf = _ellipsoid_sdf_np(pts, radii).astype(np.float32)
    verts, faces = native.marching_tetrahedra(sdf, 0.0, spacing=float(g[1] - g[0]))
    verts = verts - r  # index space -> object frame
    T_wo33, t_wo = T_wo[:3, :3], T_wo[:3, 3]
    verts_w = verts @ T_wo33.T + t_wo
    centroids = verts_w[faces].mean(axis=1)
    center_w = t_wo
    keep = (centroids - center_w) @ keep_dir_w > -0.1 * np.linalg.norm(
        (centroids - center_w), axis=1
    )
    mesh = TriangleMesh(verts_w.astype(np.float32), faces[keep])
    return mesh


def wall_mesh(wall_z: float, half: float = 0.6, center=(0.0, 0.0)) -> TriangleMesh:
    cx, cy = center
    v = np.array([
        [cx - half, cy - half, wall_z], [cx + half, cy - half, wall_z],
        [cx + half, cy + half, wall_z], [cx - half, cy + half, wall_z],
    ], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return TriangleMesh(v, f)


def make_challenge_fruit(
    out_dir: str,
    cat: SyntheticCategory,
    proj: np.ndarray,
    code: np.ndarray,
    n_frames: int = 5,
    W: int = 160,
    H: int = 120,
    with_gt: bool = True,
    seed: int = 0,
) -> None:
    """Write one fruit in the ECCV challenge directory layout
    (reference `dataloader.py`): gt/pcd/fruit.ply, input/intrinsic.json
    (column-major K), input/{masks,poses,color}/<frame>.png|txt and
    input/depth/<frame>.npy. The fruit sits at the origin (the challenge
    uses identity pose init, `run_shape_completion_challenge.py:207-210`)."""
    import cv2

    radii = cat.base_radius * np.exp(proj @ code)
    fruits = [(np.eye(4), radii)]
    wall_z = 0.5
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1.0]])

    for sub in ["input/masks", "input/poses", "input/color", "input/depth"]:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    with open(os.path.join(out_dir, "input", "intrinsic.json"), "w") as f:
        json.dump({"intrinsic_matrix": K.flatten(order="F").tolist()}, f)

    rng = np.random.default_rng(seed)
    for fi in range(n_frames):
        ang = 2 * np.pi * fi / n_frames
        cam_pos = np.array([0.3 * np.sin(ang), 0.1 * np.cos(2 * ang),
                            -0.3 * abs(np.cos(ang)) - 0.05])
        look = np.zeros(3)
        zc = look - cam_pos
        zc /= np.linalg.norm(zc)
        xc = np.cross(np.array([0.0, 1.0, 0.0]), zc)
        xc /= np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        T_wc = np.eye(4)
        T_wc[:3, 0], T_wc[:3, 1], T_wc[:3, 2], T_wc[:3, 3] = xc, yc, zc, cam_pos
        depth, inst, rgb = render_frame(T_wc, K, W, H, fruits, wall_z)
        name = f"{fi:05d}"
        # the real challenge masks are {0,1}-valued (the reference consumes
        # them raw: `depth*mask` with depth_trunc=1.0, `dataloader.py:113`,
        # and `mask == submap_id` with submap_id=1,
        # `run_shape_completion_challenge.py:165`); 255-valued masks would
        # make the genuine reference loader truncate every pixel
        cv2.imwrite(os.path.join(out_dir, "input", "masks", name + ".png"),
                    (inst == 2).astype(np.uint8))
        np.savetxt(os.path.join(out_dir, "input", "poses", name + ".txt"), T_wc)
        cv2.imwrite(os.path.join(out_dir, "input", "color", name + ".png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        np.save(os.path.join(out_dir, "input", "depth", name + ".npy"),
                depth.astype(np.float32))

    if with_gt:
        os.makedirs(os.path.join(out_dir, "gt", "pcd"), exist_ok=True)
        dirs = rng.normal(size=(4000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        from hortimapping_tpu.data.ply import write_point_cloud
        from hortimapping_tpu.data.mesh import PointCloud

        write_point_cloud(os.path.join(out_dir, "gt", "pcd", "fruit.ply"),
                          PointCloud((dirs * radii).astype(np.float32)))


def make_challenge_dataset(out: str, deepsdf_dir: str, split: str = "val",
                           n_fruits: int = 2, n_frames: int = 5, seed: int = 11):
    """Challenge-layout dataset of synthetic fruits (for tests and the
    challenge runner without downloads)."""
    specs = load_specs(deepsdf_dir)
    syn = specs.get("synthetic", {})
    from hortimapping_tpu.models.decoder import DecoderSpec

    cat = SyntheticCategory(
        spec=DecoderSpec(code_length=int(specs["CodeLength"])),
        base_radius=float(syn.get("base_radius", 0.06)),
    )
    proj = cat.projection()
    rng = np.random.default_rng(seed)
    for k in range(n_fruits):
        code = (rng.normal(size=cat.spec.code_length) * 0.4).astype(np.float32)
        make_challenge_fruit(
            os.path.join(out, split, f"fruit_{k:02d}"), cat, proj, code,
            n_frames=n_frames, seed=seed + k,
        )


def make_lab_dataset(out: str, deepsdf_dir: str, n_fruits: int = 2,
                     n_frames: int = 6, W: int = 160, H: int = 120,
                     seed: int = 5):
    """IGG-lab layout dataset of synthetic fruits (for the lab eval drivers
    without downloads). Per fruit dir (reference eval_lab_*_frame(s).py):
        realsense/{color,depth,masks}/<frame>.{png,npy,png}
        realsense/intrinsic.json   (column-major K, depth_scale, h, w)
        realsense/scene/integrated.ply
        tf/tf_allposes.npz         (per-frame T_gc = camera pose in GT frame)
        tf/bounding_box.npz        (crop box, world frame)
        laser/fruit.ply            (GT cloud, fruit frame)
    plus a split.json listing every fruit under "test".

    Geometry convention: the fruit sits at the origin of its GT frame "g";
    frame i's camera pose in g is tfs[i]; the single-frame driver converts
    observations to its world via the fixed T_cw, and the multi-frame driver
    uses tfs directly as T_wc — both are consistent with depth images
    rendered from tfs[i].
    """
    import cv2

    specs = load_specs(deepsdf_dir)
    syn = specs.get("synthetic", {})
    from hortimapping_tpu.models.decoder import DecoderSpec
    from hortimapping_tpu.data.ply import write_point_cloud
    from hortimapping_tpu.data.mesh import PointCloud

    cat = SyntheticCategory(
        spec=DecoderSpec(code_length=int(specs["CodeLength"])),
        base_radius=float(syn.get("base_radius", 0.06)),
    )
    proj = cat.projection()
    rng = np.random.default_rng(seed)
    depth_scale = 1000.0  # depth npys stored in mm like RealSense exports
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1.0]])
    wall_z = 0.6

    fruit_ids = []
    for k in range(n_fruits):
        fid = f"fruit_{k:02d}"
        fruit_ids.append(fid)
        base = os.path.join(out, fid)
        rgbd = os.path.join(base, "realsense")
        for sub in ["color", "depth", "masks", "scene"]:
            os.makedirs(os.path.join(rgbd, sub), exist_ok=True)
        os.makedirs(os.path.join(base, "tf"), exist_ok=True)
        os.makedirs(os.path.join(base, "laser"), exist_ok=True)

        code = (rng.normal(size=cat.spec.code_length) * 0.4).astype(np.float32)
        radii = cat.base_radius * np.exp(proj @ code)
        fruits = [(np.eye(4), radii)]  # fruit at origin of g

        with open(os.path.join(rgbd, "intrinsic.json"), "w") as f:
            json.dump({"intrinsic_matrix": K.flatten(order="F").tolist(),
                       "height": H, "width": W, "depth_scale": depth_scale}, f)

        tfs = []
        all_pts = []
        for fi in range(n_frames):
            ang = 2 * np.pi * fi / n_frames
            cam_pos = np.array([0.3 * np.sin(ang), 0.08 * np.cos(ang),
                                -0.3 * abs(np.cos(ang)) - 0.08])
            zc = -cam_pos / np.linalg.norm(cam_pos)
            xc = np.cross(np.array([0.0, 1.0, 0.0]), zc)
            xc /= np.linalg.norm(xc)
            yc = np.cross(zc, xc)
            T_gc = np.eye(4)
            T_gc[:3, 0], T_gc[:3, 1], T_gc[:3, 2], T_gc[:3, 3] = xc, yc, zc, cam_pos
            tfs.append(T_gc)
            depth, inst, rgb = render_frame(T_gc, K, W, H, fruits, wall_z)
            name = f"{fi + 1:05d}"  # 1-based like the RealSense exports
            cv2.imwrite(os.path.join(rgbd, "masks", name + ".png"),
                        ((inst == 2) * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(rgbd, "color", name + ".png"),
                        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
            np.save(os.path.join(rgbd, "depth", name + ".npy"),
                    (depth * depth_scale).astype(np.float32))
            # accumulate fruit surface points (g frame) for the map
            hit = inst.reshape(-1) == 2
            if hit.any():
                u, v = np.meshgrid(np.arange(W), np.arange(H))
                z = depth.reshape(-1)[hit]
                uu, vv = u.reshape(-1)[hit], v.reshape(-1)[hit]
                x = (uu - K[0, 2]) * z / K[0, 0]
                y = (vv - K[1, 2]) * z / K[1, 1]
                p_c = np.stack([x, y, z], -1)
                all_pts.append(p_c @ T_gc[:3, :3].T + T_gc[:3, 3])

        np.savez(os.path.join(base, "tf", "tf_allposes.npz"), np.stack(tfs))
        # the multi-frame driver treats tfs as T_wc directly, so the "world"
        # of the map equals g; scene map stored in m with T_wm = tfs[0]
        map_g = np.concatenate(all_pts)
        T_mw = np.linalg.inv(tfs[0])
        map_m = map_g @ T_mw[:3, :3].T + T_mw[:3, 3]
        write_point_cloud(os.path.join(rgbd, "scene", "integrated.ply"),
                          PointCloud(map_m.astype(np.float32)))
        r = float(np.max(radii)) * 1.4
        np.savez(os.path.join(base, "tf", "bounding_box.npz"),
                 np.array([[-r, -r, -r], [r, r, r]]))

        dirs = rng.normal(size=(3000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        write_point_cloud(os.path.join(base, "laser", "fruit.ply"),
                          PointCloud((dirs * radii).astype(np.float32)))

    with open(os.path.join(out, "split.json"), "w") as f:
        json.dump({"train": [], "test": fruit_ids}, f)


def make_greenhouse_dataset(out: str, deepsdf_dir: str, n_fruits: int = 2,
                            n_frames: int = 6, W: int = 160, H: int = 120,
                            seed: int = 9):
    """CKA greenhouse layout dataset (for the eval_wild_* drivers without
    downloads). Layout (reference eval_wild_{single_frame,multi_frames}.py):
        before/realsense/{color,depth,submap_ids}/...
        before/realsense/intrinsic.json
        before/rostf_poses_no_jump.npz, rostf_poses_metashape_aligned.npz
        before/metashape/scaled_poses.npz
        before/submaps/00001_Background.ply, 000NN_Sweetpepper.ply
        fruits_measured/info.json
        fruits_measured/<fruit>/tf/{tf_allposes.npz, tf.npz, bounding_box.npz}
        fruits_measured/<fruit>/laser/fruit_clean.ply

    Geometry: one world frame w; fruit k sits at T_wg_k; cameras sweep in w
    (cam_tfs = T_wc). For the single-frame driver, tfs_cam must satisfy
    T_wg = T_wc_FIXED @ inv(tfs_cam[i]) with T_wc_FIXED = inv(T_CW_SINGLE),
    so tfs_cam[i] = T_gw @ T_wc_FIXED... the driver renders its own clouds
    from the depth images, so consistency only requires tfs_cam[i] =
    inv(T_wg) @ T_wc_single_frame_convention. Here the metashape frame m is
    chosen so that T_wm = I (ros_tfs[0] = T_BC, metashape_poses[0] = I).
    """
    import cv2

    specs = load_specs(deepsdf_dir)
    syn = specs.get("synthetic", {})
    from hortimapping_tpu.models.decoder import DecoderSpec
    from hortimapping_tpu.data.mesh import PointCloud
    from hortimapping_tpu.data.ply import write_point_cloud

    cat = SyntheticCategory(
        spec=DecoderSpec(code_length=int(specs["CodeLength"])),
        base_radius=float(syn.get("base_radius", 0.06)),
    )
    proj = cat.projection()
    rng = np.random.default_rng(seed)
    depth_scale = 1000.0
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1.0]])
    wall_z = 0.8

    base = os.path.join(out, "before")
    rgbd = os.path.join(base, "realsense")
    for sub in ["color", "depth", "submap_ids"]:
        os.makedirs(os.path.join(rgbd, sub), exist_ok=True)
    os.makedirs(os.path.join(base, "metashape"), exist_ok=True)
    submap_dir = os.path.join(base, "submaps")
    os.makedirs(submap_dir, exist_ok=True)
    gt_base = os.path.join(out, "fruits_measured")

    with open(os.path.join(rgbd, "intrinsic.json"), "w") as f:
        json.dump({"intrinsic_matrix": K.flatten(order="F").tolist(),
                   "height": H, "width": W, "depth_scale": depth_scale}, f)

    # fruits in world frame
    fruits, T_wgs, codes = [], [], []
    for k in range(n_fruits):
        code = (rng.normal(size=cat.spec.code_length) * 0.4).astype(np.float32)
        radii = cat.base_radius * np.exp(proj @ code)
        T_wg = np.eye(4)
        T_wg[:3, 3] = [0.15 * (k - (n_fruits - 1) / 2),
                       rng.uniform(-0.03, 0.03), 0.6]
        fruits.append((np.linalg.inv(T_wg), radii))
        T_wgs.append(T_wg)
        codes.append(code)

    # camera sweep in world frame
    cam_tfs = []
    for fi in range(n_frames):
        t = fi / max(n_frames - 1, 1)
        cam_pos = np.array([-0.2 + 0.4 * t, 0.02 * np.sin(6 * t), 0.1])
        look = np.array([cam_pos[0] * 0.5, 0.0, 0.6])
        zc = look - cam_pos
        zc /= np.linalg.norm(zc)
        xc = np.cross(np.array([0.0, 1.0, 0.0]), zc)
        xc /= np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        T_wc = np.eye(4)
        T_wc[:3, 0], T_wc[:3, 1], T_wc[:3, 2], T_wc[:3, 3] = xc, yc, zc, cam_pos
        cam_tfs.append(T_wc)

        depth, inst, rgb = render_frame(T_wc, K, W, H, fruits, wall_z)
        # instance ids: fruit k -> submap id k+2 (wall=1 -> 0 in submap_ids)
        sid = np.where(inst >= 2, inst, 0).astype(np.uint8)
        name = f"{fi:05d}"
        cv2.imwrite(os.path.join(rgbd, "color", name + ".png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        np.save(os.path.join(rgbd, "depth", name + ".npy"),
                (depth * depth_scale).astype(np.float32))
        cv2.imwrite(os.path.join(rgbd, "submap_ids", name + "_submap_id.png"), sid)

    cam_tfs = np.stack(cam_tfs)
    np.savez(os.path.join(base, "rostf_poses_metashape_aligned.npz"), cam_tfs)
    # T_wm = (inv(ros_tfs[0]) @ T_BC) @ inv(metashape_poses[0]) = I:
    from hortimapping_tpu.pipeline.greenhouse import T_BC, T_CW_SINGLE

    ros = np.tile(T_BC[None], (n_frames, 1, 1))
    np.savez(os.path.join(base, "rostf_poses_no_jump.npz"), ros)
    np.savez(os.path.join(base, "metashape", "scaled_poses.npz"),
             np.tile(np.eye(4)[None], (n_frames, 1, 1)))

    # submap meshes (world frame) + background wall
    write_mesh(os.path.join(submap_dir, "00001_Background.ply"),
               wall_mesh(wall_z, half=0.8))
    info = {}
    T_wc_single = np.linalg.inv(T_CW_SINGLE)
    for k, (T_wg, code) in enumerate(zip(T_wgs, codes)):
        radii = cat.base_radius * np.exp(proj @ code)
        sid = k + 2
        mesh = partial_fruit_mesh(T_wg, radii, keep_dir_w=np.array([0.0, 0.0, -1.0]))
        write_mesh(os.path.join(submap_dir, f"{sid:05d}_Sweetpepper.ply"), mesh)

        fid = f"fruit_{k:02d}"
        fdir = os.path.join(gt_base, fid)
        os.makedirs(os.path.join(fdir, "tf"), exist_ok=True)
        os.makedirs(os.path.join(fdir, "laser"), exist_ok=True)
        info[fid] = {"submap_id": sid, "begin_frame": 0, "end_frame": n_frames}
        # tfs_cam[i] = T_gc = camera pose in the GT-fruit frame: the
        # single-frame driver then recovers the fruit pose in ITS world as
        # T_wg = T_wc_single @ inv(T_gc), consistent with back-projecting
        # the rendered depth through the fixed extrinsic
        tfs_cam = np.stack(
            [np.linalg.inv(T_wg) @ cam_tfs[i] for i in range(n_frames)]
        )
        np.savez(os.path.join(fdir, "tf", "tf_allposes.npz"), tfs_cam)
        # multi-frame: T_wg = T_wm @ T_mg with T_wm = I -> T_mg = T_wg
        np.savez(os.path.join(fdir, "tf", "tf.npz"), T_wg)
        r = float(np.max(radii)) * 1.4
        np.savez(os.path.join(fdir, "tf", "bounding_box.npz"),
                 np.array([[-r, -r, -r], [r, r, r]]))
        dirs = rng.normal(size=(3000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        write_point_cloud(os.path.join(fdir, "laser", "fruit_clean.ply"),
                          PointCloud((dirs * radii).astype(np.float32)))

    os.makedirs(gt_base, exist_ok=True)
    with open(os.path.join(gt_base, "info.json"), "w") as f:
        json.dump(info, f)
    with open(os.path.join(gt_base, "info_usable.json"), "w") as f:
        json.dump(info, f)


def main():
    import cv2
    import yaml

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/synthetic_bup")
    ap.add_argument("--deepsdf_dir", default="assets/synthetic_pepper_32")
    ap.add_argument("--n_fruits", type=int, default=3)
    ap.add_argument("--n_frames", type=int, default=12)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    specs = load_specs(args.deepsdf_dir)
    syn = specs.get("synthetic", {})
    base_radius = float(syn.get("base_radius", 0.06))
    code_len = int(specs["CodeLength"])
    from hortimapping_tpu.models.decoder import DecoderSpec

    cat = SyntheticCategory(
        spec=DecoderSpec(code_length=code_len), base_radius=base_radius
    )
    proj = cat.projection()

    rng = np.random.default_rng(args.seed)
    wall_z = 0.55
    fruits, T_wos, codes = [], [], []
    for k in range(args.n_fruits):
        code = (rng.normal(size=code_len) * 0.4).astype(np.float32)
        radii = base_radius * np.exp(proj @ code)
        yaw = rng.uniform(-0.4, 0.4)
        c, s = np.cos(yaw), np.sin(yaw)
        T_wo = np.eye(4)
        T_wo[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T_wo[:3, 3] = [0.12 * (k - (args.n_fruits - 1) / 2),
                       rng.uniform(-0.03, 0.03), 0.45]
        fruits.append((np.linalg.inv(T_wo), radii))
        T_wos.append(T_wo)
        codes.append(code)

    os.makedirs(args.out, exist_ok=True)
    submap_dir = os.path.join(args.out, "submaps")
    os.makedirs(submap_dir, exist_ok=True)

    # camera intrinsics + sweep
    W, H = args.width, args.height
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1.0]])
    with open(os.path.join(args.out, "cam_info.yaml"), "w") as f:
        yaml.safe_dump(
            {"intrinsics": K.tolist(), "extrinsics": np.eye(4).tolist(),
             "img_size": [H, W]}, f)

    for fi in range(args.n_frames):
        ang = 0.5 * np.sin(2 * np.pi * fi / args.n_frames)
        cam_pos = np.array([0.25 * np.sin(ang), 0.05 * np.cos(2 * ang), -0.02])
        look = np.array([0.0, 0.0, 0.45])
        zc = look - cam_pos
        zc /= np.linalg.norm(zc)
        xc = np.cross(np.array([0.0, 1.0, 0.0]), zc)
        xc /= np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        T_wc = np.eye(4)
        T_wc[:3, 0], T_wc[:3, 1], T_wc[:3, 2], T_wc[:3, 3] = xc, yc, zc, cam_pos

        depth, inst, rgb = render_frame(T_wc, K, W, H, fruits, wall_z)
        stem = os.path.join(args.out, f"{fi:05d}")
        cv2.imwrite(stem + "_submap_id.png", inst)
        cv2.imwrite(stem + "_depth.tiff", depth)
        cv2.imwrite(stem + "_color.png", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        with open(stem + "_pose.txt", "w") as f:
            f.write("\n".join(" ".join(str(x) for x in row) for row in T_wc))

    # submaps: wall + partial fruit meshes (observed from -z side)
    write_mesh(os.path.join(submap_dir, "00001_Background.ply"),
               wall_mesh(wall_z, center=(0.0, 0.0)))
    for k, (T_wo, code) in enumerate(zip(T_wos, codes)):
        radii = base_radius * np.exp(proj @ code)
        mesh = partial_fruit_mesh(T_wo, radii, keep_dir_w=np.array([0.0, 0.0, -1.0]))
        write_mesh(os.path.join(submap_dir, f"{k + 2:05d}_Sweetpepper.ply"), mesh)

    np.savez(os.path.join(args.out, "gt_poses.npz"), np.stack(T_wos))
    np.savez(os.path.join(args.out, "gt_codes.npz"), np.stack(codes))
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({"n_fruits": args.n_fruits, "n_frames": args.n_frames,
                   "wall_z": wall_z, "base_radius": base_radius}, f)
    print(f"wrote synthetic BUP-style dataset to {args.out}")


if __name__ == "__main__":
    main()
