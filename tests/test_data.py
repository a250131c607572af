"""Data layer: ray sampling, preprocessing, RGB-D back-projection, PLY round-trip."""

import numpy as np
import pytest

from hortimapping_tpu.data.mesh import PointCloud, TriangleMesh
from hortimapping_tpu.data.preprocess import (
    build_T_wo,
    clean_pcd,
    get_deg_between_vectors,
    get_pose_init,
)
from hortimapping_tpu.data.rays import (
    get_rays,
    get_render_data,
    render_data_to_observations,
)
from hortimapping_tpu.data.rgbd import backproject, erode, preprocess_depth


def _camera():
    K = np.array([[500.0, 0.0, 64.0], [0.0, 500.0, 48.0], [0.0, 0.0, 1.0]])
    return K, np.linalg.inv(K)


def test_get_rays_pinhole():
    K, invK = _camera()
    pix = np.array([[64.0, 48.0], [100.0, 60.0]])  # (u, v)
    rays = get_rays(pix, invK)
    # principal point -> optical axis
    np.testing.assert_allclose(rays[0], [0.0, 0.0, 1.0], atol=1e-6)
    # ray * depth reprojects to the pixel
    p = rays[1] * 0.5
    uvw = K @ p
    np.testing.assert_allclose(uvw[:2] / uvw[2], pix[1], atol=1e-4)


def _synthetic_frame(H=96, W=128, submap_id=7):
    """Instance-id image with a centered square fruit + valid depths."""
    id_img = np.zeros((H, W), np.int32)
    id_img[30:70, 40:90] = submap_id
    depth = np.zeros((H, W), np.float32)
    depth[20:80, 30:100] = 0.5
    return id_img, depth


def test_get_render_data_shapes_and_split():
    K, invK = _camera()
    id_img, depth = _synthetic_frame()
    rd = get_render_data(
        submap_id=7,
        id_imgs={"f0": id_img},
        depth_imgs={"f0": depth},
        cam_poses={"f0": np.eye(4)},
        img_size=(96, 128),
        invK=invK,
        n_fg_pix=50,
        n_bg_pix=40,
        n_bg_pad=5,
        rng=np.random.default_rng(0),
    )
    assert rd["count"] == 1
    assert rd["rays_fg"][0].shape == (50, 3)
    assert rd["rays_bg"][0].shape == (40, 3)
    # all fg depths are the valid 0.5; bg pixels lie outside the mask
    np.testing.assert_allclose(rd["depth_fg"][0], 0.5)
    u, v = rd["pix_bg"][0][:, 0], rd["pix_bg"][0][:, 1]
    assert not np.any(id_img[v, u] == 7)


def test_get_render_data_rejects_small_match():
    K, invK = _camera()
    id_img = np.zeros((96, 128), np.int32)
    id_img[40:44, 50:54] = 7  # 16 px < min_pix_count_match
    depth = np.full((96, 128), 0.5, np.float32)
    rd = get_render_data(
        7, {"f0": id_img}, {"f0": depth}, {"f0": np.eye(4)}, (96, 128), invK,
        n_fg_pix=50, n_bg_pix=40, n_bg_pad=5,
    )
    assert rd["count"] == 0


def test_render_data_to_observations_padding():
    K, invK = _camera()
    id_img, depth = _synthetic_frame()
    rd = get_render_data(
        7, {"f0": id_img}, {"f0": depth}, {"f0": np.eye(4)}, (96, 128), invK,
        n_fg_pix=50, n_bg_pix=40, n_bg_pad=5, rng=np.random.default_rng(0),
    )
    obs = render_data_to_observations(
        rd, points_w=np.zeros((10, 3), np.float32),
        n_frame=3, n_fg_pix=50, n_bg_pix=40, n_points=64,
    )
    assert obs.rays.shape == (3, 90, 3)
    assert bool(obs.frame_valid[0]) and not bool(obs.frame_valid[1])
    assert int(obs.ray_valid[0].sum()) == 90
    assert int(obs.point_valid.sum()) == 10


def test_clean_pcd_keeps_largest_cluster(rng):
    main = rng.normal(size=(400, 3)) * 0.005          # tight blob
    outlier = rng.normal(size=(8, 3)) * 0.005 + 1.0   # far-away blob
    pcd = PointCloud(np.concatenate([main, outlier]).astype(np.float32))
    cleaned = clean_pcd(pcd, cluster_dist_thre=0.01, outlier_point_ratio=0.02)
    assert len(cleaned) >= 390
    assert np.all(np.linalg.norm(cleaned.points, axis=1) < 0.5)


def test_get_pose_init_center_and_gates(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 0.04  # r=4cm sphere
    center, yaw, bbx, valid = get_pose_init(PointCloud(pts + 0.5), None)
    assert valid
    assert abs(bbx - 0.09) < 0.02
    np.testing.assert_allclose(center[[0, 2]], [0.5, 0.5], atol=0.01)
    # too small / too large gates
    _, _, _, v_small = get_pose_init(PointCloud(pts * 0.1), None)
    assert not v_small
    _, _, _, v_large = get_pose_init(PointCloud(pts * 10.0), None)
    assert not v_large


def test_get_pose_init_yaw_from_bg():
    # fruit at origin; bg support cluster behind it and +x -> nonzero yaw
    t = np.linspace(0, 2 * np.pi, 400)
    ring = np.stack([0.04 * np.cos(t), 0.04 * np.sin(t), np.zeros_like(t)], -1)
    bg = np.tile(np.array([[0.05, 0.0, 0.06]]), (50, 1)) + np.random.default_rng(0).normal(
        size=(50, 3)
    ) * 0.002
    center, yaw, _, valid = get_pose_init(PointCloud(ring.astype(np.float32)), PointCloud(bg))
    assert valid and abs(yaw) > 1e-3
    T = build_T_wo(center, yaw, 1.2)
    # Sim(3): det(R*s) = s^3
    assert abs(np.linalg.det(T[:3, :3]) - 1.2**3) < 1e-9


def test_deg_between_vectors():
    assert abs(get_deg_between_vectors(np.array([1, 0, 0]), np.array([0, 1, 0])) - 90.0) < 1e-9
    assert abs(get_deg_between_vectors(np.array([1, 0, 0]), np.array([1, 0, 0]))) < 1e-5


def test_backproject_roundtrip():
    K, _ = _camera()
    depth = np.zeros((96, 128), np.float32)
    depth[48, 64] = 0.5   # principal point
    depth[60, 100] = 0.8
    depth[10, 10] = 2.0   # beyond depth_trunc -> dropped
    pose = np.eye(4)
    pose[:3, 3] = [0.1, 0.0, 0.0]
    pcd = backproject(depth, K, pose=pose, depth_trunc=1.0)
    assert len(pcd) == 2
    np.testing.assert_allclose(pcd.points[0], [0.1, 0.0, 0.5], atol=1e-6)
    # reproject the second point back through K
    p_cam = pcd.points[1] - np.array([0.1, 0.0, 0.0])
    uvw = K @ p_cam
    np.testing.assert_allclose(uvw[:2] / uvw[2], [100, 60], atol=1e-4)


def test_backproject_mask():
    K, _ = _camera()
    depth = np.full((96, 128), 0.5, np.float32)
    mask = np.zeros((96, 128), np.uint8)
    mask[40:50, 60:70] = 1
    pcd = backproject(depth, K, mask=mask)
    assert len(pcd) == 100


def test_depth_preprocess_erode_shrinks_support():
    depth = np.zeros((60, 60), np.float32)
    depth[10:50, 10:50] = 0.5
    out = preprocess_depth(depth, erosion_size=5)
    assert out.shape == depth.shape
    # erosion removes a 5-px rim from the valid region
    assert np.count_nonzero(out) < np.count_nonzero(depth)
    assert out[30, 30] > 0.4


def test_mesh_clean_pipeline(rng):
    # icosphere-ish mesh from random surface triangulation is overkill;
    # use two disjoint triangles: big cluster vs small -> sampling keeps both,
    # dbscan keeps the dominant sample cluster
    big = TriangleMesh(
        np.array([[0, 0, 0], [0.05, 0, 0], [0, 0.05, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32),
    )
    from hortimapping_tpu.data.preprocess import clean_mesh

    pcd = clean_mesh(big, sample_point_count=500, cluster_dist_thre=0.02)
    assert len(pcd) >= 450
