"""Headless visualizer-core tests (hortimapping_tpu/vis/core.py).

The Open3D window is optional and absent in CI; everything the reference
`OptVisualizer` bookkeeps — geometry handles, display toggles, the
pause/skip/viewpoint flags, the per-iteration mesh+frame+counter update —
is exercised here against a FakeRenderer, including the traced-trajectory
replay wiring of the interactive wild pipeline.
"""

import numpy as np
import pytest

from hortimapping_tpu.data.mesh import PointCloud, TriangleMesh
from hortimapping_tpu.vis.core import FakeRenderer, VisualizerCore


def _scan():
    pts = np.array([[0, 0, 0], [0.1, 0.1, 0.1]], np.float32)
    return PointCloud(pts)


def _mesh():
    v = np.array([[0, 0, 0], [0.05, 0, 0], [0, 0.05, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    return TriangleMesh(v, f)


def _core():
    r = FakeRenderer()
    return VisualizerCore(r, frame_axis_len=0.1, pause_time_s=0.0), r


def test_add_scan_sets_anchors_and_counter():
    core, r = _core()
    core.add_scan(_scan())
    assert "scan" in r.shown and "txt" in r.shown
    # anchors derived from the scan bbox center (reference :171-182)
    np.testing.assert_allclose(core.cano_tran, [0.05 + 0.2, 0.05, 0.05])
    np.testing.assert_allclose(core.txt_tran, [0.25 - 0.35, 0.05, 0.05])
    assert core.iteration == 0


def test_update_mesh_pose_shows_mesh_frame_counter():
    core, r = _core()
    core.add_scan(_scan())
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    core.update_mesh_pose(_mesh(), T, iteration=7)
    assert {"scan", "mesh", "frame", "txt"} <= set(r.shown)
    assert core.iteration == 7
    # the shown mesh is the POSED copy
    np.testing.assert_allclose(core.mesh.vertices[0], [1.0, 2.0, 3.0])
    # first update resets the viewpoint once, later ones don't (:284-286)
    assert r.view_resets == 1
    core.update_mesh_pose(_mesh(), T, iteration=8)
    assert r.view_resets == 1
    assert core.iteration == 8


def test_toggles_add_remove_geometry():
    core, r = _core()
    core.add_scan(_scan())
    core.add_gt_scan(_scan())
    core.update_mesh_pose(_mesh(), np.eye(4), 1)

    core.on_toggle_mesh()
    assert "mesh" not in r.shown
    core.on_toggle_mesh()
    assert "mesh" in r.shown

    core.on_toggle_frame()
    assert "frame" not in r.shown
    core.on_toggle_frame()
    assert "frame" in r.shown

    core.on_toggle_gt()
    assert "gt" not in r.shown
    core.on_toggle_gt()
    assert "gt" in r.shown

    # canonical copy appears beside the scan on the NEXT update after C
    core.on_toggle_cano()
    core.update_mesh_pose(_mesh(), np.eye(4), 2)
    assert "cano" in r.shown
    np.testing.assert_allclose(
        np.asarray(r.shown["cano"].vertices[0]), core.cano_tran)
    core.on_toggle_cano()
    assert "cano" not in r.shown


def test_viewpoint_save_restore():
    core, r = _core()
    core.on_toggle_view()          # -> global view, saves current viewpoint
    assert core.global_view
    assert ("restore_viewpoint", ("viewpoint", 1)) not in r.ops
    core.on_toggle_view()          # -> back, restores the saved viewpoint
    assert not core.global_view
    assert any(op[0] == "restore_viewpoint" for op in r.ops)


def test_stop_blocks_until_space_and_skip_flag():
    core, r = _core()
    r.events.append(core.on_start_stop)
    assert core.stop() is False     # SPACE: continue, no skip

    r.events.append(core.on_skip)
    assert core.stop() is True      # N: skip
    assert core.skip_flag
    core.clean_vis()                # skip persists until clean_vis (:134-135)
    assert not core.skip_flag
    assert r.shown == {}
    assert core.reset_bounding_box


def test_wild_pipeline_interactive_replay(tmp_path, monkeypatch):
    """The interactive wild path replays the traced per-iteration trajectory
    through the visualizer — exercised end to end with a FakeRenderer-backed
    core (the wiring the real OptVisualizer window receives)."""
    import os
    import sys

    ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "synthetic_small_8")
    if not os.path.isdir(ASSET_DIR):
        pytest.skip("synthetic assets not built")

    from hortimapping_tpu.tools import make_demo_data

    root = str(tmp_path / "wild")
    argv = ["make_demo_data", "--out", root, "--deepsdf_dir", ASSET_DIR,
            "--n_fruits", "1", "--n_frames", "4", "--width", "144",
            "--height", "108", "--seed", "3"]
    monkeypatch.setattr(sys, "argv", argv)
    make_demo_data.main()

    class AutoRenderer(FakeRenderer):
        """Auto-presses SPACE whenever the core blocks (so stop() returns)."""

        def __init__(self):
            super().__init__()
            self.core = None

        def poll(self):
            super().poll()
            if self.core is not None and self.core.block_vis:
                self.core.on_start_stop()

    renderer = AutoRenderer()
    core = VisualizerCore(renderer, pause_time_s=0.0)
    renderer.core = core

    import hortimapping_tpu.pipeline.wild as wild

    monkeypatch.setattr(wild, "make_visualizer", lambda *a, **k: core)
    cfg = {
        "run_name": "vis_replay", "deepsdf_dir": ASSET_DIR, "data_dir": root,
        "cam_info_path": os.path.join(root, "cam_info.yaml"),
        "baseline_name": "none",
        "begin_submap": 1, "begin_frame": 0, "end_frame": 2000,
        "every_frame": 1, "device": "tpu",
        "opt": {
            "scale_on": True,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3,
                   "s_damp": 1e-3},
            "pose_init": {"rot_on": True, "scale_on": True},
            "recon": {"n_pts": 200, "cluster_dist_m": 0.01, "robust_th_m": 0.01},
            "render": {
                "n_fg_pix": 48, "n_bg_pix": 32, "n_bg_pad": 8, "n_frame": 3,
                "n_sample_on_ray": 14, "log_sdf_occ": True,
                "occ_cutoff_m": 0.01, "occlusion_on": True, "robust_th_m": 0.05,
            },
            "weight": {"w_recon": 1, "w_depth": 5e-2, "w_mask": 5e-4,
                       "w_codereg": 5e-4},
            "converge": {"max_iter": 6, "epsilon_g": 1e-4, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 4,
            "outlier": {"scale_max": 2.0, "scale_min": 0.3, "rot_max_deg": 89},
        },
        "vis": {"log_on": False, "vis_on": True, "wandb_log_on": False,
                "object_radius_max_m": 0.08, "mc_res_mm": 8.0},
    }
    results = wild.run_wild_completion(cfg, log=lambda *a: None)
    solved = [res for res in results if res.iter_count > 0]
    assert solved, "no fruit reached the solver"
    # one mesh update per recorded LM iteration reached the renderer
    mesh_updates = [op for op in renderer.ops if op[:2] == ("add", "mesh")]
    assert len(mesh_updates) >= max(res.iter_count for res in solved)
    assert "scan" in [op[1] for op in renderer.ops if op[0] == "add"]


def test_add_scan_accepts_foreign_point_types():
    """add_scan must take any accepted scan type, not just the framework's
    PointCloud: an o3d-like object (get_axis_aligned_bounding_box) and a
    bare points-holder both anchor the canonical mesh/counter correctly."""

    class _FakeBox:
        min_bound = np.zeros(3)
        max_bound = np.full(3, 0.1)

    class _FakeO3dPcd:
        points = np.array([[0, 0, 0], [0.1, 0.1, 0.1]], np.float64)

        def get_axis_aligned_bounding_box(self):
            return _FakeBox()

    class _BarePoints:
        points = np.array([[0, 0, 0], [0.1, 0.1, 0.1]], np.float64)

    for scan in (_FakeO3dPcd(), _BarePoints()):
        core, r = _core()
        core.add_scan(scan)
        np.testing.assert_allclose(core.cano_tran, [0.05 + 0.2, 0.05, 0.05])
        assert "scan" in r.shown and "txt" in r.shown
