"""End-to-end wild (BUP20-style) pipeline on generated synthetic data (CPU)."""

import json
import os

import numpy as np
import pytest

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]


@pytest.fixture(scope="module")
def wild_dir(tmp_path_factory):
    import subprocess
    import sys

    root = str(tmp_path_factory.mktemp("wild"))
    # generator is a CLI (reference parity); run it in-process via module main
    argv = [
        "--out", root, "--deepsdf_dir", ASSET_DIR, "--n_fruits", "2",
        "--n_frames", "5", "--width", "144", "--height", "108", "--seed", "3",
    ]
    from hortimapping_tpu.tools import make_demo_data

    old = sys.argv
    sys.argv = ["make_demo_data"] + argv
    try:
        make_demo_data.main()
    finally:
        sys.argv = old
    return root


def _cfg(wild_dir):
    return {
        "run_name": "wild_test",
        "deepsdf_dir": ASSET_DIR,
        "data_dir": wild_dir,
        "cam_info_path": os.path.join(wild_dir, "cam_info.yaml"),
        "baseline_name": "none",
        "begin_submap": 1, "begin_frame": 0, "end_frame": 2000, "every_frame": 1,
        "device": "tpu",
        "opt": {
            "scale_on": True,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3, "s_damp": 1e-3},
            "pose_init": {"rot_on": True, "scale_on": True},
            "recon": {"n_pts": 200, "cluster_dist_m": 0.01, "robust_th_m": 0.01},
            "render": {
                "n_fg_pix": 48, "n_bg_pix": 32, "n_bg_pad": 8, "n_frame": 3,
                "n_sample_on_ray": 14, "log_sdf_occ": True, "occ_cutoff_m": 0.01,
                "occlusion_on": True, "robust_th_m": 0.05,
            },
            "weight": {"w_recon": 1, "w_depth": 5e-2, "w_mask": 5e-4, "w_codereg": 5e-4},
            "converge": {"max_iter": 10, "epsilon_g": 1e-4, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 4,
            "outlier": {"scale_max": 2.0, "scale_min": 0.3, "rot_max_deg": 80},
        },
        "vis": {"log_on": False, "vis_on": False, "vis_pause_s": 0.0,
                "object_radius_max_m": 0.075, "mc_res_mm": 6.0},
    }


def test_wild_pipeline_end_to_end(wild_dir):
    from hortimapping_tpu.pipeline.wild import run_wild_completion

    results = run_wild_completion(_cfg(wild_dir), log=lambda *a: None)
    ok = [r for r in results if r.valid]
    assert len(ok) >= 1, [(r.name, r.reason) for r in results]

    # output tree matches the reference layout
    for sub in ["submaps_complete", "submaps_clean", "submaps_pose"]:
        assert os.path.isdir(os.path.join(wild_dir, sub))
    for r in ok:
        assert os.path.isfile(os.path.join(wild_dir, "submaps_complete", r.name))
        pose = np.load(os.path.join(
            wild_dir, "submaps_pose", r.name.replace("ply", "npy")))
        assert pose.shape == (4, 4)
        # recovered translation within 2 cm of GT (synthetic world)
        gt = np.load(os.path.join(wild_dir, "gt_poses.npz"))["arr_0"]
        T_gt = gt[r.submap_id - 2]
        assert np.linalg.norm(pose[:3, 3] - T_gt[:3, 3]) < 0.02

    # manifest written for resume
    manifest = os.path.join(wild_dir, "submaps_complete", "manifest.json")
    assert os.path.isfile(manifest)
    entries = json.loads(open(manifest).read())
    assert {e["name"] for e in entries if e["valid"]} == {r.name for r in ok}


def test_wild_pipeline_resume_skips_done(wild_dir):
    """Second run with resume: completed submaps are skipped entirely."""
    from hortimapping_tpu.pipeline.wild import run_wild_completion

    cfg = _cfg(wild_dir)
    cfg["resume"] = True
    results = run_wild_completion(cfg, log=lambda *a: None)
    done_before = json.loads(
        open(os.path.join(wild_dir, "submaps_complete", "manifest.json")).read()
    )
    # nothing new to do: every result this run is for a not-yet-valid submap
    assert all(not r.valid or r.name not in {e["name"] for e in done_before if e["valid"]}
               for r in results) or results == []


def test_wild_pipeline_coarse_to_fine(wild_dir):
    """The wild pipeline with the opt.tpu two-resolution solver block
    (configs/wild_pepper_tpu.yaml pattern) completes the same submaps."""
    from hortimapping_tpu.pipeline.wild import run_wild_completion

    cfg = _cfg(wild_dir)
    cfg["run_name"] = "wild_test_c2f"
    cfg["opt"]["tpu"] = {
        "coarse_to_fine": True, "coarse_frame_stride": 2,
        "coarse_ray_frac": 0.5, "coarse_sample_frac": 0.5,
        "coarse_pts_frac": 0.5, "fine_max_iter": 4,
    }
    results = run_wild_completion(cfg, log=lambda *a: None)
    assert len(results) > 0
    assert any(r.valid for r in results)
