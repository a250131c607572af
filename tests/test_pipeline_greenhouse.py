"""End-to-end greenhouse (CKA) evaluation pipelines on generated data (CPU)."""

import os

import pytest

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]


@pytest.fixture(scope="module")
def gh_dir(tmp_path_factory):
    from hortimapping_tpu.tools.make_demo_data import make_greenhouse_dataset

    root = str(tmp_path_factory.mktemp("greenhouse"))
    make_greenhouse_dataset(root, ASSET_DIR, n_fruits=2, n_frames=6)
    return root


def _cfg(gh_dir):
    return {
        "run_name": "gh_test",
        "use_homa": True,
        "useable_only": False,
        "baseline_name": "none",
        "deepsdf_dir": ASSET_DIR,
        "data_dir": [gh_dir],
        "fruit_id": "none",
        "frame_per_fruit": 4,
        "device": "tpu",
        "opt": {
            "scale_on": True,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.5, "s_damp": 1e-3},
            "pose_init": {"rot_on": True, "scale_on": True},
            "recon": {"n_pts": 250, "cluster_dist_m": 0.01, "robust_th_m": 0.01},
            "render": {
                "n_fg_pix": 60, "n_bg_pix": 40, "n_bg_pad": 8, "n_frame": 4,
                "n_sample_on_ray": 14, "log_sdf_occ": True, "occ_cutoff_m": 0.01,
                "occlusion_on": True, "robust_th_m": 0.05,
            },
            "weight": {"w_recon": 1, "w_depth": 5e-2, "w_mask": 1e-3, "w_codereg": 5e-4},
            "converge": {"max_iter": 10, "epsilon_g": 1e-4, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 2,
            "outlier": {"scale_max": 2.0, "scale_min": 0.3, "rot_max_deg": 80},
        },
        "vis": {"log_on": False, "vis_on": False, "wandb_log_on": False,
                "object_radius_max_m": 0.075, "mc_res_mm": 6.0},
    }


def test_greenhouse_multi_frames(gh_dir):
    from hortimapping_tpu.pipeline.greenhouse import run_greenhouse_eval

    summary = run_greenhouse_eval(_cfg(gh_dir), multi_frame=True, log=lambda *a: None)
    assert summary["frames"] >= 1
    assert summary["CD[mm]"] < 20.0
    assert summary["Error_trans[mm]"] < 40.0
    # per-fruit result dirs written
    for fid in ["fruit_00", "fruit_01"]:
        rdir = os.path.join(gh_dir, "fruits_measured", fid, "result_gh_test")
        if os.path.isdir(rdir) and os.listdir(rdir):
            assert os.path.isfile(os.path.join(rdir, "complete_mesh.ply"))
            assert os.path.isfile(os.path.join(rdir, "gt_pose.ply"))


def test_greenhouse_single_frame(gh_dir):
    from hortimapping_tpu.pipeline.greenhouse import run_greenhouse_eval

    summary = run_greenhouse_eval(_cfg(gh_dir), multi_frame=False, log=lambda *a: None)
    assert summary["frames"] >= 1
    assert summary["CD[mm]"] < 25.0
    assert "Error_rot[deg]" in summary
