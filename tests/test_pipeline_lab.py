"""End-to-end lab evaluation pipelines on generated lab-layout data (CPU)."""

import os

import pytest

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]


@pytest.fixture(scope="module")
def lab_dir(tmp_path_factory):
    from hortimapping_tpu.tools.make_demo_data import make_lab_dataset

    root = str(tmp_path_factory.mktemp("lab"))
    make_lab_dataset(root, ASSET_DIR, n_fruits=2, n_frames=5)
    return root


def _cfg(lab_dir):
    return {
        "run_name": "lab_test",
        "deepsdf_dir": ASSET_DIR,
        "data_dir": lab_dir,
        "fruit_id": "none",
        "split": os.path.join(lab_dir, "split.json"),
        "baseline_name": "none",
        "frame_per_fruit": 3,
        "device": "tpu",
        "opt": {
            "scale_on": False,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3, "s_damp": 1e-3},
            "pose_init": {"rot_on": False, "scale_on": False},
            "recon": {"n_pts": 250, "cluster_dist_m": 0.01, "robust_th_m": 0.005},
            "render": {
                "n_fg_pix": 60, "n_bg_pix": 40, "n_bg_pad": 10, "n_frame": 3,
                "n_sample_on_ray": 14, "log_sdf_occ": False, "occ_cutoff_m": 0.005,
                "occlusion_on": False, "robust_th_m": 0.02,
            },
            "weight": {"w_recon": 1.0, "w_depth": 5e-2, "w_mask": 1e-4, "w_codereg": 1e-4},
            "converge": {"max_iter": 10, "epsilon_g": 1e-5, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 5,
        },
        "vis": {"log_on": False, "vis_on": False, "wandb_log_on": False,
                "object_radius_max_m": 0.08, "mc_res_mm": 6.0},
    }


def test_lab_multi_frames(lab_dir):
    from hortimapping_tpu.pipeline.lab import run_lab_eval

    summary = run_lab_eval(_cfg(lab_dir), multi_frame=True, log=lambda *a: None)
    assert summary["frames"] == 2  # one instance per fruit
    assert summary["CD[mm]"] < 15.0
    assert 0 <= summary["F-score[%]"] <= 100


def test_lab_single_frame(lab_dir):
    from hortimapping_tpu.pipeline.lab import run_lab_eval

    summary = run_lab_eval(_cfg(lab_dir), multi_frame=False, log=lambda *a: None)
    # up to 2 fruits x 3 sampled frames instances, some may be gated out
    assert summary["frames"] >= 2
    assert summary["CD[mm]"] < 20.0
