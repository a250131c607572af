"""End-to-end challenge pipeline on generated challenge-format data (CPU)."""

import os

import numpy as np
import pytest

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]


@pytest.fixture(scope="module")
def challenge_dir(tmp_path_factory):
    from hortimapping_tpu.tools.make_demo_data import make_challenge_dataset

    root = tmp_path_factory.mktemp("challenge")
    make_challenge_dataset(str(root), ASSET_DIR, split="val", n_fruits=2, n_frames=4)
    return str(root)


def _cfg(challenge_dir):
    return {
        "run_name": "test_run",
        "deepsdf_dir": ASSET_DIR,
        "data_dir": challenge_dir,
        "split": "val",
        "skip_lab_data": False,
        "baseline_name": "none",
        "frame_per_fruit": 4,
        "device": "tpu",
        "opt": {
            "scale_on": True,
            "lm": {"lm_on": True, "lm_eye": False, "lm_lambda_0": 0.3, "s_damp": 1e-3},
            "pose_init": {"rot_on": False, "scale_on": False},
            "recon": {"n_pts": 300, "cluster_dist_m": 0.01, "robust_th_m": 0.005},
            "render": {
                "n_fg_pix": 60, "n_bg_pix": 40, "n_bg_pad": 10, "n_frame": 4,
                "n_sample_on_ray": 16, "log_sdf_occ": True, "occ_cutoff_m": 0.01,
                "occlusion_on": False, "robust_th_m": 0.02,
            },
            "weight": {"w_recon": 1.0, "w_depth": 5e-2, "w_mask": 5e-4, "w_codereg": 5e-4},
            "converge": {"max_iter": 12, "epsilon_g": 1e-4, "epsilon_c": 1e-2,
                         "epsilon_t": 1e-3, "epsilon_r": 1.0, "epsilon_s": 1e-3},
            "robust_iter": 4,
        },
        "vis": {"log_on": False, "vis_on": False, "wandb_log_on": False,
                "object_radius_max_m": 0.08, "mc_res_mm": 6.0},
    }


def test_dataset_loader(challenge_dir):
    from hortimapping_tpu.data.challenge import ShapeCompletionDataset

    ds = ShapeCompletionDataset(challenge_dir, "val")
    assert len(ds) == 2
    item = ds[0]
    assert "groundtruth_pcd" in item and len(item["groundtruth_pcd"]) == 4000
    assert item["rgbd_intrinsic"].shape == (3, 3)
    assert item["rgbd_intrinsic"][0, 2] > 1.0  # column-major parse: cx in [0, 2]
    assert len(item["rgbd_frames"]) == 4
    assert len(item["rgbd_pcd"]) > 500  # fused masked back-projection


def test_run_challenge_end_to_end(challenge_dir):
    from hortimapping_tpu.pipeline.challenge import run_challenge

    summary = run_challenge(_cfg(challenge_dir), log=lambda *a: None)
    assert summary["fruits"] == 2
    assert summary["failed"] == 0
    # result meshes written
    out = os.path.join(challenge_dir, "results", "test_run", "val")
    assert sorted(os.listdir(out)) == ["fruit_00.ply", "fruit_01.ply"]
    # on easy synthetic fruits the completion lands within ~1 cm Chamfer
    assert summary["CD[mm]"] < 12.0
    assert summary["iteration"] > 1


def test_run_challenge_deepsdf_baseline(challenge_dir):
    """The shape-only DeepSDF baseline path (`baseline_name: DeepSDF`)."""
    from hortimapping_tpu.pipeline.challenge import run_challenge

    cfg = _cfg(challenge_dir)
    cfg["baseline_name"] = "DeepSDF"
    cfg["run_name"] = "test_baseline"
    summary = run_challenge(cfg, log=lambda *a: None)
    assert summary["fruits"] == 2
    out = os.path.join(challenge_dir, "results", "test_baseline", "val")
    assert len(os.listdir(out)) == 2
    # shape-only fit on identity pose still lands in the right ballpark
    assert summary["CD[mm]"] < 25.0


def test_run_challenge_retrieval_init(challenge_dir):
    """`opt.tpu.init_mode: retrieval` routes through the warm-start scorer
    (per-fruit code + scale from the latent table) and completes end to end;
    multi_start widens the batch and still returns one result per fruit."""
    from hortimapping_tpu.pipeline.challenge import run_challenge

    cfg = _cfg(challenge_dir)
    cfg["run_name"] = "test_retrieval"
    cfg["opt"]["tpu"] = {"init_mode": "retrieval", "retrieval_top_k": 3,
                         "retrieval_score_pts": 64}
    summary = run_challenge(cfg, log=lambda *a: None)
    assert summary["fruits"] == 2
    assert summary["failed"] == 0
    assert summary["CD[mm]"] < 12.0
    assert len(summary["cd_per_fruit_mm"]) == 2

    cfg["run_name"] = "test_retrieval_ms"
    cfg["opt"]["tpu"]["multi_start"] = 2
    summary_ms = run_challenge(cfg, log=lambda *a: None)
    assert summary_ms["fruits"] == 2
    assert summary_ms["failed"] == 0
    assert summary_ms["CD[mm]"] < 12.0
