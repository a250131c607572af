"""Aux subsystems: config dicts, seeding, timers, text sprites, KITTI utils."""

import json
import os

import numpy as np
import pytest

from hortimapping_tpu.config import ForceKeyErrorDict, JointOptConfig, get_configs
from hortimapping_tpu.utils.misc import Timer, get_time, set_random_seed
from hortimapping_tpu.vis import StubVisualizer, color_table, make_visualizer, text_3d


def test_force_key_error_dict():
    d = ForceKeyErrorDict({"a": 1})
    assert d.a == 1
    with pytest.raises(KeyError):
        d["missing"]
    with pytest.raises(AttributeError):
        d.missing


def test_get_configs_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"opt": {"lr": 0.1}, "name": "x"}))
    cfg = get_configs(str(p))
    assert cfg.opt.lr == 0.1
    assert cfg["name"] == "x"


def test_joint_opt_config_from_reference_yaml():
    import yaml

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ["wild_pepper", "cka_pepper", "lab_pepper", "lab_berry",
                 "shape_completion_challenge_pepper"]:
        with open(os.path.join(root, name + ".yaml")) as f:
            cfg = yaml.safe_load(f)
        oc = JointOptConfig.from_dict(cfg)
        assert oc.max_iter in (20, 50)
        assert oc.n_rays == cfg["opt"]["render"]["n_fg_pix"] + cfg["opt"]["render"]["n_bg_pix"]
        assert oc.w_depth == float(cfg["opt"]["weight"]["w_depth"])
    # wild pepper specifics (reference values)
    with open(os.path.join(root, "wild_pepper.yaml")) as f:
        wc = JointOptConfig.from_dict(yaml.safe_load(f))
    assert wc.scale_on and wc.pose_dim == 7
    assert wc.lm_lambda_0 == 0.1 and wc.robust_iter == 5


def test_seeding_reproducible():
    set_random_seed(42)
    a = np.random.rand(5)
    set_random_seed(42)
    b = np.random.rand(5)
    np.testing.assert_array_equal(a, b)


def test_timer():
    t = Timer()
    t.start("phase1")
    dt = t.stop()
    assert dt >= 0 and "phase1" in t.summary()
    assert get_time() > 0


def test_stub_visualizer_interface():
    vis = make_visualizer(False)
    assert isinstance(vis, StubVisualizer)
    vis.add_scan(None)
    vis.update_mesh_pose(None, np.eye(4), 0)
    assert vis.stop() is False
    assert len(color_table) == 10


def test_text_3d_sprite():
    pcd = text_3d("42", pos=[0.1, 0.2, 0.3])
    assert len(pcd) > 10
    # sprite sits near the anchor position
    assert np.linalg.norm(np.mean(pcd.points, axis=0) - [0.1, 0.2, 0.3]) < 0.1


def test_kitti_helpers(tmp_path):
    from hortimapping_tpu.data.kitti import read_calib_file, read_velodyne_bin

    calib = tmp_path / "calib.txt"
    calib.write_text("P0: " + " ".join(["1.0"] * 12) + "\nTr: " + " ".join(["2.0"] * 12) + "\n")
    c = read_calib_file(str(calib))
    assert c["P0"].shape == (3, 4) and c["Tr"][0, 0] == 2.0

    scan = np.arange(16, dtype=np.float32)
    binf = tmp_path / "scan.bin"
    scan.tofile(str(binf))
    pcd = read_velodyne_bin(str(binf))
    assert pcd.points.shape == (4, 3)


def test_wild_manifest_roundtrip(tmp_path):
    """FruitResult manifest entries merge across runs (resume support)."""
    from hortimapping_tpu.pipeline.wild import FruitResult

    r = FruitResult("00002_Sweetpepper.ply", 2, np.eye(4), np.zeros(8), 12, True)
    entry = {"name": r.name, "submap_id": r.submap_id, "valid": r.valid,
             "reason": r.reason, "iter_count": r.iter_count}
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps([entry]))
    loaded = json.loads(p.read_text())
    assert loaded[0]["valid"] and loaded[0]["iter_count"] == 12


def test_tpu_solver_yaml_block_parses():
    """The opt.tpu extension block of the shipped TPU config routes every
    solver knob into JointOptConfig (guards the YAML plumbing for the
    two-resolution schedule)."""
    import os

    from hortimapping_tpu.config import JointOptConfig, load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(root, "wild_pepper_tpu.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.coarse_to_fine is True
    assert oc.coarse_frame_stride == 4
    assert oc.coarse_ray_frac == 0.3
    assert oc.coarse_sample_frac == 0.35
    assert oc.coarse_pts_frac == 0.3
    assert oc.coarse_max_iter == 8
    assert oc.coarse_fused_tr == 64
    assert oc.fine_max_iter == 2
    assert oc.fine_ray_frac == 0.6
    assert oc.fine_sample_frac == 0.75
    assert oc.fine_pts_frac == 0.6
    # round 4: wild joins lab/greenhouse on UNIT-scale retrieval scoring
    # (3-scale grid never better on 4 held-out seed sets, ~1.5 ms/fruit
    # cheaper — docs/PERF.md "unit-scale retrieval on wild")
    assert oc.init_mode == "retrieval"
    assert oc.retrieval_n_scales == 1
    assert oc.retrieval_scale_min == 1.0 and oc.retrieval_scale_max == 1.0
    # everything outside opt.tpu stays byte-identical with the parity config
    base = load_config(os.path.join(root, "wild_pepper.yaml"))
    tpu_opt = dict(cfg["opt"])
    tpu_opt.pop("tpu")
    assert tpu_opt == base["opt"]


def test_noisyinit_yaml_pose_prior_block_parses():
    """The imperfect-pose-init wild config (pose-prior mode, docs/PERF.md
    round-5 pose-noise study) routes its damped-tangent knobs into
    JointOptConfig, with opt.tpu.s_damp taking precedence over opt.lm.s_damp,
    and differs from the trusted-init TPU config ONLY in those knobs."""
    import os

    from hortimapping_tpu.config import JointOptConfig, load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(root, "wild_pepper_tpu_noisyinit.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.rot_damp == 1.0
    assert oc.coarse_s_damp == 0.1
    assert oc.s_damp == 0.01          # opt.tpu override beats opt.lm's 1e-3
    assert oc.yaw_damp == 0.0         # rot_damp subsumes the yaw-only probe
    # the rest of the solver stays the shipped retrieval+c2f schedule
    base = JointOptConfig.from_dict(
        load_config(os.path.join(root, "wild_pepper_tpu.yaml")))
    import dataclasses
    diffs = {f.name for f in dataclasses.fields(JointOptConfig)
             if getattr(oc, f.name) != getattr(base, f.name)}
    assert diffs == {"rot_damp", "coarse_s_damp", "s_damp"}


def test_tpu_challenge_yaml_block_parses():
    """The shipped TPU challenge config's opt.tpu block (retrieval init +
    trust-region) routes into JointOptConfig, and everything outside the
    block stays byte-identical with the reference-schema config."""
    import os

    from hortimapping_tpu.config import JointOptConfig, load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(root, "shape_completion_challenge_pepper_tpu.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.init_mode == "retrieval"
    assert oc.retrieval_top_k == 8
    assert oc.trust_region is True
    assert oc.multi_start == 1
    base = load_config(os.path.join(root, "shape_completion_challenge_pepper.yaml"))
    tpu_opt = dict(cfg["opt"])
    tpu_opt.pop("tpu")
    assert tpu_opt == base["opt"]


def test_tpu_family_yaml_blocks_parse():
    """The lab + greenhouse TPU configs' opt.tpu blocks (retrieval warm
    start; unit-scale scoring on the SE(3) lab workload) route into
    JointOptConfig, and everything outside the block stays byte-identical
    with the reference-schema configs."""
    import os

    from hortimapping_tpu.config import JointOptConfig, load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")

    cfg = load_config(os.path.join(root, "lab_pepper_tpu.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.init_mode == "retrieval"
    assert oc.retrieval_n_scales == 1
    assert oc.retrieval_scale_min == 1.0 and oc.retrieval_scale_max == 1.0
    assert oc.scale_on is False
    base = load_config(os.path.join(root, "lab_pepper.yaml"))
    tpu_opt = dict(cfg["opt"])
    tpu_opt.pop("tpu")
    assert tpu_opt == base["opt"]

    # multi-frame greenhouse: retrieval at UNIT scale too (round 4: the
    # (code, scale) grid traded pose away vs the genuine reference —
    # trans +2.2 sem / rot +3.1 sem at N=25 — for no CD gain; docs/PERF.md)
    cfg = load_config(os.path.join(root, "cka_pepper_tpu.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.init_mode == "retrieval"
    assert oc.retrieval_n_scales == 1
    assert oc.retrieval_scale_min == 1.0 and oc.retrieval_scale_max == 1.0
    assert oc.scale_on is True
    # round 5: damped rotation tangents + selective multi-start rescue
    # (held-out N=45 fresh-seed h2h: rot 0.02 vs 43 deg, CD/trans parity)
    assert oc.rot_damp == 0.3
    assert oc.rescue_starts == 4
    base = load_config(os.path.join(root, "cka_pepper.yaml"))
    tpu_opt = dict(cfg["opt"])
    tpu_opt.pop("tpu")
    assert tpu_opt == base["opt"]

    # single-frame greenhouse: retrieval at UNIT scale (one view cannot
    # disambiguate scale — the scale grid misfired there, docs/PERF.md)
    cfg = load_config(os.path.join(root, "cka_pepper_single_tpu.yaml"))
    oc = JointOptConfig.from_dict(cfg)
    assert oc.init_mode == "retrieval"
    assert oc.retrieval_n_scales == 1
    assert oc.retrieval_scale_min == 1.0 and oc.retrieval_scale_max == 1.0
    assert oc.scale_on is True  # the SOLVER still optimizes scale
    tpu_opt = dict(cfg["opt"])
    tpu_opt.pop("tpu")
    assert tpu_opt == base["opt"]
