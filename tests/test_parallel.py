"""Multi-device fruit-parallel execution (8 virtual CPU devices, conftest)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.workspace import config_decoder
from hortimapping_tpu.optim.lm import shape_pose_joint_opt_batched
from hortimapping_tpu.parallel import fruit_mesh, pad_to_multiple, shard_joint_opt
from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]


# shapes must clear the reference's hard min of 100 in-radius samples per
# frame (`loss.py:43-45`): 32 fg rays x 16 samples comfortably does
CFG = JointOptConfig(
    n_fg_pix=32,
    n_bg_pix=32,
    n_frame=2,
    n_sample_on_ray=16,
    recon_n_pts=64,
    max_iter=3,
    lm_lambda_0=0.5,
)


def _world():
    """Trained small decoder (a random-init decoder has an arbitrary zero
    level set, so scenes can land outside the |sdf|<cutoff band)."""
    params, spec = config_decoder(ASSET_DIR)
    return params, spec


def _batch(spec, n_fruits, seed=0):
    cat = SyntheticCategory(spec=spec)
    rng = np.random.default_rng(seed)
    obs_list, lat_list, T_list = [], [], []
    for b in range(n_fruits):
        code = rng.normal(size=spec.code_length).astype(np.float32) * 0.3
        T_wo = np.eye(4, dtype=np.float32)
        T_wo[:3, 3] = rng.normal(size=3) * 0.05
        obs, _ = make_scene(
            cat, code, T_wo, n_frames=CFG.n_frame, n_fg=CFG.n_fg_pix,
            n_bg=CFG.n_bg_pix, n_points=CFG.recon_n_pts, seed=seed + b,
        )
        obs_list.append(obs)
        lat_list.append(np.zeros(spec.code_length, np.float32))
        T_list.append(np.linalg.inv(T_wo))
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    return obs, jnp.stack(lat_list), jnp.stack(T_list)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = fruit_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple(small_spec):
    obs, lat, T = _batch(small_spec, 3)  # padding logic is params-free
    obs_p, lat_p, T_p, B = pad_to_multiple(obs, lat, T, 8)
    assert B == 3
    assert lat_p.shape[0] == 8 and obs_p.rays.shape[0] == 8
    assert not bool(jnp.any(obs_p.frame_valid[3:]))
    assert not bool(jnp.any(obs_p.point_valid[3:]))
    # already-aligned batch is untouched
    obs_p2, lat_p2, _, B2 = pad_to_multiple(obs, lat, T, 3)
    assert B2 == 3 and lat_p2.shape[0] == 3


def test_shard_matches_single_device():
    """Sharded result == vmapped single-device result, lane for lane."""
    params, spec = _world()
    obs, lat, T = _batch(spec, 8)

    ref = shape_pose_joint_opt_batched(params, spec, CFG, obs, lat, T, cube_radius=0.1)
    res = shard_joint_opt(
        params, spec, CFG, obs, lat, T, cube_radius=0.1, mesh=fruit_mesh()
    )
    # f32: the sharded and replicated programs compile to different fusions,
    # so bitwise equality is not expected — only tight numerical agreement
    np.testing.assert_allclose(np.asarray(res.latent), np.asarray(ref.latent), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.T_ow), np.asarray(ref.T_ow), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.iter_count), np.asarray(ref.iter_count))


def test_shard_with_padding():
    """A non-multiple batch pads, runs, and slices back to B lanes."""
    params, spec = _world()
    obs, lat, T = _batch(spec, 5)
    res = shard_joint_opt(
        params, spec, CFG, obs, lat, T, cube_radius=0.1, mesh=fruit_mesh()
    )
    assert res.latent.shape == (5, spec.code_length)
    assert res.T_ow.shape == (5, 4, 4)
    assert not bool(jnp.any(res.failed))


def test_staged_matches_single_stage():
    """Staged solve: identical per-lane results for lanes that converge in
    stage 1, identical continuation math for the rest."""
    from hortimapping_tpu.optim.lm import staged_joint_opt

    params, spec = _world()
    obs, lat, T = _batch(spec, 6)
    cfg = JointOptConfig(
        n_fg_pix=32, n_bg_pix=32, n_frame=2, n_sample_on_ray=16,
        recon_n_pts=64, max_iter=8, lm_lambda_0=0.5,
    )
    ref = shape_pose_joint_opt_batched(params, spec, cfg, obs, lat, T, cube_radius=0.1)
    res = staged_joint_opt(params, spec, cfg, obs, lat, T, cube_radius=0.1,
                           stage1_iters=4)
    np.testing.assert_allclose(np.asarray(res.latent), np.asarray(ref.latent), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.T_ow), np.asarray(ref.T_ow), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.failed), np.asarray(ref.failed))
    # iteration counts match (modulo knife-edge convergence flips, none here)
    np.testing.assert_array_equal(np.asarray(res.iter_count), np.asarray(ref.iter_count))


def test_solve_in_chunks_matches_unchunked():
    from hortimapping_tpu.optim.lm import solve_in_chunks

    params, spec = _world()
    obs, lat, T = _batch(spec, 7)
    ref = shape_pose_joint_opt_batched(params, spec, CFG, obs, lat, T, cube_radius=0.1)
    res = solve_in_chunks(params, spec, CFG, obs, lat, T, cube_radius=0.1, max_batch=3)
    np.testing.assert_allclose(np.asarray(res.latent), np.asarray(ref.latent), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.iter_count), np.asarray(ref.iter_count))
    assert res.latent.shape[0] == 7


def test_shard_coarse_to_fine_matches_single_device():
    """The two-resolution solver sharded over the fruit mesh equals the
    unsharded batched result (both phases are per-lane local math, so the
    sharded program stays collective-free)."""
    import dataclasses

    from hortimapping_tpu.optim.lm import coarse_to_fine_joint_opt

    params, spec = _world()
    obs, lat, T = _batch(spec, 8)
    cfg = dataclasses.replace(CFG, coarse_to_fine=True, fine_max_iter=2,
                              coarse_frame_stride=2,
                              # shipped subsampled-polish schedule shape
                              fine_ray_frac=0.6, fine_sample_frac=0.75,
                              fine_pts_frac=0.6)

    ref = coarse_to_fine_joint_opt(params, spec, cfg, obs, lat, T, cube_radius=0.1)
    res = shard_joint_opt(
        params, spec, cfg, obs, lat, T, cube_radius=0.1, mesh=fruit_mesh()
    )
    np.testing.assert_allclose(np.asarray(res.latent), np.asarray(ref.latent), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.T_ow), np.asarray(ref.T_ow), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.iter_count), np.asarray(ref.iter_count))


def test_init_multi_host_passthrough(monkeypatch):
    """init_multi_host must hand the coordinator/process args to
    jax.distributed.initialize verbatim and return the global fruit mesh —
    unexercisable on real hardware here (one host), so the wrapper contract
    is pinned with a recording stub instead of shipping on trust."""
    from hortimapping_tpu.parallel import sharding as sh

    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.update(coordinator_address=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    mesh = sh.init_multi_host("10.0.0.1:1234", 4, 2)
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}
    assert mesh.axis_names == ("fruit",)
    assert mesh.devices.size == len(jax.devices())


@pytest.mark.slow
def test_multihost_smoke_two_processes():
    """Genuine two-process `jax.distributed` coordination (VERDICT r4 M3):
    spawns tools/multihost_smoke.py, which boots a coordinator + 2 worker
    processes (2 CPU devices each), builds the global 4-device fruit mesh via
    `init_multi_host`, runs one sharded joint solve step, and gathers the
    per-lane flags across processes."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert proc.stdout.count("MULTIHOST_SMOKE_OK") == 2, proc.stdout[-4000:]
