"""End-to-end joint shape+pose optimization on the synthetic category.

Ground truth is analytic (ellipsoid family), so completion and pose errors
are exact: starting from a perturbed pose and the mean (zero) code, the
fused LM loop must recover translation, scale, and the shape surface.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.workspace import config_decoder
from hortimapping_tpu.optim.lm import (
    shape_pose_joint_opt,
    shape_pose_joint_opt_batched,
    shape_opt_deepsdf,
)
from hortimapping_tpu.tools.synthetic import (
    SyntheticCategory,
    ellipsoid_radii,
    make_scene,
)

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)]

CFG = JointOptConfig(
    scale_on=True,
    lm_on=True,
    lm_eye=False,
    lm_lambda_0=0.1,
    s_damp=1e-3,
    recon_n_pts=300,
    n_fg_pix=64,
    n_bg_pix=64,
    n_frame=5,
    n_sample_on_ray=24,
    log_sdf_occ=True,
    occ_cutoff_m=0.01,
    occlusion_on=True,
    max_iter=30,
    robust_iter=5,
)
CUBE_RADIUS = 0.08


@pytest.fixture(scope="module")
def world():
    params, spec = config_decoder(ASSET_DIR)
    with np.load(os.path.join(ASSET_DIR, "native", "latest.npz")) as z:
        proj = z["synthetic.projection"]
        base_radius = float(z["synthetic.base_radius"])
    cat = SyntheticCategory(spec=spec, base_radius=base_radius)
    return params, spec, cat, proj


def _gt_pose(center, scale=1.0, yaw=0.0):
    """T_wo with uniform scale; returns (T_wo, T_ow)."""
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    T_wo = np.eye(4)
    T_wo[:3, :3] = R
    T_wo[:3, 3] = center
    return T_wo, np.linalg.inv(T_wo)


def _fruit(world, seed, center, scale=1.0):
    params, spec, cat, proj = world
    rng = np.random.default_rng(seed)
    code_gt = (rng.normal(size=spec.code_length) * 0.4).astype(np.float32)
    T_wo_gt, _ = _gt_pose(np.asarray(center), scale=scale, yaw=0.2)
    obs, full_surface = make_scene(
        cat, code_gt, T_wo_gt,
        n_frames=CFG.n_frame, n_fg=CFG.n_fg_pix, n_bg=CFG.n_bg_pix,
        n_points=CFG.recon_n_pts, seed=seed,
    )
    return code_gt, T_wo_gt, obs, full_surface


def _translation_error(T_ow, T_wo_gt):
    T_wo = np.linalg.inv(np.asarray(T_ow))
    return float(np.linalg.norm(T_wo[:3, 3] - T_wo_gt[:3, 3]))


def _scale_of(T_wo):
    return float(np.linalg.det(T_wo[:3, :3]) ** (1 / 3))


def test_joint_opt_recovers_pose_and_shape(world):
    params, spec, cat, proj = world
    center = np.array([0.4, 0.1, 0.2])
    code_gt, T_wo_gt, obs, _ = _fruit(world, 11, center, scale=1.1)

    # perturbed init: translation off by 1.5 cm, scale 1.0, no rotation
    T_wo_init, T_ow_init = _gt_pose(center + np.array([0.010, -0.008, 0.006]))
    latent0 = jnp.zeros(spec.code_length)

    init_terr = _translation_error(T_ow_init, T_wo_gt)
    res = shape_pose_joint_opt(
        params, spec, CFG, obs, latent0, jnp.asarray(T_ow_init, jnp.float32),
        CUBE_RADIUS, pose_known=False,
    )
    assert not bool(res.failed)
    iters = int(res.iter_count)
    assert 2 < iters <= CFG.max_iter

    terr = _translation_error(res.T_ow, T_wo_gt)
    assert terr < 0.5 * init_terr, f"translation {init_terr*1000:.1f} -> {terr*1000:.1f} mm"
    assert terr < 0.006, f"final translation error {terr*1000:.1f} mm"

    # recovered world-frame scale within ~10%
    s_est = _scale_of(np.linalg.inv(np.asarray(res.T_ow)))
    assert abs(s_est - 1.1) < 0.12, f"scale {s_est} vs 1.1"

    # completion quality: decoded sdf at GT surface points (object frame of
    # the ESTIMATE) should be near zero -> surface error in world units
    radii = np.asarray(ellipsoid_radii(jnp.asarray(code_gt), jnp.asarray(proj), cat.base_radius))
    dirs = np.random.default_rng(5).normal(size=(500, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    gt_surf_w = (dirs * radii) @ T_wo_gt[:3, :3].T + T_wo_gt[:3, 3]
    T_ow_est = np.asarray(res.T_ow)
    pts_o = gt_surf_w @ T_ow_est[:3, :3].T + T_ow_est[:3, 3]
    from hortimapping_tpu.models.decoder import decoder_sdf

    sdf = np.asarray(decoder_sdf(params, spec, res.latent, jnp.asarray(pts_o, jnp.float32)))
    s_obj = np.linalg.det(T_ow_est[:3, :3]) ** (1 / 3)
    world_err = np.abs(sdf) / s_obj
    assert world_err.mean() < 0.006, f"mean completion error {world_err.mean()*1000:.1f} mm"


def test_batched_matches_single(world):
    params, spec, cat, proj = world
    fruits = [
        _fruit(world, 21, [0.3, 0.0, 0.1], 1.0),
        _fruit(world, 22, [-0.2, 0.15, 0.3], 1.1),
        _fruit(world, 23, [0.0, -0.1, -0.25], 0.95),
    ]
    lat0, T0, obs_list = [], [], []
    for code_gt, T_wo_gt, obs, _ in fruits:
        center = T_wo_gt[:3, 3]
        _, T_ow_init = _gt_pose(center + np.array([0.008, 0.005, -0.006]))
        lat0.append(np.zeros(spec.code_length, np.float32))
        T0.append(T_ow_init.astype(np.float32))
        obs_list.append(obs)

    singles = [
        shape_pose_joint_opt(params, spec, CFG, obs_list[i], jnp.asarray(lat0[i]),
                             jnp.asarray(T0[i]), CUBE_RADIUS)
        for i in range(3)
    ]
    batched_obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    batched = shape_pose_joint_opt_batched(
        params, spec, CFG, batched_obs, jnp.asarray(np.stack(lat0)),
        jnp.asarray(np.stack(T0)), CUBE_RADIUS,
    )
    # Exact control flow parity (per-lane iteration counts). Values drift by
    # f32 reduction-order differences amplified over LM iterations, so assert
    # solver-quality parity rather than bitwise equality.
    for i in range(3):
        assert int(batched.iter_count[i]) == int(singles[i].iter_count)
        np.testing.assert_allclose(
            np.asarray(batched.latent[i]), np.asarray(singles[i].latent), atol=0.03
        )
        T_wo_gt = fruits[i][1]
        e_single = _translation_error(singles[i].T_ow, T_wo_gt)
        e_batched = _translation_error(batched.T_ow[i], T_wo_gt)
        assert abs(e_single - e_batched) < 2e-3, (e_single, e_batched)


def test_pose_polish_freezes_code_and_improves_pose(world):
    """Code-frozen pose polish (optim/lm.pose_polish_batched): the latent
    must come back bit-identical, iter_count bills main + polish, and on a
    truncated main solve (tight iteration cap leaves pose error on the
    table) the polished pose must not be worse."""
    import dataclasses

    from hortimapping_tpu.optim.lm import pose_polish_batched, solve_in_chunks

    params, spec, cat, proj = world
    fruits = [
        _fruit(world, 31, [0.25, 0.05, 0.1], 1.05),
        _fruit(world, 32, [-0.15, 0.1, 0.2], 1.0),
    ]
    lat0, T0, obs_list = [], [], []
    for code_gt, T_wo_gt, obs, _ in fruits:
        center = T_wo_gt[:3, 3]
        _, T_ow_init = _gt_pose(center + np.array([0.012, -0.007, 0.009]))
        lat0.append(np.zeros(spec.code_length, np.float32))
        T0.append(T_ow_init.astype(np.float32))
        obs_list.append(obs)
    obs_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    lat_b, T_b = jnp.asarray(np.stack(lat0)), jnp.asarray(np.stack(T0))

    cfg_trunc = dataclasses.replace(CFG, max_iter=4)
    main = shape_pose_joint_opt_batched(
        params, spec, cfg_trunc, obs_b, lat_b, T_b, CUBE_RADIUS)
    polished = pose_polish_batched(
        params, spec, dataclasses.replace(cfg_trunc, pose_polish_iters=5),
        obs_b, main, CUBE_RADIUS)

    np.testing.assert_array_equal(np.asarray(polished.latent),
                                  np.asarray(main.latent))
    assert not np.asarray(polished.failed).any()
    for i in range(2):
        extra = int(polished.iter_count[i]) - int(main.iter_count[i])
        assert 1 <= extra <= 5
        e_main = _translation_error(main.T_ow[i], fruits[i][1])
        e_pol = _translation_error(polished.T_ow[i], fruits[i][1])
        assert e_pol <= e_main + 1e-4, (e_main, e_pol)

    # config-routed: solve_in_chunks applies the polish when
    # pose_polish_iters > 0 (same result as calling it manually)
    routed = solve_in_chunks(
        params, spec, dataclasses.replace(cfg_trunc, pose_polish_iters=5),
        obs_b, lat_b, T_b, CUBE_RADIUS)
    np.testing.assert_allclose(np.asarray(routed.T_ow),
                               np.asarray(polished.T_ow), atol=1e-6)
    assert np.array_equal(np.asarray(routed.iter_count),
                          np.asarray(polished.iter_count))


def test_pose_known_keeps_se3_fixed(world):
    params, spec, cat, proj = world
    code_gt, T_wo_gt, obs, _ = _fruit(world, 31, [0.1, 0.2, 0.3], 1.0)
    T_ow0 = np.linalg.inv(T_wo_gt).astype(np.float32)
    res = shape_pose_joint_opt(
        params, spec, CFG, obs, jnp.zeros(spec.code_length), jnp.asarray(T_ow0),
        CUBE_RADIUS, pose_known=True,
    )
    T_est = np.asarray(res.T_ow)
    # rotation+translation unchanged up to the (free) scale factor
    s0 = np.linalg.det(T_ow0[:3, :3]) ** (1 / 3)
    s1 = np.linalg.det(T_est[:3, :3]) ** (1 / 3)
    np.testing.assert_allclose(T_est[:3, :3] / s1, T_ow0[:3, :3] / s0, atol=1e-4)


def test_shape_opt_deepsdf_fits_points(world):
    params, spec, cat, proj = world
    rng = np.random.default_rng(7)
    code_gt = (rng.normal(size=spec.code_length) * 0.4).astype(np.float32)
    radii = np.asarray(ellipsoid_radii(jnp.asarray(code_gt), jnp.asarray(proj), cat.base_radius))
    dirs = rng.normal(size=(300, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts_o = (dirs * radii).astype(np.float32)

    latent, iters = shape_opt_deepsdf(
        params, spec, CFG, jnp.asarray(pts_o), jnp.ones(300, bool),
        jnp.zeros(spec.code_length),
    )
    assert int(iters) > 1
    from hortimapping_tpu.models.decoder import decoder_sdf

    sdf = np.asarray(decoder_sdf(params, spec, latent, jnp.asarray(pts_o)))
    assert np.abs(sdf).mean() < 0.005, f"fit residual {np.abs(sdf).mean()*1000:.1f} mm"


def test_shape_opt_deepsdf_batched_matches_single(world):
    from hortimapping_tpu.optim.lm import shape_opt_deepsdf_batched

    params, spec, cat, proj = world
    rng = np.random.default_rng(11)
    pts, valid, lat0 = [], [], []
    for b in range(3):
        code_gt = (rng.normal(size=spec.code_length) * 0.4).astype(np.float32)
        radii = np.asarray(ellipsoid_radii(jnp.asarray(code_gt), jnp.asarray(proj), cat.base_radius))
        dirs = rng.normal(size=(200, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts.append((dirs * radii).astype(np.float32))
        v = np.ones(200, bool)
        v[150 + 10 * b:] = False  # differing valid counts across lanes
        valid.append(v)
        lat0.append(np.zeros(spec.code_length, np.float32))
    pts_b, valid_b, lat_b = map(jnp.asarray, (np.stack(pts), np.stack(valid), np.stack(lat0)))

    got_lat, got_it = shape_opt_deepsdf_batched(params, spec, CFG, pts_b, valid_b, lat_b)
    for b in range(3):
        want_lat, want_it = shape_opt_deepsdf(
            params, spec, CFG, pts_b[b], valid_b[b], lat_b[b]
        )
        assert int(got_it[b]) == int(want_it)
        np.testing.assert_allclose(
            np.asarray(got_lat[b]), np.asarray(want_lat), atol=1e-5
        )


def test_trust_region_recovers_pose_and_shape(world):
    """The adaptive-damping solver (non-parity mode) must reach the same
    optimum as the fixed-lambda reference path on the recovery fixture."""
    import dataclasses

    params, spec, cat, proj = world
    center = np.array([0.4, 0.1, 0.2])
    code_gt, T_wo_gt, obs, _ = _fruit(world, 11, center, scale=1.1)
    T_wo_init, T_ow_init = _gt_pose(center + np.array([0.010, -0.008, 0.006]))

    cfg_tr = dataclasses.replace(CFG, trust_region=True)
    res = shape_pose_joint_opt(
        params, spec, cfg_tr, obs, jnp.zeros(spec.code_length),
        jnp.asarray(T_ow_init, jnp.float32), CUBE_RADIUS, pose_known=False,
    )
    assert not bool(res.failed)
    terr = _translation_error(res.T_ow, T_wo_gt)
    assert terr < 0.006, f"final translation error {terr*1000:.1f} mm"
    s_est = _scale_of(np.linalg.inv(np.asarray(res.T_ow)))
    assert abs(s_est - 1.1) < 0.12, f"scale {s_est} vs 1.1"


def test_coarse_to_fine_recovers_pose_and_shape(world):
    """Two-resolution solve: same fixture, batched over 2 fruits; the final
    fine-phase result must match the single-phase quality bars."""
    import dataclasses

    from hortimapping_tpu.optim.lm import coarse_to_fine_joint_opt

    params, spec, cat, proj = world
    centers = [np.array([0.4, 0.1, 0.2]), np.array([-0.2, 0.05, 0.3])]
    fruits = [_fruit(world, 11 + k, c, scale=1.1) for k, c in enumerate(centers)]
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[f[2] for f in fruits])
    inits = [_gt_pose(c + np.array([0.010, -0.008, 0.006])) for c in centers]
    T0 = jnp.stack([jnp.asarray(T_ow, jnp.float32) for _, T_ow in inits])
    lat0 = jnp.zeros((2, spec.code_length))

    cfg = dataclasses.replace(CFG, coarse_to_fine=True, fine_max_iter=15)
    res = coarse_to_fine_joint_opt(params, spec, cfg, obs, lat0, T0, CUBE_RADIUS)
    assert not bool(np.any(np.asarray(res.failed)))
    # iter_count bills BOTH phases (coarse budget = max_iter, fine capped)
    assert int(np.max(np.asarray(res.iter_count))) <= CFG.max_iter + 15
    for k, (code_gt, T_wo_gt, _, _) in enumerate(fruits):
        terr = _translation_error(res.T_ow[k], T_wo_gt)
        assert terr < 0.006, f"fruit {k}: translation error {terr*1000:.1f} mm"
        s_est = _scale_of(np.linalg.inv(np.asarray(res.T_ow[k])))
        assert abs(s_est - 1.1) < 0.12, f"fruit {k}: scale {s_est} vs 1.1"


def test_coarse_to_fine_subsampled_fine_phase(world):
    """Fine-phase subsampling (`fine_ray_frac`/`fine_sample_frac`/
    `fine_pts_frac` < 1, the shipped wild bench schedule): the cheaper
    polish must hit the same quality bars as the full-resolution one, and
    default fracs (1.0) must leave the phase-B observation buffers
    untouched (regression for the _subsample refactor)."""
    import dataclasses

    from hortimapping_tpu.optim.lm import _subsample, coarse_to_fine_joint_opt

    params, spec, cat, proj = world
    center = np.array([0.4, 0.1, 0.2])
    code_gt, T_wo_gt, obs, _ = _fruit(world, 11, center, scale=1.1)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs)
    _, T_ow_init = _gt_pose(center + np.array([0.010, -0.008, 0.006]))
    lat0 = jnp.zeros((1, spec.code_length))
    T0 = jnp.asarray(T_ow_init, jnp.float32)[None]

    # identity at default fracs: stride 1 / frac 1.0 is a no-op slice
    sub_obs, sub_cfg = _subsample(obs_b, CFG, 1, 1.0, 1.0, 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(sub_obs),
                    jax.tree_util.tree_leaves(obs_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (sub_cfg.n_fg_pix, sub_cfg.n_sample_on_ray, sub_cfg.recon_n_pts) == (
        CFG.n_fg_pix, CFG.n_sample_on_ray, CFG.recon_n_pts)

    cfg = dataclasses.replace(
        CFG, coarse_to_fine=True, fine_max_iter=15,
        fine_ray_frac=0.6, fine_sample_frac=0.75, fine_pts_frac=0.6,
    )
    res = coarse_to_fine_joint_opt(params, spec, cfg, obs_b, lat0, T0, CUBE_RADIUS)
    assert not bool(np.asarray(res.failed)[0])
    terr = _translation_error(res.T_ow[0], T_wo_gt)
    assert terr < 0.006, f"translation error {terr*1000:.1f} mm"
    s_est = _scale_of(np.linalg.inv(np.asarray(res.T_ow[0])))
    assert abs(s_est - 1.1) < 0.12, f"scale {s_est} vs 1.1"


def test_robust_kernel_resists_outliers(world):
    """Contaminated observations: gross depth/point outliers must be damped
    by the Huber reweighting (optimizer.py:145-149,183-187) — including in
    the coarse-to-fine FINE phase (which restarts its iteration counter and
    therefore forces robust_iter=0, see coarse_to_fine_joint_opt)."""
    import dataclasses

    from hortimapping_tpu.optim.lm import coarse_to_fine_joint_opt

    params, spec, cat, proj = world
    center = np.array([0.4, 0.1, 0.2])
    code_gt, T_wo_gt, obs, _ = _fruit(world, 11, center, scale=1.1)

    # contaminate: 10% of fg depths pushed 0.3 m too far, 5% of surface
    # points offset 5 cm
    rng = np.random.default_rng(3)
    depth = np.asarray(obs.depth_obs).copy()
    fg = CFG.n_fg_pix
    bad_rays = rng.random(depth[:, :fg].shape) < 0.10
    depth[:, :fg] = np.where(bad_rays, depth[:, :fg] + 0.3, depth[:, :fg])
    pts = np.asarray(obs.points_w).copy()
    bad_pts = rng.random(pts.shape[0]) < 0.05
    pts[bad_pts] += rng.normal(size=(bad_pts.sum(), 3)) * 0.05
    obs_bad = obs._replace(depth_obs=jnp.asarray(depth), points_w=jnp.asarray(pts))

    T_wo_init, T_ow_init = _gt_pose(center + np.array([0.010, -0.008, 0.006]))
    lat0 = jnp.zeros(spec.code_length)

    cfg_rob = dataclasses.replace(CFG, robust_iter=2)
    res = shape_pose_joint_opt(
        params, spec, cfg_rob, obs_bad, lat0,
        jnp.asarray(T_ow_init, jnp.float32), CUBE_RADIUS, False)
    terr_rob = _translation_error(res.T_ow, T_wo_gt)

    cfg_norob = dataclasses.replace(CFG, robust_iter=CFG.max_iter)  # Huber off
    res_n = shape_pose_joint_opt(
        params, spec, cfg_norob, obs_bad, lat0,
        jnp.asarray(T_ow_init, jnp.float32), CUBE_RADIUS, False)
    terr_norob = _translation_error(res_n.T_ow, T_wo_gt)

    assert terr_rob < 0.008, f"robust solve drifted {terr_rob*1000:.1f} mm"
    assert terr_rob <= terr_norob + 1e-4, (
        f"robust {terr_rob*1000:.2f} mm vs non-robust {terr_norob*1000:.2f} mm")

    # c2f on contaminated data: the fine phase must stay robust
    cfg_c2f = dataclasses.replace(CFG, robust_iter=2, coarse_to_fine=True,
                                  fine_max_iter=4)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs_bad)
    res_c = coarse_to_fine_joint_opt(
        params, spec, cfg_c2f, obs_b, lat0[None],
        jnp.asarray(T_ow_init, jnp.float32)[None], CUBE_RADIUS)
    terr_c2f = _translation_error(res_c.T_ow[0], T_wo_gt)
    assert terr_c2f < 0.008, f"c2f robust solve drifted {terr_c2f*1000:.1f} mm"


def test_coarse_s_damp_anneals_scale_damping():
    """opt.tpu.coarse_s_damp anchors the scale tangent ONLY in the c2f
    coarse phase: the coarse cfg gets the override, the fine phase keeps
    the reference-level s_damp (annealed scale damping for warm starts)."""
    import dataclasses

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.optim.lm import subsample_observations
    from hortimapping_tpu.optim.state import FruitObservations

    cfg = JointOptConfig.from_dict(
        {"opt": {"tpu": {"coarse_s_damp": 0.3}, "lm": {"s_damp": 1e-3}}})
    assert cfg.coarse_s_damp == 0.3 and cfg.s_damp == 1e-3

    F, R, P = cfg.n_frame, cfg.n_fg_pix + cfg.n_bg_pix, cfg.recon_n_pts
    obs = FruitObservations(
        T_wc=jnp.tile(jnp.eye(4)[None], (F, 1, 1)),
        rays=jnp.zeros((F, R, 3)), ray_valid=jnp.ones((F, R), bool),
        depth_obs=jnp.zeros((F, R)), frame_valid=jnp.ones((F,), bool),
        points_w=jnp.zeros((P, 3)), point_valid=jnp.ones((P,), bool))
    _, coarse_cfg = subsample_observations(obs, cfg)
    assert coarse_cfg.s_damp == 0.3           # anchored while basin is chosen
    # fine phase inherits cfg directly (coarse_to_fine_joint_opt) -> 1e-3
    assert cfg.s_damp == 1e-3
    # 0 = inherit
    _, c2 = subsample_observations(obs, dataclasses.replace(
        cfg, coarse_s_damp=0.0))
    assert c2.s_damp == 1e-3
