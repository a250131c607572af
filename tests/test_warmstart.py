"""Retrieval init + multi-start selection (hortimapping_tpu/optim/warmstart.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.workspace import config_decoder
from hortimapping_tpu.optim.lm import shape_pose_joint_opt_batched
from hortimapping_tpu.optim.warmstart import (
    multi_start_joint_opt,
    objective_value_batched,
    retrieval_init_batched,
)
from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_small_8")
PEPPER_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "synthetic_pepper_32")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="synthetic assets not built"
)

CFG = JointOptConfig(
    n_fg_pix=32, n_bg_pix=32, n_frame=2, n_sample_on_ray=16,
    recon_n_pts=64, max_iter=3, lm_lambda_0=0.5,
)


def _table_and_fruits(spec, n_table=24, n_fruits=3, seed=3):
    """Latent table containing each fruit's GT code + observations."""
    rng = np.random.default_rng(seed)
    table = (rng.normal(size=(n_table, spec.code_length)) * 0.5).astype(np.float32)
    cat = SyntheticCategory(spec=spec)
    obs_list, gt_rows = [], []
    for b in range(n_fruits):
        row = 2 + 7 * b
        obs, _ = make_scene(
            cat, table[row], np.eye(4, dtype=np.float32),
            n_frames=CFG.n_frame, n_fg=CFG.n_fg_pix, n_bg=CFG.n_bg_pix,
            n_points=CFG.recon_n_pts, seed=seed + b,
        )
        obs_list.append(obs)
        gt_rows.append(row)
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    return jnp.asarray(table), obs, gt_rows


def test_retrieval_picks_generating_code_flagship():
    """On the flagship decoder (whose SDF fidelity is well below the shape
    spacing of its latent table), retrieval must rank each fruit's generating
    table code FIRST. The 8-wide test decoder cannot discriminate (its own
    ~5 mm SDF error exceeds the radii spread), so this runs on pepper_32."""
    params, spec = config_decoder(PEPPER_DIR)
    from hortimapping_tpu.models.workspace import load_latent_vectors

    table = load_latent_vectors(PEPPER_DIR)
    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    rows = [17, 103, 240]
    obs_list = []
    for b, row in enumerate(rows):
        obs, _ = make_scene(
            cat, np.asarray(table[row]), np.eye(4, dtype=np.float32),
            n_frames=2, n_fg=64, n_bg=32, n_points=128, seed=3 + b,
        )
        obs_list.append(obs)
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)

    lat0, T0, top_codes, top_T = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=4, n_score_pts=128,
    )
    assert lat0.shape == (3, spec.code_length)
    assert T0.shape == (3, 4, 4)
    assert top_codes.shape == (3, 4, spec.code_length)
    # (code, scale) pairs are degenerate — a code with radii c*r_gt at scale
    # sigma*c IS the GT surface — so assert the induced world-frame surface
    # radii(lat0)/sigma, not code identity
    from hortimapping_tpu.tools.synthetic import ellipsoid_radii

    proj = jnp.asarray(cat.projection())
    for b, row in enumerate(rows):
        r_gt = np.asarray(ellipsoid_radii(table[row], proj, cat.base_radius))
        sigma = float(T0[b, 0, 0])
        r_got = np.asarray(ellipsoid_radii(lat0[b], proj, cat.base_radius)) / sigma
        err = np.abs(r_got - r_gt).max()
        assert err < 0.003, f"fruit {b}: surface radii err {err*1e3:.2f} mm"


def test_retrieval_scale_candidates():
    """A fruit 1.2x canonical size must score best with its own code at
    sigma ~= 1/1.2 (flagship decoder: scale discrimination needs SDF
    fidelity well under the scale step)."""
    params, spec = config_decoder(PEPPER_DIR)
    from hortimapping_tpu.models.workspace import load_latent_vectors

    table = load_latent_vectors(PEPPER_DIR)
    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    T_wo = np.diag([1.2, 1.2, 1.2, 1.0]).astype(np.float32)
    obs, _ = make_scene(cat, np.asarray(table[31]), T_wo, n_frames=2,
                        n_fg=64, n_bg=32, n_points=128, seed=7)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs)

    lat0, T0, _, _ = retrieval_init_batched(
        params, spec, table, obs_b.points_w, obs_b.point_valid,
        top_k=4, n_score_pts=128, n_scales=11, scale_min=0.7, scale_max=1.3,
    )
    # the world-frame surface the start encodes — radii(code)/sigma — must
    # match the 1.2x-scaled GT surface (code<->scale degeneracy as above)
    from hortimapping_tpu.tools.synthetic import ellipsoid_radii

    proj = jnp.asarray(cat.projection())
    sigma = float(T0[0, 0, 0])
    r_gt = 1.2 * np.asarray(ellipsoid_radii(table[31], proj, cat.base_radius))
    r_got = np.asarray(ellipsoid_radii(lat0[0], proj, cat.base_radius)) / sigma
    err = np.abs(r_got - r_gt).max()
    assert sigma < 0.95, f"scale candidate not used (sigma {sigma:.3f})"
    assert err < 0.003, f"surface radii err {err*1e3:.2f} mm (sigma {sigma:.3f})"


def test_retrieval_chunked_matches_full_vmap():
    """B > score_chunk serializes the scoring in lax.map blocks (the
    full-batch vmap OOMs HBM at B=64 — a [B,S,N*P,512] bf16 activation);
    the chunked path must be numerically identical, including the padded
    remainder block."""
    params, spec = config_decoder(ASSET_DIR)
    table, obs3, _ = _table_and_fruits(spec, n_fruits=3)
    # 7 fruits with chunk 3 -> 3 blocks, last one padded (7 = 2*3 + 1)
    pts = jnp.concatenate([obs3.points_w] * 3, axis=0)[:7]
    pv = jnp.concatenate([obs3.point_valid] * 3, axis=0)[:7]
    want = retrieval_init_batched(
        params, spec, table, pts, pv, top_k=4, n_score_pts=64,
        score_chunk=16)  # 7 <= 16: plain vmap
    got = retrieval_init_batched(
        params, spec, table, pts, pv, top_k=4, n_score_pts=64,
        score_chunk=3)   # serialized blocks + padded remainder
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_large_table_code_blocking_matches_single_matmul():
    """A freshly TRAINED latent table can be 512+ codes — the full
    (code x scale) scoring grid then materializes a [B,S,N*P,hidden]
    activation past the 16 GB HBM (f32[12,5,131072,512] = 15 GB, measured
    OOM on the round-4 trainer gate). _score_codes blocks the code axis and
    the scale vmap serializes; both must be numerically identical to the
    single-matmul fast path, including the padded remainder block."""
    from hortimapping_tpu.optim.warmstart import _score_codes

    params, spec = config_decoder(ASSET_DIR)
    rng = np.random.default_rng(9)
    codes = jnp.asarray(rng.normal(size=(300, spec.code_length)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(256, 3)) * 0.05, jnp.float32)
    valid = jnp.asarray(rng.random(256) < 0.9)
    # 300 * 256 = 76800 > 2^15: blocked (2 full blocks + padded remainder)
    got = _score_codes(params, spec, codes, pts, valid)
    want = _score_codes(params, spec, codes, pts, valid, block_elems=1 << 30)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # end to end: blocked + scale-serialized retrieval over the large table
    # returns exactly the argmin of the UNBLOCKED (scale x code) score grid
    table, obs, _ = _table_and_fruits(spec, n_table=24, n_fruits=2)
    big = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(276, spec.code_length)) * 0.5,
                     jnp.float32), table])  # 300 codes: 300*256 > 2^15
    lat, _, _, _ = retrieval_init_batched(
        params, spec, big, obs.points_w, obs.point_valid, n_score_pts=256)
    scales = jnp.linspace(0.85, 1.2, 5)
    for b in range(2):
        sub = obs.points_w[b, :256]
        sub_v = obs.point_valid[b, :256]
        grid = jnp.stack([
            _score_codes(params, spec, big, sig * sub, sub_v,
                         block_elems=1 << 30)
            for sig in scales
        ])                                               # [S, N] unblocked
        best = int(jnp.argmin(jnp.min(grid, axis=0)))
        np.testing.assert_array_equal(np.asarray(lat[b]),
                                      np.asarray(big[best]))


def test_multi_start_picks_lowest_objective():
    """multi_start must return, per fruit, exactly the per-start solve whose
    final LM objective is lowest."""
    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    _, _, top_codes, top_T = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=3, n_score_pts=64,
    )

    got = multi_start_joint_opt(
        params, spec, CFG, obs, top_codes, top_T, cube_radius=0.1
    )

    B, K = 2, 3
    want_per_start = []
    for k in range(K):
        res_k = shape_pose_joint_opt_batched(
            params, spec, CFG, obs, top_codes[:, k], top_T[:, k], 0.1
        )
        cost_k = objective_value_batched(
            params, spec, CFG, obs, res_k.latent, res_k.T_ow, 0.1
        )
        want_per_start.append((res_k, np.asarray(cost_k)))
    for b in range(B):
        costs = np.array([want_per_start[k][1][b] for k in range(K)])
        kbest = int(np.argmin(costs))
        np.testing.assert_allclose(
            np.asarray(got.latent[b]),
            np.asarray(want_per_start[kbest][0].latent[b]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.T_ow[b]),
            np.asarray(want_per_start[kbest][0].T_ow[b]), atol=1e-5,
        )


def test_warmstart_solve_dispatch():
    """The shared pipeline entry (warmstart_solve) must honor the three
    config modes: mean init -> plain solve, retrieval -> single-start from
    the retrieved (code, scale), retrieval + multi_start -> lowest-objective
    multi-start pick. Every posed pipeline routes through this one function,
    so a knob silently ignored here would be ignored everywhere."""
    import dataclasses

    from hortimapping_tpu.optim.warmstart import warmstart_solve

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    B = 2
    lat0 = jnp.tile(jnp.mean(table, axis=0)[None], (B, 1))
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))

    # mean init == plain batched solve
    got_mean = warmstart_solve(params, spec, CFG, table, obs, lat0, T0, 0.1)
    want_mean = shape_pose_joint_opt_batched(params, spec, CFG, obs, lat0, T0, 0.1)
    np.testing.assert_allclose(np.asarray(got_mean.latent),
                               np.asarray(want_mean.latent), atol=1e-5)

    # retrieval == solve from the retrieved single start
    cfg_r = dataclasses.replace(CFG, init_mode="retrieval", retrieval_top_k=3,
                                retrieval_score_pts=64)
    got_r = warmstart_solve(params, spec, cfg_r, table, obs, lat0, T0, 0.1)
    lat_r, T_r, top_codes, top_T = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=3, n_score_pts=64,
        scale_min=cfg_r.retrieval_scale_min, scale_max=cfg_r.retrieval_scale_max,
        n_scales=cfg_r.retrieval_n_scales, T_init=T0,
    )
    want_r = shape_pose_joint_opt_batched(params, spec, cfg_r, obs, lat_r, T_r, 0.1)
    np.testing.assert_allclose(np.asarray(got_r.latent),
                               np.asarray(want_r.latent), atol=1e-5)

    # retrieval + multi_start == multi_start_joint_opt over the top-K
    cfg_ms = dataclasses.replace(cfg_r, multi_start=3)
    got_ms = warmstart_solve(params, spec, cfg_ms, table, obs, lat0, T0, 0.1)
    want_ms = multi_start_joint_opt(params, spec, cfg_ms, obs,
                                    top_codes, top_T, 0.1)
    np.testing.assert_allclose(np.asarray(got_ms.latent),
                               np.asarray(want_ms.latent), atol=1e-5)


def test_objective_finite_and_ranks_gt_lowest():
    params, spec = config_decoder(ASSET_DIR)
    table, obs, gt_rows = _table_and_fruits(spec, n_fruits=2)
    B = 2
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
    gt_lat = jnp.stack([table[r] for r in gt_rows])
    rand_lat = gt_lat + 1.0
    c_gt = np.asarray(objective_value_batched(
        params, spec, CFG, obs, gt_lat, eye, 0.1))
    c_rand = np.asarray(objective_value_batched(
        params, spec, CFG, obs, rand_lat, eye, 0.1))
    assert np.all(np.isfinite(c_gt))
    assert np.all(c_gt < c_rand)


def test_retrieval_joint_opt_matches_two_step():
    """The fused retrieval+solve program must equal retrieval_init_batched
    followed by the batched solver (same math, one dispatch)."""
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))

    lat_r, T_r, _, _ = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=4, n_score_pts=64, T_init=T0,
    )
    want = shape_pose_joint_opt_batched(params, spec, CFG, obs, lat_r, T_r, 0.1)
    got = retrieval_joint_opt(params, spec, CFG, table, obs, T0, 0.1,
                              top_k=4, n_score_pts=64)
    np.testing.assert_allclose(np.asarray(got.latent), np.asarray(want.latent),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.T_ow), np.asarray(want.T_ow),
                               atol=1e-5)


def test_retrieval_bf16_scoring_ranks_like_f32():
    """bf16 scoring is rank-only: on the flagship decoder it must retrieve
    the same best code as f32 scoring."""
    params, spec = config_decoder(PEPPER_DIR)
    from hortimapping_tpu.models.workspace import load_latent_vectors

    table = load_latent_vectors(PEPPER_DIR)
    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    obs, _ = make_scene(cat, np.asarray(table[17]), np.eye(4, dtype=np.float32),
                        n_frames=2, n_fg=64, n_bg=32, n_points=128, seed=3)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs)
    lat_f32, T_f32, _, _ = retrieval_init_batched(
        params, spec, table, obs_b.points_w, obs_b.point_valid,
        top_k=4, n_score_pts=128)
    lat_bf16, T_bf16, _, _ = retrieval_init_batched(
        params, spec, table, obs_b.points_w, obs_b.point_valid,
        top_k=4, n_score_pts=128, score_bf16=True)
    np.testing.assert_allclose(np.asarray(lat_bf16), np.asarray(lat_f32), atol=0)
    np.testing.assert_allclose(np.asarray(T_bf16), np.asarray(T_f32), atol=0)


def test_retrieval_prior_shrinkage():
    """retrieval_prior_w shrinks the retrieval toward the table mean: at a
    huge weight the retrieved code is the table code closest to the mean,
    regardless of fit (prior_w -> inf ~ the reference's mean init). (The
    fit-dominant prior_w=0 ranking is pinned on the flagship decoder by
    test_retrieval_picks_generating_code_flagship — the 8-wide test decoder
    cannot discriminate fit.)"""
    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)

    lat_pr, _, _, _ = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=4, n_score_pts=64, n_scales=1, scale_min=1.0, scale_max=1.0,
        prior_w=1e6,
    )
    mean_code = np.asarray(table).mean(axis=0)
    nearest = np.asarray(table)[
        np.linalg.norm(np.asarray(table) - mean_code, axis=1).argmin()]
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(lat_pr[b]), nearest)


def test_retrieval_joint_opt_applies_pose_polish():
    """A config with pose_polish_iters > 0 must polish on the FUSED
    retrieval+solve path too (advisor round 4: retrieval_joint_opt skipped
    maybe_pose_polish while joint_opt_packed / solve_in_chunks applied it,
    so tool-vs-pipeline measurements silently diverged)."""
    import dataclasses

    from hortimapping_tpu.optim.lm import maybe_pose_polish
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    cfg_pp = dataclasses.replace(CFG, pose_polish_iters=3)

    lat_r, T_r, _, _ = retrieval_init_batched(
        params, spec, table, obs.points_w, obs.point_valid,
        top_k=4, n_score_pts=64, T_init=T0,
    )
    plain = shape_pose_joint_opt_batched(
        params, spec, cfg_pp, obs, lat_r, T_r, 0.1)
    want = maybe_pose_polish(params, spec, cfg_pp, obs, plain, 0.1,
                             pose_known=False)
    got = retrieval_joint_opt(params, spec, cfg_pp, table, obs, T0, 0.1,
                              top_k=4, n_score_pts=64)
    # the polish must have RUN (it bills extra iterations)...
    assert (np.asarray(want.iter_count) > np.asarray(plain.iter_count)).all()
    # ...and the fused path must match the two-step polished result
    np.testing.assert_array_equal(np.asarray(got.iter_count),
                                  np.asarray(want.iter_count))
    np.testing.assert_allclose(np.asarray(got.T_ow), np.asarray(want.T_ow),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.latent),
                               np.asarray(want.latent), atol=1e-5)


def test_selective_rescue_targets_hard_lanes():
    """selective_rescue re-dispatches ONLY unconverged/outlier lanes and
    replaces a lane iff the K-start re-solve ends at a strictly lower LM
    objective; converged lanes are untouched bit for bit."""
    import dataclasses

    from hortimapping_tpu.optim.lm import solve_in_chunks
    from hortimapping_tpu.optim.state import OptResult
    from hortimapping_tpu.optim.warmstart import selective_rescue

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=3)
    cfg = dataclasses.replace(CFG, init_mode="retrieval", rescue_starts=3,
                              retrieval_score_pts=64)
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (3, 1, 1))

    good = solve_in_chunks(params, spec, cfg, obs,
                           jnp.tile(jnp.mean(table, 0)[None], (3, 1)), T0, 0.1)
    # hand-mark lanes: 0 converged (kept), 1-2 unconverged with a garbage
    # estimate (rescued) — deterministic hard/easy split independent of the
    # tiny test decoder's convergence behavior
    bad_lat = good.latent.at[1:].add(5.0)
    res = OptResult(
        latent=bad_lat, T_ow=good.T_ow, iter_count=good.iter_count,
        failed=jnp.zeros(3, bool),
        converged=jnp.array([True, False, False]),
    )
    cost0 = np.asarray(objective_value_batched(
        params, spec, cfg, obs, res.latent, res.T_ow, 0.1))

    out, info = selective_rescue(
        params, spec, cfg, obs, res, table, T0, 0.1)

    assert info["lanes"] == [1, 2]
    assert info["n_rescued"] == 2
    # untouched converged lane
    np.testing.assert_array_equal(np.asarray(out.latent[0]),
                                  np.asarray(res.latent[0]))
    np.testing.assert_array_equal(np.asarray(out.T_ow[0]),
                                  np.asarray(res.T_ow[0]))
    # rescued lanes only ever improve the solver's own objective
    cost1 = np.asarray(objective_value_batched(
        params, spec, cfg, obs, out.latent, out.T_ow, 0.1))
    assert (cost1 <= cost0 + 1e-6).all()
    # the garbage lanes are far from any solve basin: the rescue MUST accept
    assert info["accepted"] == [0, 1]
    assert (cost1[1:] < cost0[1:]).all()


def test_selective_rescue_noop_when_all_converged():
    """All lanes converged and no cost outlier -> no dispatch, result
    returned unchanged."""
    import dataclasses

    from hortimapping_tpu.optim.state import OptResult
    from hortimapping_tpu.optim.warmstart import selective_rescue

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    cfg = dataclasses.replace(CFG, init_mode="retrieval", rescue_starts=3,
                              retrieval_score_pts=64)
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    lat = jnp.tile(jnp.mean(table, 0)[None], (2, 1))
    res = OptResult(latent=lat, T_ow=T0, iter_count=jnp.full(2, 3),
                    failed=jnp.zeros(2, bool), converged=jnp.ones(2, bool))

    out, info = selective_rescue(params, spec, cfg, obs, res, table, T0, 0.1)
    assert info["n_rescued"] == 0 and info["lanes"] == []
    np.testing.assert_array_equal(np.asarray(out.latent), np.asarray(res.latent))


def test_warmstart_solve_rescue_dispatch():
    """rescue_starts > 0 on the pipeline entry must route through
    selective_rescue (converged easy lanes identical to the plain retrieval
    solve; the knob must not silently no-op)."""
    import dataclasses

    from hortimapping_tpu.optim.warmstart import warmstart_solve

    params, spec = config_decoder(ASSET_DIR)
    table, obs, _ = _table_and_fruits(spec, n_fruits=2)
    lat0 = jnp.tile(jnp.mean(table, axis=0)[None], (2, 1))
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    cfg_r = dataclasses.replace(CFG, init_mode="retrieval",
                                retrieval_score_pts=64)
    cfg_rs = dataclasses.replace(cfg_r, rescue_starts=3)

    plain = warmstart_solve(params, spec, cfg_r, table, obs, lat0, T0, 0.1)
    rescued = warmstart_solve(params, spec, cfg_rs, table, obs, lat0, T0, 0.1)
    # max_iter=3 caps every lane below convergence -> all lanes re-solve
    # from 3 starts; the accepted results can only LOWER the LM objective
    c_plain = np.asarray(objective_value_batched(
        params, spec, cfg_r, obs, plain.latent, plain.T_ow, 0.1))
    c_res = np.asarray(objective_value_batched(
        params, spec, cfg_r, obs, rescued.latent, rescued.T_ow, 0.1))
    assert (c_res <= c_plain + 1e-6).all()


def test_yaw_damp_anchors_rotation():
    """A huge yaw_damp must hold the object-frame w_y rotation tangent at
    the (perturbed) init while translation still converges; yaw_damp=0 is
    bit-identical to the baseline solver (the knob compiles away)."""
    import dataclasses

    from hortimapping_tpu.ops.lie import rotation_matrix_to_angle

    params, spec = config_decoder(ASSET_DIR)
    cat = SyntheticCategory(spec=spec)
    rng = np.random.default_rng(11)
    code = (rng.normal(size=spec.code_length) * 0.4).astype(np.float32)
    T_wo = np.eye(4, dtype=np.float32)
    obs, _ = make_scene(cat, code, T_wo, n_frames=CFG.n_frame,
                        n_fg=CFG.n_fg_pix, n_bg=CFG.n_bg_pix,
                        n_points=CFG.recon_n_pts, seed=11)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs)
    # perturb the init by a 25 deg yaw about the object y axis
    a = np.radians(25.0)
    R_y = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = R_y
    T0_b = jnp.asarray(T0)[None]
    lat0 = jnp.zeros((1, spec.code_length), jnp.float32)

    def rel_rot_y_deg(res):
        """|y component| [deg] of the axis-angle of R_est_descaled @ R0^T."""
        R = np.asarray(res.T_ow)[0, :3, :3].astype(np.float64)
        R = R / np.linalg.det(R) ** (1.0 / 3.0)
        R_rel = R @ T0[:3, :3].astype(np.float64).T
        ang = float(rotation_matrix_to_angle(jnp.asarray(R_rel)))
        if ang < 1e-9:
            return 0.0
        axis = np.array([R_rel[2, 1] - R_rel[1, 2],
                         R_rel[0, 2] - R_rel[2, 0],
                         R_rel[1, 0] - R_rel[0, 1]]) / (2.0 * np.sin(ang))
        return abs(np.degrees(ang * axis[1]))

    cfg = dataclasses.replace(CFG, max_iter=6)
    base = shape_pose_joint_opt_batched(params, spec, cfg, obs_b, lat0, T0_b, 0.1)
    zero = shape_pose_joint_opt_batched(
        params, spec, dataclasses.replace(cfg, yaw_damp=0.0),
        obs_b, lat0, T0_b, 0.1)
    np.testing.assert_array_equal(np.asarray(base.T_ow), np.asarray(zero.T_ow))
    np.testing.assert_array_equal(np.asarray(base.latent), np.asarray(zero.latent))

    huge = shape_pose_joint_opt_batched(
        params, spec, dataclasses.replace(cfg, yaw_damp=1e6),
        obs_b, lat0, T0_b, 0.1)
    # the y (yaw) rotation component must stay at the init under the frozen
    # tangent; the baseline solver moves it to chase the 25 deg perturbation
    assert rel_rot_y_deg(huge) < 1.0, f"yaw moved {rel_rot_y_deg(huge):.2f} deg"
    assert rel_rot_y_deg(base) > rel_rot_y_deg(huge)


def test_rot_damp_freezes_all_rotation():
    """rot_damp damps all three rotation tangents: with a huge value the
    full rotation block stays at the init."""
    import dataclasses

    from hortimapping_tpu.ops.lie import rotation_matrix_to_angle

    params, spec = config_decoder(ASSET_DIR)
    cat = SyntheticCategory(spec=spec)
    code = np.zeros(spec.code_length, np.float32)
    obs, _ = make_scene(cat, code, np.eye(4, dtype=np.float32),
                        n_frames=CFG.n_frame, n_fg=CFG.n_fg_pix,
                        n_bg=CFG.n_bg_pix, n_points=CFG.recon_n_pts, seed=13)
    obs_b = jax.tree_util.tree_map(lambda a: a[None], obs)
    # tilt about x AND yaw about y
    ax, ay = np.radians(15.0), np.radians(20.0)
    R_x = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                    [0, np.sin(ax), np.cos(ax)]], np.float32)
    R_y = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                    [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = R_y @ R_x
    T0_b = jnp.asarray(T0)[None]
    lat0 = jnp.zeros((1, spec.code_length), jnp.float32)

    import dataclasses as dc
    cfg = dc.replace(CFG, max_iter=6, rot_damp=1e6)
    res = shape_pose_joint_opt_batched(params, spec, cfg, obs_b, lat0, T0_b, 0.1)
    R = np.asarray(res.T_ow)[0, :3, :3].astype(np.float64)
    R = R / np.linalg.det(R) ** (1.0 / 3.0)
    d_rot = float(rotation_matrix_to_angle(
        jnp.asarray(R @ T0[:3, :3].astype(np.float64).T)))
    assert np.degrees(d_rot) < 1.0, f"rotation moved {np.degrees(d_rot):.1f} deg"
