"""Fused Levenberg-Marquardt joint shape + pose optimization.

TPU-native re-design of the reference `Optimizer.shape_pose_joint_opt`
(`/root/reference/wild_completion/optimizer.py:28-302`) and
`shape_opt_deepsdf` (`optimizer.py:306-429`):

  * the per-frame Python loop (`optimizer.py:102-132`) is a `vmap` over a
    fixed frame axis of the masked render kernel;
  * residual/Jacobian concatenation + `torch.bmm` normal-equation assembly
    (`optimizer.py:134-231`) becomes masked einsum contractions — one
    [D, D] H and [D] b per fruit, D = pose_dim + code_len;
  * the data-dependent `for i in range(max_iter)` with breaks
    (`optimizer.py:88,276-292`) is a `lax.while_loop` whose carry holds
    per-lane `done`/`failed` flags, so a whole submap of fruits runs as one
    `vmap`-ed program with early lanes frozen;
  * `torch.inverse(H) @ b` (`optimizer.py:234`) becomes `jnp.linalg.solve`.

Per-term semantics (normalization by dynamic observation counts, Huber
robust reweighting from `robust_iter` on, code regularizer block, scale
damping, LM diag/identity damping, manifold update, 4 convergence tests)
match the reference line by line; see inline citations.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.decoder import DecoderSpec, Params
from hortimapping_tpu.ops.lie import exp_se3, exp_sim3_ref, rotation_matrix_to_angle
from hortimapping_tpu.ops.recon import sdf_residuals
from hortimapping_tpu.ops.render import RenderConfig, RenderResiduals, render_residuals
from hortimapping_tpu.ops.robust import huber_weights
from hortimapping_tpu.optim.state import FruitObservations, OptResult, OptState, init_state


def _render_config(cfg: JointOptConfig) -> RenderConfig:
    return RenderConfig(
        scale_on=cfg.scale_on,
        log_occ_on=cfg.log_sdf_occ,
        occ_cutoff=cfg.occ_cutoff_m,
        occlusion_on=cfg.occlusion_on,
        jac_cap=cfg.jac_cap_resolved,
        fwd_cap=cfg.fwd_cap_resolved,
        fwd_bf16=cfg.fwd_bf16,
        use_pallas=cfg.pallas_resolved(),
        fused=cfg.fused_resolved(),
        fused_bf16=cfg.fused_bf16,
        fused_tr=cfg.fused_tr,
    )


def _robust_w2(res: jnp.ndarray, th: float, active: jnp.ndarray) -> jnp.ndarray:
    """Huber w^2 when `active`, else 1 (reference: optimizer.py:145-149)."""
    w = huber_weights(res, th)
    return jnp.where(active, w * w, 1.0)


def _term_normal_eq(
    jac: jnp.ndarray, res: jnp.ndarray, w2: jnp.ndarray, count: jnp.ndarray, weight: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """H = weight * sum(w2 J^T J)/count, b = -weight * sum(w2 J^T r)/count.

    jac: [..., D], res/w2: [...]; leading axes are summed (masked rows are
    exactly zero). Mirrors optimizer.py:152-159,189-190 — note b uses the
    raw residual (the robust weight enters only via w2).
    """
    count_safe = jnp.maximum(count, 1.0)
    jw = jac * w2[..., None]
    flat_j = jac.reshape(-1, jac.shape[-1])
    flat_jw = jw.reshape(-1, jac.shape[-1])
    H = weight * (flat_jw.T @ flat_j) / count_safe
    b = -weight * (flat_jw.T @ res.reshape(-1)) / count_safe
    return H, b


def _assemble_normal_equations(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent: jnp.ndarray,
    T_ow: jnp.ndarray,
    i: jnp.ndarray,
    cube_radius: float,
    lane_active: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble the UNDAMPED normal equations (H, b), `failed`, and the
    weighted objective value at the linearization point.

    Reference: `optimizer.py:95-218` — render term over sampled frames,
    SDF reconstruction term, code regularizer block, scale damping, each
    normalized by its dynamic observation count. LM damping is applied by
    the caller (`apply_lm_damping` for the reference's fixed lambda_0;
    per-lane adaptive lambda in the trust-region solver). The returned cost
    is the LM objective 0.5-free form sum_t w_t * sum(w_rob^2 r^2)/N_t +
    w_codereg |latent|^2 (what the normal equations minimize locally).
    """
    pose_dim = cfg.pose_dim
    C = latent.shape[0]
    D = pose_dim + C
    f32 = jnp.float32
    if lane_active is None:
        lane_active = jnp.asarray(True)

    cur_scale = jnp.linalg.det(T_ow[:3, :3]) ** (-1.0 / 3.0)  # optimizer.py:66

    # ---------------- I. render term (vmapped over frames) ----------------
    rcfg = _render_config(cfg)
    M = cfg.n_sample_on_ray
    n_fg = cfg.n_fg_pix
    R = cfg.n_rays
    is_fg = jnp.arange(R) < n_fg

    def per_frame(T_wc, rays, ray_valid, depth_obs, frame_valid) -> RenderResiduals:
        # NOTE: the exact inverse (not the closed-form Sim(3) transpose) is
        # deliberate — LM updates drift T_ow slightly off the Sim(3)
        # manifold, and the reference inverts the drifted matrix exactly
        # (`optimizer.py:105`); the ~4 ms/iter saving is not worth the
        # trajectory divergence
        T_oc = T_ow @ T_wc                                    # optimizer.py:104
        T_co = jnp.linalg.inv(T_oc)
        depth_range = cube_radius * cur_scale                 # optimizer.py:107
        d_lo = T_co[2, 3] - 1.0 * depth_range                 # optimizer.py:110
        d_hi = T_co[2, 3] + 0.8 * depth_range
        depths = jnp.linspace(d_lo, d_hi, M)
        return render_residuals(
            params, spec, latent, rays, is_fg, ray_valid & frame_valid,
            depth_obs, T_oc, depths, jnp.asarray(depth_range, f32), rcfg,
            lane_active,
        )

    with jax.named_scope("render_term"):
        rr = jax.vmap(per_frame)(
            obs.T_wc, obs.rays, obs.ray_valid, obs.depth_obs, obs.frame_valid
        )  # fields shaped [F, R] / [F, R, D]

    obs_count = jnp.sum(rr.ray_ok).astype(f32)                # optimizer.py:134-135
    failed = obs_count == 0.0                                  # optimizer.py:139-141

    robust_active = i >= cfg.robust_iter
    w2_d = _robust_w2(rr.res_d, cfg.render_robust_th_m, robust_active)
    H_d, b_d = _term_normal_eq(rr.jac_d, rr.res_d, w2_d, obs_count, cfg.w_depth)
    ones = jnp.ones_like(rr.res_m)
    H_m, b_m = _term_normal_eq(rr.jac_m, rr.res_m, ones, obs_count, cfg.w_mask)

    # ---------------- II. sdf reconstruction term ----------------
    with jax.named_scope("recon_term"):
        pts_o = obs.points_w @ T_ow[:3, :3].T + T_ow[:3, 3]    # optimizer.py:168
        rec = sdf_residuals(params, spec, latent, pts_o, obs.point_valid, cfg.scale_on)
        recon_count = jnp.sum(obs.point_valid).astype(f32)     # optimizer.py:177
        w2_r = _robust_w2(rec.res, cfg.recon_robust_th_m, robust_active)
        H_r, b_r = _term_normal_eq(rec.jac, rec.res, w2_r, recon_count, cfg.w_recon)

    # ---------------- III. code regularizer (optimizer.py:200-203) ----------------
    code_mask = (jnp.arange(D) >= pose_dim).astype(f32)
    H_c = jnp.diag(cfg.w_codereg * code_mask)
    b_c = jnp.concatenate([jnp.zeros(pose_dim, f32), -cfg.w_codereg * latent])

    # ---------------- assemble (optimizer.py:210-218) ----------------
    H = H_d + H_m + H_r + H_c
    if cfg.scale_on:
        H = H.at[pose_dim - 1, pose_dim - 1].add(cfg.s_damp)   # optimizer.py:217-218
    # damped rotation tangents (TPU extension, config.py yaw_damp/rot_damp):
    # the update is a LEFT perturbation on T_ow (exp(delta) @ T_ow), so the
    # w tangents [3:6] rotate about the OBJECT frame's own axes — w_y
    # (index 4) is the fruit's canonical stem/symmetry axis, the direction
    # the pose-noise study shows both solvers trade away for shape fit.
    if cfg.yaw_damp > 0.0:
        H = H.at[4, 4].add(cfg.yaw_damp)
    if cfg.rot_damp > 0.0:
        H = H.at[jnp.arange(3, 6), jnp.arange(3, 6)].add(cfg.rot_damp)
    b = b_d + b_m + b_r + b_c

    count_safe = jnp.maximum(obs_count, 1.0)
    rcount_safe = jnp.maximum(recon_count, 1.0)
    cost = (
        cfg.w_depth * jnp.sum(w2_d * rr.res_d * rr.res_d) / count_safe
        + cfg.w_mask * jnp.sum(rr.res_m * rr.res_m) / count_safe
        + cfg.w_recon * jnp.sum(w2_r * rec.res * rec.res) / rcount_safe
        + cfg.w_codereg * jnp.sum(latent * latent)
    )
    return H, b, failed, cost


def apply_lm_damping(H: jnp.ndarray, cfg: JointOptConfig,
                     lam: jnp.ndarray | float | None = None) -> jnp.ndarray:
    """Reference LM damping (`optimizer.py:220-225`): lambda * diag(H) added
    to H, or lambda * max(diag(H)) * I when `lm_eye`. `lam` defaults to the
    fixed lambda_0; the trust-region solver passes its per-lane value."""
    if not cfg.lm_on:
        return H
    lam = cfg.lm_lambda_0 if lam is None else lam
    if cfg.lm_eye:
        return H + lam * jnp.max(jnp.diag(H)) * jnp.eye(H.shape[0], dtype=H.dtype)
    return H + lam * jnp.diag(jnp.diag(H))


def normal_equations(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent: jnp.ndarray,
    T_ow: jnp.ndarray,
    i: jnp.ndarray,
    cube_radius: float,
    lane_active: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Damped normal equations exactly as the reference solves them
    (`optimizer.py:95-231`) — the head-to-head surface for differential
    tests against the captured reference H/b."""
    H, b, failed, _ = _assemble_normal_equations(
        params, spec, cfg, obs, latent, T_ow, i, cube_radius, lane_active
    )
    return apply_lm_damping(H, cfg), b, failed


def lm_iteration(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    state: OptState,
    cube_radius: float,
    pose_known: bool,
    code_known: bool = False,
) -> OptState:
    """One LM iteration (reference: the body of optimizer.py:88-292).

    `code_known` is the mirror of the reference's `pose_known` mode: the
    code block of the step is zeroed so only the Sim(3)/SE(3) pose moves
    (used by the pose-polish phase, `pose_polish_batched`). No reference
    equivalent — the reference never freezes the shape."""
    pose_dim = cfg.pose_dim
    i = state.i
    latent, T_ow = state.latent, state.T_ow
    # frozen lanes keep stepping in the shared batched while_loop but their
    # outputs are discarded (_freeze_if_done) — tell the fused render kernel
    # to skip their compute entirely
    lane_active = ~(state.done | state.failed)

    H, b, failed = normal_equations(
        params, spec, cfg, obs, latent, T_ow, i, cube_radius, lane_active
    )

    # ---------------- solve + manifold update (optimizer.py:234-248) ----------------
    with jax.named_scope("solve_update"):
        delta = jnp.linalg.solve(H, b)
    if pose_known:
        delta = delta.at[:6].set(0.0)                          # optimizer.py:237-239
    if code_known:
        delta = delta.at[pose_dim:].set(0.0)
    delta_p = delta[:pose_dim]
    delta_c = delta[pose_dim:]
    # exp_sim3_ref replicates the reference's c=0-for-(s <= eps) translation
    # Jacobian quirk (`utils.py:314`) — required for trajectory parity
    delta_T = exp_sim3_ref(delta_p) if cfg.scale_on else exp_se3(delta_p)
    T_new = delta_T @ T_ow
    latent_new = latent + delta_c

    # ---------------- convergence bookkeeping (optimizer.py:250-292) ----------------
    scale_new = jnp.linalg.det(T_new[:3, :3]) ** (-1.0 / 3.0)
    delta_scale = jnp.linalg.det(delta_T[:3, :3]) ** (1.0 / 3.0)
    delta_tran = jnp.linalg.norm(delta_T[:3, 3]) * scale_new
    delta_rot = rotation_matrix_to_angle(delta_T[:3, :3] * scale_new) * 180.0 / math.pi

    past_warmup = i > 1
    conv_g = (jnp.max(jnp.abs(b)) < cfg.epsilon_g) & past_warmup
    # with the code frozen, delta_c == 0 would trivially satisfy the
    # relative-code-change test — disable it so the polish runs on the pose
    # tests / iteration budget only
    conv_c = (jnp.max(jnp.abs(delta_c / (latent_new + 1e-12))) < cfg.epsilon_c) \
        & past_warmup & (not code_known)
    # NOTE: the reference compares delta_scale (a ratio ~= 1) against
    # epsilon_s directly (`optimizer.py:285`), so its pose-convergence test
    # can never fire; replicated literally for iteration-count parity.
    conv_p = (
        (delta_tran < cfg.epsilon_t)
        & (delta_rot < cfg.epsilon_r)
        & (delta_scale < cfg.epsilon_s)
        & past_warmup
        & (not pose_known)
    )
    conv = conv_g | conv_c | conv_p
    done = conv | (i >= cfg.max_iter - 1)

    new_state = OptState(
        latent=latent_new,
        T_ow=T_new,
        i=i + 1,
        iter_count=i + 1,                                      # optimizer.py:273
        done=done,
        failed=jnp.asarray(False),
        converged=conv,
    )
    # a failed iteration (no valid rays) leaves the estimate untouched and
    # terminates the lane (reference break, optimizer.py:139-141)
    fail_state = state._replace(done=jnp.asarray(True), failed=jnp.asarray(True))
    return jax.tree_util.tree_map(
        lambda a, fa: jnp.where(failed, fa, a), new_state, fail_state
    )


class TrState(NamedTuple):
    """Carry of the adaptive trust-region LM solver (`trust_region: true`).

    Extends the parity carry with the per-lane damping lambda and the last
    ACCEPTED linearization point: its state, undamped normal equations and
    objective value. A rejected step re-solves from the stored (H, b) with a
    larger lambda — rejections cost one 39x39 solve, not a new residual
    assembly (which is ~10^4x more expensive)."""

    base: OptState
    lam: jnp.ndarray          # [] f32 current damping
    cost: jnp.ndarray         # [] f32 objective at the last accepted state
    acc_latent: jnp.ndarray   # [C] last accepted latent
    acc_T_ow: jnp.ndarray     # [4, 4] last accepted pose
    H_acc: jnp.ndarray        # [D, D] undamped H at the accepted state
    b_acc: jnp.ndarray        # [D]
    nu: jnp.ndarray           # [] f32 Nielsen rejection growth factor
    pred: jnp.ndarray         # [] f32 predicted reduction of the in-flight step
    flat: jnp.ndarray         # [] int32 consecutive flat accepted steps


def init_tr_state(latent: jnp.ndarray, T_ow: jnp.ndarray, cfg: JointOptConfig,
                  i0: int = 0) -> TrState:
    D = cfg.pose_dim + latent.shape[-1]
    f32 = jnp.float32
    return TrState(
        base=init_state(latent, T_ow, i0),
        lam=jnp.asarray(cfg.lm_lambda_0, f32),
        cost=jnp.asarray(jnp.inf, f32),   # first assembly always accepts
        acc_latent=latent,
        acc_T_ow=T_ow,
        H_acc=jnp.zeros((D, D), f32),
        b_acc=jnp.zeros((D,), f32),
        nu=jnp.asarray(2.0, f32),
        pred=jnp.asarray(1.0, f32),
        flat=jnp.int32(0),
    )


def lm_iteration_tr(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    ts: TrState,
    cube_radius: float,
    pose_known: bool,
) -> TrState:
    """One adaptive-damping LM iteration (non-parity mode, `trust_region`).

    Same residuals, Jacobians, per-term weights and convergence tests as the
    reference-parity path — only the damping schedule differs: instead of the
    reference's fixed lambda_0 (`optimizer.py:220-225`), each lane adapts
    lambda by deferred step acceptance with Nielsen's gain-ratio rule
    (Madsen/Nielsen/Tingleff 2004, §3.2). The assembly at iteration k prices
    the step taken at k-1 against its stored predicted reduction: a good step
    shrinks lambda by max(1/3, 1-(2*rho-1)^3); a bad one is rolled back to the
    stored accepted state and retried from its stored (H, b) with lambda * nu
    (nu doubling on consecutive rejections). Fixed-lambda LM stalls the slow
    tail of the bench workload at the 50-iteration cap; the adaptive schedule
    converges those lanes in ~20.
    """
    s = ts.base
    pose_dim = cfg.pose_dim
    i = s.i
    f32 = jnp.float32
    lane_active = ~(s.done | s.failed)

    H, b, failed, cost = _assemble_normal_equations(
        params, spec, cfg, obs, s.latent, s.T_ow, i, cube_radius, lane_active
    )

    # at i == robust_iter the freshly assembled cost includes Huber weights
    # (w2 <= 1) while the stored accepted cost does not — the comparison is
    # across two different objectives. Accept the step (the reweighted cost
    # becomes the new baseline) but skip the lambda/nu adaptation for this
    # one boundary iteration: a spurious "improvement" from reweighting must
    # not shrink the damping.
    crossed = (i == cfg.robust_iter) if cfg.robust_iter > 0 else jnp.asarray(False)
    # the crossed-boundary auto-accept must never force a NON-FINITE trial
    # state in (an overflowed step at i == robust_iter-1 would then poison
    # H_acc/b_acc with NaNs the lane can never roll back from)
    accept = (cost <= ts.cost) | (crossed & jnp.isfinite(cost))
    # inf at i=0: first step always accepts (finite cost <= inf)
    # jnp.where, NOT an arithmetic blend: a NaN trial state (overflowed
    # assembly after a wild step) must roll back cleanly — 0 * NaN would
    # poison the stored accepted state and the lane could never recover
    H_use = jnp.where(accept, H, ts.H_acc)
    b_use = jnp.where(accept, b, ts.b_acc)
    lat_use = jnp.where(accept, s.latent, ts.acc_latent)
    T_use = jnp.where(accept, s.T_ow, ts.acc_T_ow)
    cost_use = jnp.where(accept, cost, ts.cost)
    # Nielsen gain ratio: actual vs predicted reduction of the priced step
    rho = (ts.cost - cost) / jnp.maximum(ts.pred, 1e-30)
    rho = jnp.where(jnp.isfinite(rho), rho, 1.0)  # i=0: inf improvement
    shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    lam = jnp.where(
        accept,
        jnp.maximum(ts.lam * shrink, cfg.tr_lambda_min),
        jnp.minimum(ts.lam * ts.nu, cfg.tr_lambda_max),
    )
    nu = jnp.where(accept, 2.0, jnp.minimum(ts.nu * 2.0, 128.0))
    # hold the damping only for an ACCEPTED boundary step (the reweighting
    # "improvement" is not a real gain); a rejected one (non-finite trial)
    # keeps the normal lambda-growth so the retry takes a smaller step
    lam = jnp.where(crossed & accept, ts.lam, lam)
    nu = jnp.where(crossed & accept, ts.nu, nu)

    with jax.named_scope("solve_update"):
        Hd = apply_lm_damping(H_use, cfg, lam)
        delta = jnp.linalg.solve(Hd, b_use)
    if pose_known:
        # zero the pose step BEFORE pricing it: pred must value the step
        # actually taken, or the gain ratio rho is deflated by phantom pose
        # gain and the adaptive damping schedule adapts on a mispriced step
        delta = delta.at[:6].set(0.0)
    # predicted reduction of THIS step for next iteration's gain ratio:
    # L(0) - L(delta) = delta^T (b + lambda * D * delta) in our no-1/2,
    # b = -J^T W r convention
    pred = jnp.maximum(jnp.dot(delta, b_use + (Hd - H_use) @ delta), 1e-30)
    delta_p = delta[:pose_dim]
    delta_c = delta[pose_dim:]
    delta_T = exp_sim3_ref(delta_p) if cfg.scale_on else exp_se3(delta_p)
    T_new = delta_T @ T_use
    latent_new = lat_use + delta_c

    # convergence tests as optimizer.py:276-292, evaluated at the step base
    scale_new = jnp.linalg.det(T_new[:3, :3]) ** (-1.0 / 3.0)
    delta_scale = jnp.linalg.det(delta_T[:3, :3]) ** (1.0 / 3.0)
    delta_tran = jnp.linalg.norm(delta_T[:3, 3]) * scale_new
    delta_rot = rotation_matrix_to_angle(delta_T[:3, :3] * scale_new) * 180.0 / math.pi
    past_warmup = i > 1
    conv_g = (jnp.max(jnp.abs(b_use)) < cfg.epsilon_g) & past_warmup
    conv_c = (jnp.max(jnp.abs(delta_c / (latent_new + 1e-12))) < cfg.epsilon_c) & past_warmup
    conv_p = (
        (delta_tran < cfg.epsilon_t)
        & (delta_rot < cfg.epsilon_r)
        & (delta_scale < cfg.epsilon_s)
        & past_warmup
        & (not pose_known)
    )
    # objective-driven stop: two CONSECUTIVE accepted steps whose improvement
    # rate flattened (a single flat step can be a plateau the damping schedule
    # still escapes; ts.cost is finite from the first acceptance on)
    # isfinite gate: the i=0 sentinel inf cost must never count as a flat
    # step (inf - cost <= rtol * inf is True); ~crossed: the robust-boundary
    # "improvement" is a reweighting artifact, not a flat objective signal
    is_flat = (
        accept & jnp.isfinite(ts.cost) & ~crossed
        & ((ts.cost - cost) <= cfg.tr_cost_rtol * ts.cost)
    )
    flat = jnp.where(is_flat, ts.flat + 1, jnp.where(accept, 0, ts.flat))
    conv_f = (flat >= 2) & past_warmup
    conv = (conv_g | conv_c | conv_p | conv_f) & accept
    done = conv | (i >= cfg.max_iter - 1)

    new_base = OptState(
        latent=latent_new, T_ow=T_new, i=i + 1, iter_count=i + 1,
        done=done, failed=jnp.asarray(False), converged=conv,
    )
    new_ts = TrState(new_base, lam, cost_use, lat_use, T_use, H_use, b_use,
                     nu, pred, flat)
    # failed lanes keep the last ACCEPTED estimate and terminate
    fail_base = s._replace(
        latent=ts.acc_latent, T_ow=ts.acc_T_ow,
        done=jnp.asarray(True), failed=jnp.asarray(True),
    )
    fail_ts = ts._replace(base=fail_base)
    return jax.tree_util.tree_map(
        lambda a, fa: jnp.where(failed, fa, a), new_ts, fail_ts
    )


def _freeze_if_done_tr(old: TrState, new: TrState) -> TrState:
    frozen = old.base.done | old.base.failed
    return jax.tree_util.tree_map(lambda o, n: jnp.where(frozen, o, n), old, new)


def _tr_result(final: TrState) -> OptResult:
    """Select each finished lane's reported state. `base` holds the final
    unpriced trial step; report it only when the lane exited through a
    convergence test (the trial is then a vanishing step off the accepted
    fixed point, matching reference semantics of returning the post-update
    state). Max-iter / failed lanes report the last accepted state instead —
    their in-flight trial was never shown to improve the objective."""
    take_trial = final.base.converged
    # where, not a blend: a NaN max-iter trial must not leak into the result
    latent = jnp.where(take_trial, final.base.latent, final.acc_latent)
    T_ow = jnp.where(take_trial, final.base.T_ow, final.acc_T_ow)
    return OptResult(latent, T_ow, final.base.iter_count, final.base.failed,
                     final.base.converged)


def _freeze_if_done(old: OptState, new: OptState) -> OptState:
    """Lanes already done/failed must not change (vmapped while_loop runs the
    body for every lane until all lanes finish)."""
    frozen = old.done | old.failed
    return jax.tree_util.tree_map(lambda o, n: jnp.where(frozen, o, n), old, new)


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known"))
def shape_pose_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
) -> OptResult:
    """Optimize one fruit. Returns (latent, T_ow, iter_count, failed).

    Reference: `optimizer.py:28-302` — including the `epsilon_*` convergence
    tests and the `pose_known` mode (SE(3) increments zeroed, scale free).
    With `cfg.trust_region` the adaptive-damping iteration replaces the
    fixed-lambda one (same residuals/tests, different damping schedule).
    """
    if cfg.trust_region:
        def cond_tr(ts: TrState):
            return jnp.any(~(ts.base.done | ts.base.failed))

        def body_tr(ts: TrState):
            new = lm_iteration_tr(params, spec, cfg, obs, ts, cube_radius, pose_known)
            return _freeze_if_done_tr(ts, new)

        final_tr = jax.lax.while_loop(cond_tr, body_tr,
                                      init_tr_state(latent0, T_ow0, cfg))
        return _tr_result(final_tr)

    def cond(s: OptState):
        return jnp.any(~(s.done | s.failed))

    def body(s: OptState):
        new = lm_iteration(params, spec, cfg, obs, s, cube_radius, pose_known)
        return _freeze_if_done(s, new)

    final = jax.lax.while_loop(cond, body, init_state(latent0, T_ow0))
    return OptResult(final.latent, final.T_ow, final.iter_count, final.failed,
                     final.converged)


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known"))
def shape_pose_joint_opt_batched(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,   # leading fruit axis on every field
    latent0: jnp.ndarray,     # [B, C]
    T_ow0: jnp.ndarray,       # [B, 4, 4]
    cube_radius: float,
    pose_known: bool = False,
) -> OptResult:
    """All fruits of a submap in one vmapped LM solve (the reference's outer
    sequential per-fruit loop, `test_wild_completion.py:133`, batched away).

    One shared `while_loop` steps every lane; converged lanes freeze, and the
    loop exits when the slowest lane converges. Per-lane `iter_count` matches
    the sequential semantics exactly. With `cfg.trust_region` each lane also
    carries its own adaptive damping lambda.
    """
    if cfg.trust_region:
        def cond_tr(ts: TrState):
            return jnp.any(~(ts.base.done | ts.base.failed))

        def body_tr(ts: TrState):
            new = jax.vmap(
                lambda o, t: lm_iteration_tr(params, spec, cfg, o, t,
                                             cube_radius, pose_known)
            )(obs, ts)
            return jax.vmap(_freeze_if_done_tr)(ts, new)

        ts0 = jax.vmap(lambda l, T: init_tr_state(l, T, cfg))(latent0, T_ow0)
        return jax.vmap(_tr_result)(jax.lax.while_loop(cond_tr, body_tr, ts0))

    def cond(s: OptState):
        return jnp.any(~(s.done | s.failed))

    def body(s: OptState):
        new = jax.vmap(
            lambda o, st: lm_iteration(params, spec, cfg, o, st, cube_radius, pose_known)
        )(obs, s)
        return jax.vmap(_freeze_if_done)(s, new)

    s0 = jax.vmap(init_state)(latent0, T_ow0)
    final = jax.lax.while_loop(cond, body, s0)
    return OptResult(final.latent, final.T_ow, final.iter_count, final.failed,
                     final.converged)


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius"))
def pose_polish_batched(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,   # leading fruit axis
    res: OptResult,
    cube_radius: float,
) -> OptResult:
    """Code-frozen pose polish: up to `cfg.pose_polish_iters` extra LM
    iterations from the joint solution with the latent FROZEN (the code
    block of every step is zeroed — `lm_iteration(code_known=True)`).

    Rationale: the joint solve trades pose accuracy against shape fit — a
    slightly-off shape can pull the pose to compensate. Once the shape has
    converged, re-solving pose alone against the fixed decoder surface
    removes that coupling. No reference equivalent (the reference solves
    jointly only, `optimizer.py:28-302`); probed for the greenhouse
    multi-frame pose metric (docs/PERF.md round 4).

    Failed lanes stay frozen (their estimate is the untouched init, the
    reference break semantics); `iter_count` bills main + polish iterations
    like the two-phase c2f billing. `converged` reports the MAIN solve's
    verdict (the polish runs a fixed small budget, its own convergence is
    not a quality signal)."""
    polish_cfg = dataclasses.replace(cfg, max_iter=cfg.pose_polish_iters)

    def cond(s: OptState):
        return jnp.any(~(s.done | s.failed))

    def body(s: OptState):
        new = jax.vmap(
            lambda o, st: lm_iteration(params, spec, polish_cfg, o, st,
                                       cube_radius, False, code_known=True)
        )(obs, s)
        return jax.vmap(_freeze_if_done)(s, new)

    s0 = jax.vmap(init_state)(res.latent, res.T_ow)
    # lanes that failed the main solve must not start polishing
    s0 = s0._replace(done=res.failed, failed=res.failed)
    final = jax.lax.while_loop(cond, body, s0)
    return OptResult(
        res.latent,                      # frozen by construction
        final.T_ow,
        res.iter_count + final.iter_count,
        # a lane that "fails" mid-polish (freeze keeps its last good pose)
        # still carries a valid MAIN solution — only the main verdict ships
        res.failed,
        res.converged,
    )


def maybe_pose_polish(params, spec, cfg, obs, res, cube_radius,
                      pose_known=False):
    """Apply the configured pose polish (opt.tpu.pose_polish_iters > 0).
    A no-op under `pose_known` — there is no pose to polish."""
    if cfg.pose_polish_iters > 0 and not pose_known:
        return pose_polish_batched(params, spec, cfg, obs, res, cube_radius)
    return res


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known", "start_iter"))
def _continue_joint_opt_batched(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool,
    start_iter: int,
) -> OptResult:
    """Batched solve starting from iteration `start_iter` (staged solver)."""

    def cond(s: OptState):
        return jnp.any(~(s.done | s.failed))

    def body(s: OptState):
        new = jax.vmap(
            lambda o, st: lm_iteration(params, spec, cfg, o, st, cube_radius, pose_known)
        )(obs, s)
        return jax.vmap(_freeze_if_done)(s, new)

    s0 = jax.vmap(lambda l, T: init_state(l, T, start_iter))(latent0, T_ow0)
    final = jax.lax.while_loop(cond, body, s0)
    return OptResult(final.latent, final.T_ow, final.iter_count, final.failed,
                     final.converged)


def _subsample(
    obs: FruitObservations,
    cfg: JointOptConfig,
    stride: int,
    ray_frac: float,
    sample_frac: float,
    pts_frac: float,
) -> Tuple[FruitObservations, JointOptConfig]:
    """Subsampled observation buffers + a shape-consistent config.

    Keeps every `stride`-th frame, the first fraction of the fg and bg ray
    blocks (rays are randomly subsampled upstream, `data/rays.py`, so a
    prefix is an unbiased subset), and the first fraction of the surface
    points. Works on single or fruit-batched obs (slicing is on the
    trailing axes).
    """
    n_fg = int(cfg.n_fg_pix * ray_frac)
    n_bg = int(cfg.n_bg_pix * ray_frac)
    n_pts = int(cfg.recon_n_pts * pts_frac)
    M = max(int(cfg.n_sample_on_ray * sample_frac), 2)
    F = (cfg.n_frame + stride - 1) // stride
    fg0 = cfg.n_fg_pix

    rays = jnp.concatenate(
        [obs.rays[..., ::stride, :n_fg, :], obs.rays[..., ::stride, fg0:fg0 + n_bg, :]],
        axis=-2,
    )
    ray_valid = jnp.concatenate(
        [obs.ray_valid[..., ::stride, :n_fg], obs.ray_valid[..., ::stride, fg0:fg0 + n_bg]],
        axis=-1,
    )
    depth_obs = jnp.concatenate(
        [obs.depth_obs[..., ::stride, :n_fg], obs.depth_obs[..., ::stride, fg0:fg0 + n_bg]],
        axis=-1,
    )
    sub_obs = FruitObservations(
        T_wc=obs.T_wc[..., ::stride, :, :],
        rays=rays,
        ray_valid=ray_valid,
        depth_obs=depth_obs,
        frame_valid=obs.frame_valid[..., ::stride],
        points_w=obs.points_w[..., :n_pts, :],
        point_valid=obs.point_valid[..., :n_pts],
    )
    sub_cfg = dataclasses.replace(
        cfg,
        n_fg_pix=n_fg, n_bg_pix=n_bg, n_frame=F, n_sample_on_ray=M,
        recon_n_pts=n_pts,
        coarse_to_fine=False,
    )
    return sub_obs, sub_cfg


def subsample_observations(
    obs: FruitObservations, cfg: JointOptConfig
) -> Tuple[FruitObservations, JointOptConfig]:
    """Build the coarse-phase observation buffers + config (see _subsample)."""
    sub_obs, sub_cfg = _subsample(
        obs, cfg, cfg.coarse_frame_stride, cfg.coarse_ray_frac,
        cfg.coarse_sample_frac, cfg.coarse_pts_frac,
    )
    coarse_cfg = dataclasses.replace(
        sub_cfg,
        max_iter=cfg.coarse_max_iter or cfg.max_iter,
        fused_tr=cfg.coarse_fused_tr or cfg.fused_tr,
        # annealed scale damping: hold scale near the init through the noisy
        # subsampled phase, release it for the full-resolution polish
        s_damp=cfg.coarse_s_damp or cfg.s_damp,
    )
    return sub_obs, coarse_cfg


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known"))
def coarse_to_fine_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,   # leading fruit axis on every field
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
) -> OptResult:
    """Two-resolution batched solve (`coarse_to_fine: true`).

    Phase A runs the SAME LM iteration on a subsampled problem —
    every `coarse_frame_stride`-th frame, `coarse_ray_frac` of the rays,
    `coarse_sample_frac` of the ray-marching depths, `coarse_pts_frac` of the
    surface points — which is ~(stride / frac^3)x cheaper per iteration
    (8x at the defaults; ~16x at the bench schedule). Phase B polishes at
    full resolution from the coarse solution, with the Huber robust kernel
    active from its first iteration (the coarse phase already passed the
    reference's robust ramp-in). No reference equivalent (the reference
    always solves at full resolution, `optimizer.py:88-292`); the fine
    phase's stationary points are those of the reference objective, and on
    the wild-pepper bench workload the tuned schedule is better on BOTH
    axes than the single-phase solve — ~22 vs 208 ms/fruit at mean Chamfer
    0.527 vs 0.634 mm, held-out validated (docs/PERF.md; schedules are
    per-workload: the small pose_known challenge config is WORSE under
    c2f and keeps the single-phase default). Per-fruit `iter_count` bills
    BOTH phases (coarse + fine), so pipeline `mean iters` summaries are
    work-comparable to the reference's per-fruit counts; note a coarse
    iteration costs ~1/8-1/16 of a full-resolution one.

    Jitted as ONE program: the nested phase calls inline, so both
    while_loops run back-to-back on device in a single dispatch — on a
    remote-TPU link the second dispatch round trip used to dominate B=1
    latency (docs/PERF.md "Single-fruit latency").
    """
    coarse_obs, coarse_cfg = subsample_observations(obs, cfg)
    r_a = shape_pose_joint_opt_batched(
        params, spec, coarse_cfg, coarse_obs, latent0, T_ow0,
        cube_radius, pose_known,
    )
    fine_obs = obs
    fine_cfg = cfg
    if (cfg.fine_frame_stride > 1 or cfg.fine_ray_frac < 1.0
            or cfg.fine_sample_frac < 1.0 or cfg.fine_pts_frac < 1.0):
        # optional subsampled polish: cheaper phase B where held-out
        # validation proves quality holds (docs/PERF.md round 3)
        fine_obs, fine_cfg = _subsample(
            obs, cfg, cfg.fine_frame_stride, cfg.fine_ray_frac,
            cfg.fine_sample_frac, cfg.fine_pts_frac,
        )
    fine_cfg = dataclasses.replace(
        fine_cfg,
        max_iter=cfg.fine_max_iter or cfg.max_iter,
        coarse_to_fine=False,
        # the fine phase continues an optimization that is already past the
        # reference's robust ramp-in (`robust_iter`, optimizer.py:145): its
        # iteration counter restarts at 0, so without this the short
        # full-resolution polish would run with the Huber kernel OFF and
        # give outliers full quadratic weight in the returned result
        robust_iter=0,
    )
    # failed coarse lanes restart the fine phase from the original init
    ff = r_a.failed.astype(jnp.float32)[:, None]
    lat1 = (1.0 - ff) * r_a.latent + ff * latent0
    T1 = (1.0 - ff[..., None]) * r_a.T_ow + ff[..., None] * T_ow0
    r_b = shape_pose_joint_opt_batched(
        params, spec, fine_cfg, fine_obs, lat1, T1, cube_radius, pose_known,
    )
    return r_b._replace(iter_count=r_a.iter_count + r_b.iter_count)


def pack_result(res: OptResult) -> jnp.ndarray:
    """[B, C+19] device array: latent | T_ow(16) | iters | failed | converged.

    Packing on device lets a caller retrieve a whole batch result in ONE
    host transfer instead of five — each separate fetch pays a full round
    trip + polling backoff on remote-TPU links (~250 ms each measured over
    the axon tunnel)."""
    B = res.latent.shape[0]
    f32 = jnp.float32
    return jnp.concatenate(
        [
            res.latent.astype(f32),
            res.T_ow.reshape(B, 16).astype(f32),
            res.iter_count.astype(f32)[:, None],
            res.failed.astype(f32)[:, None],
            res.converged.astype(f32)[:, None],
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known"))
def joint_opt_packed(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,   # leading fruit axis
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
    latent_table: Optional[jnp.ndarray] = None,
) -> Tuple[OptResult, jnp.ndarray]:
    """One-dispatch batched solve returning (result, packed result).

    The configured solver (two-resolution or single-phase; both while_loops
    of c2f inline) AND the result packing compile into a single XLA program:
    a robot-loop (B=1) solve costs exactly one dispatch round trip plus one
    packed-array fetch over the device link. The unpacked `OptResult` device
    handles come along for free — e.g. to dispatch the mesher's grid decode
    before the packed fetch (serve.py overlaps them).

    With `cfg.init_mode == "retrieval"` and a `latent_table`, the retrieval
    warm start (optim/warmstart.py) replaces (latent0, T_ow0) INSIDE the
    same program — scoring, both solve phases, and packing stay one
    dispatch, so serving and the B=1 robot loop get the warm start at zero
    extra round trips."""
    if cfg.init_mode == "retrieval" and latent_table is not None:
        from hortimapping_tpu.optim.warmstart import maybe_retrieval_init

        latent0, T_ow0 = maybe_retrieval_init(
            params, spec, cfg, latent_table, obs, latent0, T_ow0
        )
    solver = coarse_to_fine_joint_opt if cfg.coarse_to_fine else shape_pose_joint_opt_batched
    res = solver(params, spec, cfg, obs, latent0, T_ow0, cube_radius, pose_known)
    res = maybe_pose_polish(params, spec, cfg, obs, res, cube_radius, pose_known)
    return res, pack_result(res)


def _round_up_pow2(n: int, lo: int = 1) -> int:
    k = lo
    while k < n:
        k *= 2
    return k


def staged_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
    stage1_iters: Optional[int] = None,
) -> OptResult:
    """Two-stage batched solve: run everyone `stage1_iters`, then continue
    ONLY the lanes that neither converged nor failed, padded to a power of
    two (bounds compile variants). Per-lane math is identical to the
    single-stage solver — the reference's per-fruit early exit
    (`optimizer.py:276-292`) just stops billing converged lanes for the
    slowest lane's remaining iterations. Convergence iteration counts spread
    widely in practice (17-50 on the bench workload), so this recovers
    ~25-35% of the batch wall time.
    """
    B = latent0.shape[0]
    m1 = stage1_iters if stage1_iters is not None else max(cfg.max_iter // 2, 1)
    if m1 >= cfg.max_iter or B <= 1:
        return shape_pose_joint_opt_batched(
            params, spec, cfg, obs, latent0, T_ow0, cube_radius, pose_known
        )
    cfg1 = dataclasses.replace(cfg, max_iter=m1)
    r1 = shape_pose_joint_opt_batched(
        params, spec, cfg1, obs, latent0, T_ow0, cube_radius, pose_known
    )
    # only the per-lane flags cross to the host (a few bytes) — the stage-2
    # lane gather runs on device, so the observation buffers never round-trip
    # the (slow) host link
    live = np.asarray(~(r1.converged | r1.failed))
    idx = np.nonzero(live)[0]
    if idx.size == 0:
        return r1
    Bp = _round_up_pow2(int(idx.size))
    pad_idx = jnp.asarray(np.concatenate([idx, np.repeat(idx[:1], Bp - idx.size)]))
    take = lambda a: a[pad_idx]
    obs2 = jax.tree_util.tree_map(take, obs)
    r2 = _continue_joint_opt_batched(
        params, spec, cfg, obs2, take(r1.latent), take(r1.T_ow),
        cube_radius, pose_known, m1,
    )

    idx_dev = jnp.asarray(idx)

    def merge(a1, a2):
        return a1.at[idx_dev].set(a2[: idx.size])

    return OptResult(
        merge(r1.latent, r2.latent),
        merge(r1.T_ow, r2.T_ow),
        merge(r1.iter_count, r2.iter_count),
        merge(r1.failed, r2.failed),
        merge(r1.converged, r2.converged),
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known"))
def shape_pose_joint_opt_traced(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
) -> Tuple[OptResult, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Like `shape_pose_joint_opt`, but also returns the full per-iteration
    trajectory (latents [max_iter, C], poses [max_iter, 4, 4]) via a
    fixed-length `lax.scan`. This feeds the interactive visualizer's
    per-iteration mesh evolution (the reference re-meshes inside the LM loop
    when `vis_on`, `optimizer.py:268-271`) without ever syncing the device
    mid-solve; the trajectory replays host-side after the solve."""

    def step(s: OptState, _):
        new = lm_iteration(params, spec, cfg, obs, s, cube_radius, pose_known)
        new = _freeze_if_done(s, new)
        return new, (new.latent, new.T_ow)

    final, traj = jax.lax.scan(step, init_state(latent0, T_ow0), None,
                               length=cfg.max_iter)
    return (
        OptResult(final.latent, final.T_ow, final.iter_count, final.failed,
                  final.converged),
        traj,
    )


def solve_in_chunks(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,
    latent0: jnp.ndarray,
    T_ow0: jnp.ndarray,
    cube_radius: float,
    pose_known: bool = False,
    max_batch: Optional[int] = None,
) -> OptResult:
    """Batched solve in HBM-safe chunks.

    With the fused render kernel the per-fruit HBM footprint is ~35 MB
    (sample coords in, per-ray residual/Jacobian blocks out — no dense
    activation grids), and per-lane convergence gating keeps ms/fruit flat
    in the batch size (measured 205/204/198 at B = 16/32/64 on the wild
    workload) — default 64-fruit chunks. The two-pass fallback path
    (fused off or unsupported decoder) materializes [B, F, R, M, D]
    activations (~230 MB/fruit at the wild workload), so it caps at 16.
    The final partial chunk is padded so every chunk reuses one compiled
    program.
    """
    if max_batch is None:
        max_batch = 64 if cfg.fused_resolved() else 16
    base_solver = coarse_to_fine_joint_opt if cfg.coarse_to_fine else shape_pose_joint_opt_batched

    def solver(params, spec, cfg, obs, lat, T, cube_radius, pose_known):
        res = base_solver(params, spec, cfg, obs, lat, T, cube_radius, pose_known)
        return maybe_pose_polish(params, spec, cfg, obs, res, cube_radius, pose_known)

    B = latent0.shape[0]
    if B <= max_batch:
        return solver(
            params, spec, cfg, obs, latent0, T_ow0, cube_radius, pose_known
        )
    outs = []
    for lo in range(0, B, max_batch):
        hi = min(lo + max_batch, B)
        sl = lambda a: a[lo:hi]
        obs_c = jax.tree_util.tree_map(sl, obs)
        lat_c, T_c = latent0[lo:hi], T_ow0[lo:hi]
        if hi - lo < max_batch:
            from hortimapping_tpu.parallel.sharding import pad_to_multiple

            obs_c, lat_c, T_c, n = pad_to_multiple(obs_c, lat_c, T_c, max_batch)
        res = solver(
            params, spec, cfg, obs_c, lat_c, T_c, cube_radius, pose_known
        )
        outs.append(jax.tree_util.tree_map(lambda a: a[: hi - lo], res))
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


@partial(jax.jit, static_argnames=("spec", "cfg"))
def shape_opt_deepsdf(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    points_o: jnp.ndarray,     # [P, 3] surface points already in object frame
    point_valid: jnp.ndarray,  # [P] bool
    latent0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DeepSDF baseline: shape-only optimization, pose frozen.

    Reference: `optimizer.py:306-429` (recon + codereg terms only, pose_dim=0).
    Returns (latent, iter_count).
    """
    C = latent0.shape[0]
    f32 = jnp.float32

    def body(state):
        latent, i, iters, done = state
        rec = sdf_residuals(params, spec, latent, points_o, point_valid, scale_on=False)
        jac_code = rec.jac[:, 6:]  # code block only (pose part unused)
        count = jnp.sum(point_valid).astype(f32)
        w2 = _robust_w2(rec.res, cfg.recon_robust_th_m, i >= cfg.robust_iter)
        H, b = _term_normal_eq(jac_code, rec.res, w2, count, cfg.w_recon)
        H = H + cfg.w_codereg * jnp.eye(C, dtype=f32)          # optimizer.py:371-372
        b = b - cfg.w_codereg * latent
        if cfg.lm_on:
            if cfg.lm_eye:
                H = H + cfg.lm_lambda_0 * jnp.max(jnp.diag(H)) * jnp.eye(C, dtype=f32)
            else:
                H = H + cfg.lm_lambda_0 * jnp.diag(jnp.diag(H))
        delta_c = jnp.linalg.solve(H, b)
        latent_new = latent + delta_c
        past = i > 1
        conv = ((jnp.max(jnp.abs(b)) < cfg.epsilon_g) & past) | (
            (jnp.max(jnp.abs(delta_c / (latent_new + 1e-12))) < cfg.epsilon_c) & past
        )
        done_new = conv | (i >= cfg.max_iter - 1)
        frozen = done
        return (
            jnp.where(frozen, latent, latent_new),
            i + 1,
            jnp.where(frozen, iters, i + 1),
            done | done_new,
        )

    def cond(state):
        return jnp.any(~state[3])

    latent, _, iters, _ = jax.lax.while_loop(
        cond, body, (latent0, jnp.int32(0), jnp.int32(0), jnp.asarray(False))
    )
    return latent, iters


@partial(jax.jit, static_argnames=("spec", "cfg"))
def shape_opt_deepsdf_batched(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    points_o: jnp.ndarray,     # [B, P, 3]
    point_valid: jnp.ndarray,  # [B, P] bool
    latent0: jnp.ndarray,      # [B, C]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All fruits' DeepSDF-baseline solves in one vmapped while_loop (the
    per-fruit sequential loop of `run_shape_completion_challenge.py:207-218`
    batched away, like `shape_pose_joint_opt_batched` for the joint opt).
    Returns (latents [B, C], iter counts [B])."""
    C = latent0.shape[-1]
    f32 = jnp.float32

    def body(state):
        latent, i, iters, done = state

        def lane(lat, pts, pv, lane_done):
            rec = sdf_residuals(params, spec, lat, pts, pv, scale_on=False)
            jac_code = rec.jac[:, 6:]
            count = jnp.sum(pv).astype(f32)
            w2 = _robust_w2(rec.res, cfg.recon_robust_th_m, i >= cfg.robust_iter)
            H, b = _term_normal_eq(jac_code, rec.res, w2, count, cfg.w_recon)
            H = H + cfg.w_codereg * jnp.eye(C, dtype=f32)
            b = b - cfg.w_codereg * lat
            if cfg.lm_on:
                if cfg.lm_eye:
                    H = H + cfg.lm_lambda_0 * jnp.max(jnp.diag(H)) * jnp.eye(C, dtype=f32)
                else:
                    H = H + cfg.lm_lambda_0 * jnp.diag(jnp.diag(H))
            delta_c = jnp.linalg.solve(H, b)
            lat_new = lat + delta_c
            past = i > 1
            conv = ((jnp.max(jnp.abs(b)) < cfg.epsilon_g) & past) | (
                (jnp.max(jnp.abs(delta_c / (lat_new + 1e-12))) < cfg.epsilon_c) & past
            )
            return jnp.where(lane_done, lat, lat_new), conv | (i >= cfg.max_iter - 1)

        lat_new, done_new = jax.vmap(lane)(latent, points_o, point_valid, done)
        return (
            lat_new,
            i + 1,
            jnp.where(done, iters, i + 1),
            done | done_new,
        )

    def cond(state):
        return jnp.any(~state[3])

    B = latent0.shape[0]
    latent, _, iters, _ = jax.lax.while_loop(
        cond, body,
        (latent0, jnp.int32(0), jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
    )
    return latent, iters
