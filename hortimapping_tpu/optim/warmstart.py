"""Latent warm starts: retrieval init + multi-start selection.

The reference initializes every fruit's latent from the MEAN of the trained
latent-code table (`/root/reference/test_wild_completion.py:46-47`,
`run_shape_completion_challenge.py:74-77`) — the blandest shape the category
knows. On partially observed fruits the LM solve then has to carry the code
all the way from the category mean to the observed shape within its
iteration budget, and the unobserved side of the fruit is completed from
whatever shape the trajectory reaches, not from the best prior shape.

TPU-native alternative (no reference equivalent): the trained latent table
(919 codes for the reference pepper category, `LatentCodes/latest.pth`) is a
dense sample of plausible fruit shapes, and the decoder is cheap — so score
EVERY code against the observed partial cloud in one batched forward pass
and start from the best match. Scoring all 919 codes x 256 points is a
single [B*N*P, C+3] decoder batch — ideal MXU shape, a few milliseconds on
one chip; the reference could never afford this per fruit in torch-eager.

Scoring covers the FULL (code x scale) grid — mean |clamped sdf| over a
point subsample at each of S candidate pose scales — because prefiltering
codes at one scale drops the right code observed at the wrong scale. The
best (code, scale) pair seeds the solve; scale enters as a scale-only Sim(3)
factor composed onto the pose init.

`multi_start` solves the joint optimization from the top-K retrieved starts
in one widened batch and keeps, per fruit, the result with the lowest final
objective value (the LM objective itself, so selection matches what the
solver minimizes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hortimapping_tpu.config import JointOptConfig
from hortimapping_tpu.models.decoder import DecoderSpec, Params, decoder_apply
from hortimapping_tpu.optim.state import FruitObservations, OptResult

# Per-lane evidence of the most recent selective_rescue dispatch (cleared at
# every warmstart_solve). The rescue studies (tools/reference_head2head_lab
# --variant ..._rsN) attach this to their JSON dumps; a module global keeps
# the pipeline return signatures unchanged for a diagnostics-only payload.
LAST_RESCUE_INFO: dict = {}


def _score_codes(
    params: Params,
    spec: DecoderSpec,
    codes: jnp.ndarray,    # [N, C]
    points: jnp.ndarray,   # [P, 3] object-frame points (scaled candidates)
    valid: jnp.ndarray,    # [P] bool
    bf16: bool = False,
    block_elems: int = 1 << 15,
) -> jnp.ndarray:
    """Mean |clamped sdf| of each code over the observed points. [N].

    `bf16` runs the scoring matmuls at the MXU native rate — scores only
    RANK candidates, and the clamped 256-point mean averages the rounding
    noise well below the code-to-code score spread (validated on the wild
    probe: identical CD to f32 scoring at half the cost).

    Large code tables are scored in blocks: under the (fruit x scale) vmaps
    the full-table activation is [B, S, N*P, hidden] — a freshly trained
    512-code table at 256 pts is f32[12,5,131072,512] = 15 GB, an OOM on
    the 16 GB HBM (measured, round 4 trainer gate). Blocks of
    `block_elems / P` codes bound the peak; N*P <= block_elems keeps the
    original single-matmul fast path (the shipped 64-919-code tables)."""
    N, C = codes.shape
    P = points.shape[0]
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    def score_block(blk):                                  # [Nb, C] -> [Nb]
        nb = blk.shape[0]
        inp = jnp.concatenate(
            [
                jnp.broadcast_to(blk[:, None, :], (nb, P, C)),
                jnp.broadcast_to(points[None, :, :], (nb, P, 3)),
            ],
            axis=-1,
        )
        sdf = decoder_apply(params, spec, inp.reshape(nb * P, C + 3),
                            compute_dtype=dtype).astype(jnp.float32).reshape(nb, P)
        # clamp: far-off codes saturate at the clamping distance instead of
        # dominating the mean through tanh tails
        err = jnp.minimum(jnp.abs(sdf), spec.clamping_distance)
        count = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(err * valid[None, :], axis=1) / count

    if N * P <= block_elems:
        return score_block(codes)
    nb_sz = max(1, block_elems // P)
    nblk = -(-N // nb_sz)
    pad = nblk * nb_sz - N
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.broadcast_to(codes[-1:], (pad, C))])
    out = jax.lax.map(score_block, codes.reshape(nblk, nb_sz, C))
    return out.reshape(-1)[:N]


@partial(jax.jit, static_argnames=("spec", "top_k", "n_score_pts", "n_scales",
                                   "scale_min", "scale_max", "score_bf16",
                                   "prior_w", "score_chunk"))
def retrieval_init_batched(
    params: Params,
    spec: DecoderSpec,
    latent_table: jnp.ndarray,   # [N, C] trained codes
    points_w: jnp.ndarray,       # [B, P, 3] observed cloud, world frame
    point_valid: jnp.ndarray,    # [B, P] bool
    top_k: int = 8,
    n_score_pts: int = 256,
    n_scales: int = 5,
    scale_min: float = 0.85,
    scale_max: float = 1.2,
    T_init: Optional[jnp.ndarray] = None,   # [B, 4, 4] pose init (None = identity)
    score_bf16: bool = False,
    prior_w: float = 0.0,
    score_chunk: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Retrieve the best (code, scale) start per fruit.

    With `T_init=None` the observed points are assumed to be approximately in
    the decoder's object frame already (identity pose init — the challenge
    setting, `run_shape_completion_challenge.py:207-210`). Posed pipelines
    pass their per-fruit pose init `T_init`; points are transformed into the
    object frame first and the retrieved scale COMPOSES onto it. Returns:

      latent0   [B, C]     best code per fruit
      T_ow0     [B, 4, 4]  scale-only Sim(3) refinement @ T_init
      top_codes [B, K, C]  the top-K codes (multi-start candidates)
      top_T     [B, K, 4, 4] their per-candidate scale inits (composed)
    """
    N, C = latent_table.shape
    f32 = jnp.float32
    scales = jnp.linspace(scale_min, scale_max, n_scales, dtype=f32)
    if T_init is None:
        T_init = jnp.broadcast_to(jnp.eye(4, dtype=f32),
                                  points_w.shape[:1] + (4, 4))

    def per_fruit(pts_w, pv, T_i):
        pts = pts_w @ T_i[:3, :3].T + T_i[:3, 3]
        sub = pts[:n_score_pts]
        sub_v = pv[:n_score_pts]
        # score the FULL (code x scale) grid — prefiltering codes at one
        # scale would drop the right code observed at the wrong scale (the
        # candidate set must not assume the answer). T_ow scale sigma maps
        # world->object as x_o = sigma * x_w, so a fruit larger than
        # canonical scores best at sigma < 1.
        def at_scale(sig):
            return _score_codes(params, spec, latent_table, sig * sub, sub_v,
                                bf16=score_bf16)

        if N * n_score_pts <= 1 << 15:
            s = jax.vmap(at_scale)(scales)                # [S, N]
        else:
            # large tables: serialize the scale axis too — vmapping it
            # multiplies the blocked scoring activation by n_scales
            s = jax.lax.map(at_scale, scales)             # [S, N]
        if prior_w > 0.0:
            # shrink toward the table mean: under weak observability many
            # codes fit the visible patch while the unobserved side is
            # unconstrained — hedge toward the safest prior (prior_w -> inf
            # recovers the reference's mean init)
            mean_code = jnp.mean(latent_table, axis=0)
            dist = jnp.linalg.norm(latent_table - mean_code[None, :],
                                   axis=1) / jnp.sqrt(jnp.float32(C))
            s = s + prior_w * dist[None, :]
        per_code = jnp.min(s, axis=0)                     # [N] best over scales
        _, top_idx = jax.lax.top_k(-per_code, top_k)      # K best codes
        s_top = s[:, top_idx]                             # [S, K]
        flat = jnp.argmin(s_top)
        si, ki = flat // top_k, flat % top_k
        cand = latent_table[top_idx]                      # [K, C]
        best_scale_per_k = scales[jnp.argmin(s_top, axis=0)]  # [K]

        def scale_T(sig):
            return jnp.diag(jnp.array([sig, sig, sig, 1.0], f32)) @ T_i

        return (
            cand[ki],
            scale_T(scales[si]),
            cand,
            jax.vmap(scale_T)(best_scale_per_k),
        )

    B = points_w.shape[0]
    if B <= score_chunk:
        return jax.vmap(per_fruit)(points_w, point_valid, T_init)
    # Large batches: a full-batch scoring vmap materializes a
    # [B, S, N*P, hidden] activation that can exceed the 16 GB HBM
    # (B=64 x 3 scales x 256 codes x 128 pts x 512 wide = 6 GB bf16, and
    # XLA holds two copies — measured OOM on v5e). Serialize the fruit axis
    # in score_chunk-wide blocks with lax.map (CLAUDE.md pattern): peak
    # activation scales with the chunk, wall time stays matmul-bound.
    nb = -(-B // score_chunk)
    pad = nb * score_chunk - B

    def blockify(a):
        if pad:
            a = jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
        return a.reshape((nb, score_chunk) + a.shape[1:])

    out = jax.lax.map(
        lambda xs: jax.vmap(per_fruit)(*xs),
        (blockify(points_w), blockify(point_valid), blockify(T_init)),
    )
    return jax.tree_util.tree_map(
        lambda a: a.reshape((nb * score_chunk,) + a.shape[2:])[:B], out)


def maybe_retrieval_init(
    params: Params,
    spec: DecoderSpec,
    opt_cfg: JointOptConfig,
    latent_table: jnp.ndarray,   # [N, C] trained codes
    obs: FruitObservations,      # leading fruit axis
    latent0: jnp.ndarray,        # [B, C] fallback (table-mean) init
    T_ow0: jnp.ndarray,          # [B, 4, 4] pose init
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pipeline-facing init dispatch: with `opt.tpu.init_mode: retrieval`
    the per-fruit (code, scale) start replaces the reference's table-mean
    init (`test_wild_completion.py:46-47`); otherwise the inputs pass
    through unchanged. One call site per pipeline keeps the config knobs
    (`retrieval_*`) wired identically everywhere."""
    if opt_cfg.init_mode != "retrieval":
        return latent0, T_ow0
    lat, T, _, _ = retrieval_init_batched(
        params, spec, latent_table, obs.points_w, obs.point_valid,
        top_k=opt_cfg.retrieval_top_k,
        n_score_pts=opt_cfg.retrieval_score_pts,
        n_scales=opt_cfg.retrieval_n_scales,
        scale_min=opt_cfg.retrieval_scale_min,
        scale_max=opt_cfg.retrieval_scale_max,
        T_init=T_ow0,
        score_bf16=opt_cfg.retrieval_score_bf16,
        prior_w=opt_cfg.retrieval_prior_w,
    )
    return lat, T


def warmstart_solve(
    params: Params,
    spec: DecoderSpec,
    opt_cfg: JointOptConfig,
    latent_table: jnp.ndarray,   # [N, C] trained codes
    obs: FruitObservations,      # leading fruit axis
    latent0: jnp.ndarray,        # [B, C] fallback (table-mean) init
    T_ow0: jnp.ndarray,          # [B, 4, 4] pose init
    cube_radius: float,
    pose_known: bool = False,
) -> OptResult:
    """Init dispatch + solve for every posed batched pipeline: retrieval
    warm start (`opt.tpu.init_mode: retrieval`), optional multi-start over
    the top-K retrieved codes (`opt.tpu.multi_start > 1`), then the
    configured solver (`solve_in_chunks` routes coarse-to-fine /
    trust-region per config). One shared call site keeps the knobs wired
    identically in challenge/lab/greenhouse/wild — a knob only honored by
    one pipeline would make cross-family probe comparisons silently
    meaningless."""
    from hortimapping_tpu.optim.lm import solve_in_chunks

    top_codes = top_T = None
    T_orig = T_ow0  # pre-retrieval pose inits (the rescue re-retrieves from
    # these, not from the scale-composed ones, to avoid double-composition)
    if opt_cfg.init_mode == "retrieval":
        latent0, T_ow0, top_codes, top_T = retrieval_init_batched(
            params, spec, latent_table, obs.points_w, obs.point_valid,
            top_k=opt_cfg.retrieval_top_k,
            n_score_pts=opt_cfg.retrieval_score_pts,
            n_scales=opt_cfg.retrieval_n_scales,
            scale_min=opt_cfg.retrieval_scale_min,
            scale_max=opt_cfg.retrieval_scale_max,
            T_init=T_ow0,
            score_bf16=opt_cfg.retrieval_score_bf16,
            prior_w=opt_cfg.retrieval_prior_w,
        )
    if top_codes is not None and opt_cfg.multi_start > 1:
        K = min(opt_cfg.multi_start, opt_cfg.retrieval_top_k)
        return multi_start_joint_opt(
            params, spec, opt_cfg, obs, top_codes[:, :K], top_T[:, :K],
            cube_radius, pose_known=pose_known,
        )
    global LAST_RESCUE_INFO
    LAST_RESCUE_INFO = {}
    res = solve_in_chunks(
        params, spec, opt_cfg, obs, latent0, T_ow0, cube_radius,
        pose_known=pose_known,
    )
    if opt_cfg.rescue_starts > 0 and opt_cfg.init_mode == "retrieval":
        res, info = selective_rescue(
            params, spec, opt_cfg, obs, res, latent_table, T_orig,
            cube_radius, pose_known=pose_known,
        )
        LAST_RESCUE_INFO = info
    return res


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius", "pose_known",
                                   "top_k", "n_score_pts", "n_scales",
                                   "scale_min", "scale_max", "score_bf16"))
def retrieval_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    latent_table: jnp.ndarray,
    obs: FruitObservations,   # leading fruit axis
    T_init: jnp.ndarray,      # [B, 4, 4]
    cube_radius: float,
    pose_known: bool = False,
    top_k: int = 8,
    n_score_pts: int = 256,
    n_scales: int = 5,
    scale_min: float = 0.85,
    scale_max: float = 1.2,
    score_bf16: bool = False,
) -> OptResult:
    """Retrieval warm start + the configured solver in ONE jitted program.

    The separate `retrieval_init_batched` + solve calls each pay a dispatch
    round trip over a remote-TPU link (~3 ms/fruit measured on the 16-fruit
    bench); fusing them makes the warm-started solve cost exactly one
    dispatch, like the plain solve."""
    from hortimapping_tpu.optim.lm import (
        coarse_to_fine_joint_opt,
        maybe_pose_polish,
        shape_pose_joint_opt_batched,
    )

    lat_r, T_r, _, _ = retrieval_init_batched(
        params, spec, latent_table, obs.points_w, obs.point_valid,
        top_k=top_k, n_score_pts=n_score_pts, n_scales=n_scales,
        scale_min=scale_min, scale_max=scale_max, T_init=T_init,
        score_bf16=score_bf16,
        prior_w=cfg.retrieval_prior_w,
    )
    solver = (coarse_to_fine_joint_opt if cfg.coarse_to_fine
              else shape_pose_joint_opt_batched)
    res = solver(params, spec, cfg, obs, lat_r, T_r, cube_radius, pose_known)
    # keep this fused path behaviorally identical to joint_opt_packed /
    # solve_in_chunks: a config with pose_polish_iters > 0 must polish here
    # too, or tool-vs-pipeline measurements silently diverge
    return maybe_pose_polish(params, spec, cfg, obs, res, cube_radius,
                             pose_known)


@partial(jax.jit, static_argnames=("spec", "cfg", "cube_radius"))
def objective_value_batched(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,   # leading fruit axis
    latent: jnp.ndarray,      # [B, C]
    T_ow: jnp.ndarray,        # [B, 4, 4]
    cube_radius: float,
) -> jnp.ndarray:
    """The LM objective at (latent, T_ow) per fruit, with the Huber robust
    weighting active (post-ramp-in) — the selection metric for multi-start.
    Failed lanes (no valid rays) score +inf."""
    from hortimapping_tpu.optim.lm import _assemble_normal_equations

    def one(o, l, T):
        _, _, failed, cost = _assemble_normal_equations(
            params, spec, cfg, o, l, T, jnp.int32(2 ** 20), cube_radius
        )
        return jnp.where(failed, jnp.inf, cost)

    return jax.vmap(one)(obs, latent, T_ow)


def selective_rescue(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,      # leading fruit axis [B, ...]
    res: OptResult,              # the normal solve's result
    latent_table: jnp.ndarray,   # [N, C]
    T_init: jnp.ndarray,         # [B, 4, 4] ORIGINAL pose inits (pre-retrieval)
    cube_radius: float,
    pose_known: bool = False,
) -> Tuple[OptResult, dict]:
    """Re-dispatch ONLY the hard lanes as a K-start batch; keep the better.

    The TPU's structural advantage over the reference here is that K extra
    starts cost one widened vmapped batch, not K sequential solves — but a
    blanket multi-start over every lane was a wash on the challenge config
    (docs/PERF.md round 3). This aims it: after the normal solve, a lane is
    re-dispatched iff it ran out of budget (`converged == False`) or its
    final LM objective is a robust outlier among the batch
    (log-cost > median + `rescue_cost_z` * 1.4826 MAD) — the
    unconverged/ill-conditioned lanes that decide the hard modes. Each
    rescued lane re-solves from its top-`rescue_starts` retrieved
    (code, scale-composed init) candidates in one widened batch
    (`multi_start_joint_opt`), and the rescue replaces the original result
    ONLY where its final objective is strictly lower — lanes the rescue
    cannot improve keep their original estimate, so the mode can never get
    worse under the solver's own metric. No reference equivalent (the
    reference solves once from the table mean, `test_wild_completion.py:
    46-47`, and could not afford per-fruit multi-start in torch-eager).

    Returns (result, info) — info carries per-lane evidence for the
    rescue studies: which lanes dispatched, objectives before/after,
    which accepted.
    """
    B = res.latent.shape[0]
    costs = np.asarray(objective_value_batched(
        params, spec, cfg, obs, res.latent, res.T_ow, cube_radius))
    failed = np.asarray(res.failed)
    converged = np.asarray(res.converged)

    finite = np.isfinite(costs) & ~failed
    logc = np.log(np.maximum(costs, 1e-30), where=finite,
                  out=np.zeros_like(costs))
    med = np.median(logc[finite]) if finite.any() else 0.0
    mad = np.median(np.abs(logc[finite] - med)) if finite.any() else 0.0
    outlier = finite & (logc > med + cfg.rescue_cost_z * 1.4826 * mad)
    hard = ~failed & (~converged | outlier)
    idx = np.nonzero(hard)[0]
    info = {
        "n_total": int(B), "n_rescued": int(len(idx)),
        "lanes": idx.tolist(),
        "unconverged": np.nonzero(~failed & ~converged)[0].tolist(),
        "outliers": np.nonzero(outlier)[0].tolist(),
        "cost_before": costs[idx].tolist(),
    }
    if len(idx) == 0:
        return res, info

    # pad the rescue batch to a power of two so repeated evals reuse a few
    # compiled shapes instead of one per distinct hard-lane count
    n_pad = 1 << (len(idx) - 1).bit_length()
    idx_pad = np.concatenate(
        [idx, np.full(n_pad - len(idx), idx[-1], idx.dtype)])
    take = jnp.asarray(idx_pad)
    obs_r = jax.tree_util.tree_map(lambda a: a[take], obs)

    K = max(2, cfg.rescue_starts)
    _, _, top_codes, top_T = retrieval_init_batched(
        params, spec, latent_table, obs_r.points_w, obs_r.point_valid,
        top_k=K, n_score_pts=cfg.retrieval_score_pts,
        n_scales=cfg.retrieval_n_scales,
        scale_min=cfg.retrieval_scale_min,
        scale_max=cfg.retrieval_scale_max,
        T_init=jnp.asarray(T_init)[take],
        score_bf16=cfg.retrieval_score_bf16,
        prior_w=cfg.retrieval_prior_w,
    )
    res_r = multi_start_joint_opt(
        params, spec, cfg, obs_r, top_codes, top_T, cube_radius,
        pose_known=pose_known,
    )
    cost_r = np.asarray(objective_value_batched(
        params, spec, cfg, obs_r, res_r.latent, res_r.T_ow, cube_radius))

    accept = (cost_r[:len(idx)] < costs[idx]) & ~np.asarray(
        res_r.failed)[:len(idx)]
    info["cost_after"] = cost_r[:len(idx)].tolist()
    info["accepted"] = np.nonzero(accept)[0].tolist()
    if not accept.any():
        return res, info

    sel = jnp.asarray(idx[accept])
    src = jnp.asarray(np.nonzero(accept)[0])

    def scatter(a, b):
        return a.at[sel].set(b[src])

    return jax.tree_util.tree_map(scatter, res, res_r), info


def multi_start_joint_opt(
    params: Params,
    spec: DecoderSpec,
    cfg: JointOptConfig,
    obs: FruitObservations,     # leading fruit axis [B, ...]
    starts_latent: jnp.ndarray,  # [B, K, C]
    starts_T: jnp.ndarray,       # [B, K, 4, 4]
    cube_radius: float,
    pose_known: bool = False,
) -> OptResult:
    """Solve from K starts per fruit in one widened [B*K] batch; keep the
    lowest-final-objective result per fruit.

    The extra work is K-1 additional lanes in an already-batched program —
    on TPU the marginal cost is far below K x (per-lane convergence gating
    freezes easy lanes early). Selection by the full LM objective at each
    lane's final state breaks ties exactly the way the solver itself would.
    """
    from hortimapping_tpu.optim.lm import solve_in_chunks

    B, K, C = starts_latent.shape
    obs_rep = jax.tree_util.tree_map(
        lambda a: jnp.repeat(a, K, axis=0), obs
    )  # [B*K, ...] fruit-major: lanes b*K..b*K+K-1 share fruit b's buffers
    res = solve_in_chunks(
        params, spec, cfg, obs_rep,
        starts_latent.reshape(B * K, C), starts_T.reshape(B * K, 4, 4),
        cube_radius, pose_known,
    )
    costs = objective_value_batched(
        params, spec, cfg, obs_rep, res.latent, res.T_ow, cube_radius
    )
    costs = jnp.where(res.failed, jnp.inf, costs).reshape(B, K)
    best = jnp.argmin(costs, axis=1)                      # [B]
    pick = best + jnp.arange(B) * K

    return jax.tree_util.tree_map(lambda a: a[pick], res)
