"""Config system: YAML files byte-compatible with the reference schema.

The reference reads raw nested YAML dicts with string keys and float() casts
at point of use (`/root/reference/wild_completion/optimizer.py:31-53`,
`configs/*.yaml`). Here the same YAML schema loads into a typed, frozen
dataclass that doubles as the static (hashable) configuration of the jitted
LM optimizer — so changing a weight or tolerance recompiles exactly one
program, and shapes (frame/ray/sample/point counts) are compile-time
constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


class ForceKeyErrorDict(dict):
    """Dict that raises on missing keys and supports attribute access
    (reference `ForceKeyErrorDict`, `wild_completion/utils.py:524-532`)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


def _wrap(obj):
    if isinstance(obj, dict):
        return ForceKeyErrorDict({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def get_configs(path: str) -> ForceKeyErrorDict:
    """Load a JSON (or YAML) config into nested ForceKeyErrorDicts
    (reference `get_configs`, `wild_completion/utils.py:535-539`)."""
    import json

    with open(path) as f:
        data = json.load(f) if path.endswith(".json") else yaml.safe_load(f)
    return _wrap(data)


@dataclasses.dataclass(frozen=True)
class JointOptConfig:
    """Static configuration of the joint shape+pose LM optimization.

    Mirrors the `opt:` block of the reference YAML schema
    (e.g. `configs/wild_pepper.yaml:19-59`).
    """

    # Sim(3) vs SE(3)
    scale_on: bool = True
    # Levenberg-Marquardt
    lm_on: bool = True
    lm_eye: bool = False
    lm_lambda_0: float = 0.1
    s_damp: float = 1e-3
    # damped rotation tangents (TPU extension, `opt.tpu`; no reference
    # equivalent). Same mechanism as the reference's scale damping
    # (`optimizer.py:217-218`) applied to rotation: under the paper's wild
    # workload yaw about the fruit's stem axis is near-unobservable and BOTH
    # solvers trade it for shape fit, ending with ~4x the initial rotation
    # error (docs/PERF.md round-4 pose-noise study). `yaw_damp` anchors the
    # object-frame w_y tangent (the stem/symmetry axis, the reference's
    # init-rot axis — `utils.py:447-457`) near the init; `rot_damp` damps
    # all three rotation tangents. 0 = off (reference behavior).
    yaw_damp: float = 0.0
    rot_damp: float = 0.0
    # pose initial guess
    pose_init_rot_on: bool = True
    pose_init_scale_on: bool = True
    # reconstruction (3D SDF) term
    recon_n_pts: int = 2000
    recon_cluster_dist_m: float = 0.01
    recon_robust_th_m: float = 0.01
    # render term
    n_fg_pix: int = 200
    n_bg_pix: int = 200
    n_bg_pad: int = 20
    n_frame: int = 10
    n_sample_on_ray: int = 30
    log_sdf_occ: bool = True
    occ_cutoff_m: float = 0.01
    occlusion_on: bool = True
    render_robust_th_m: float = 0.05
    # term weights
    w_recon: float = 1.0
    w_depth: float = 5e-2
    w_mask: float = 5e-4
    w_codereg: float = 5e-4
    # convergence
    max_iter: int = 50
    epsilon_g: float = 1e-4
    epsilon_c: float = 1e-2
    epsilon_t: float = 1e-3
    epsilon_r: float = 1.0
    epsilon_s: float = 1e-3
    robust_iter: int = 5
    # adaptive trust-region damping (non-parity mode; optim/lm.py
    # lm_iteration_tr). False = the reference's fixed lambda_0
    # (`optimizer.py:220-225`). Same residuals/weights/convergence tests;
    # per-lane lambda adapts by deferred step acceptance, converging the
    # slow tail in far fewer iterations.
    # lambda evolves by Nielsen's gain-ratio rule (shrink by
    # max(1/3, 1-(2*rho-1)^3) on accept, grow by a doubling nu on reject),
    # clamped to [tr_lambda_min, tr_lambda_max]
    trust_region: bool = False
    tr_lambda_min: float = 1e-6
    tr_lambda_max: float = 1e5
    # objective-driven stop (TR mode only): an ACCEPTED step whose relative
    # objective improvement falls below this rate ends the lane. The
    # reference's epsilon_c/epsilon_g tests are tuned for fixed-lambda step
    # sizes and fire far too late under adaptive damping.
    tr_cost_rtol: float = 5e-3
    # two-resolution solve (optim/lm.py coarse_to_fine_joint_opt): phase A on
    # a subsampled problem (~8x cheaper/iter at the defaults), phase B at
    # full resolution. No reference equivalent; measured faster AND more
    # accurate than single-phase on the wild bench workload.
    coarse_to_fine: bool = False
    coarse_frame_stride: int = 2
    coarse_ray_frac: float = 0.5
    coarse_sample_frac: float = 0.5
    coarse_pts_frac: float = 0.5
    coarse_max_iter: int = 0  # 0 = inherit max_iter
    fine_max_iter: int = 0    # 0 = inherit max_iter
    # annealed scale damping: s_damp override for the COARSE phase only
    # (0 = inherit s_damp, like coarse_max_iter). The coarse phase's
    # subsampled objective is the noisiest part of the schedule; holding
    # scale near the init there and releasing it for the full-resolution
    # polish is the annealed variant of the reference's constant scale
    # damping (`optimizer.py:217-218`).
    coarse_s_damp: float = 0.0
    # fine-phase subsampling (defaults = full resolution, the validated
    # round-2 behavior). Fractions < 1 make phase B polish on a subsampled
    # problem too — worth it only where held-out validation proves the
    # quality holds (the wild bench workload; see docs/PERF.md round 3).
    fine_frame_stride: int = 1
    fine_ray_frac: float = 1.0
    fine_sample_frac: float = 1.0
    fine_pts_frac: float = 1.0
    # fused-kernel rays-per-tile for the COARSE phase only (0 = inherit
    # fused_tr). The coarse phase's sample axis is ~3x shorter, so a larger
    # ray tile keeps the kernel's matmul shapes efficient within the same
    # VMEM budget.
    coarse_fused_tr: int = 0
    # latent warm start (optim/warmstart.py): "mean" = the reference's
    # mean-of-latent-table init (`test_wild_completion.py:46-47`);
    # "retrieval" scores every trained code against the observed partial
    # cloud and starts from the best (code, scale) pair. multi_start > 1
    # additionally solves from the top-K retrieved starts in one widened
    # batch and keeps the lowest-final-objective result per fruit.
    init_mode: str = "mean"
    retrieval_top_k: int = 8
    retrieval_score_pts: int = 256
    retrieval_n_scales: int = 5
    retrieval_scale_min: float = 0.85
    retrieval_scale_max: float = 1.2
    # bf16 scoring matmuls: half the scoring cost; rank-only use tolerates
    # the rounding (wild probe: CD 0.486 vs 0.481 mm at ~1.6 vs ~7.5
    # ms/fruit of scoring)
    retrieval_score_bf16: bool = False
    # prior-shrinkage penalty: score += w * ||code - table_mean|| / sqrt(C).
    # Under weak observability (one-view partial clouds) many codes fit the
    # visible patch and the unobserved side is unconstrained; penalizing
    # distance from the table mean makes retrieval hedge toward the safest
    # prior instead of committing to an arbitrary well-fitting backside.
    # 0 = off; w -> inf recovers the reference's mean init.
    retrieval_prior_w: float = 0.0
    multi_start: int = 1
    # selective multi-start rescue (optim/warmstart.selective_rescue): after
    # the normal solve, lanes that ran out of budget or whose final LM
    # objective is a robust outlier (log-cost > median + rescue_cost_z *
    # 1.4826 MAD) re-solve from their top-`rescue_starts` retrieved starts
    # in one widened batch; the rescue replaces a lane only if its final
    # objective is strictly lower. 0 = off. Retrieval init only.
    rescue_starts: int = 0
    rescue_cost_z: float = 3.0
    # code-frozen pose polish after the joint solve (optim/lm.
    # pose_polish_batched): up to N extra LM iterations moving ONLY the
    # Sim(3)/SE(3) pose against the converged shape. 0 = off.
    pose_polish_iters: int = 0
    # outlier gates (applied by drivers after optimization)
    outlier_scale_min: float = 0.5
    outlier_scale_max: float = 1.25
    outlier_rot_max_deg: float = 60.0
    # TPU performance knobs (see ops/render.py RenderConfig):
    #   jac_cap: -1 = dense Jacobians, 0 = auto budget, > 0 explicit
    #   fwd_bf16: bfloat16 forward render pass
    #   use_pallas: None = auto (on when running on real TPU hardware —
    #   interpreter-mode kernels would only slow down CPU runs/tests)
    #   default dense (-1): the auto budget (0) can overflow when the
    #   |sdf|<occ_cutoff band exceeds 40% of the grid (large cutoffs,
    #   close-up frames) and silently drop band samples — opt into the
    #   capped path explicitly per config. The TPU hot path is the fused
    #   kernel anyway (exact dense-band math, no budget).
    jac_cap: int = -1
    fwd_cap: int = -1   # default dense: measured net-negative on v5e (gather
                        # + nonzero overhead exceeds the decode savings)
    fwd_bf16: bool = False
    use_pallas: Optional[bool] = None
    #   fused_render: None = auto (on on real TPU hardware) — single
    #   fully-fused Pallas kernel for the whole render term
    #   (ops/pallas_render.py); replaces the two-pass band pipeline
    fused_render: Optional[bool] = None
    fused_bf16: bool = True
    fused_tr: int = 16

    def pallas_resolved(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        import jax

        return jax.default_backend() == "tpu"

    def fused_resolved(self) -> bool:
        if self.fused_render is not None:
            return self.fused_render
        import jax

        return jax.default_backend() == "tpu"

    @property
    def jac_cap_resolved(self) -> int:
        if self.jac_cap == -1:
            return 0  # dense
        if self.jac_cap == 0:
            # auto: 40% of the sample grid — measured |sdf|<cutoff band
            # fraction is ~31% on the wild-pepper workload, so the budget
            # covers the band with margin while cutting the decoder VJP cost
            return (2 * self.n_rays * self.n_sample_on_ray) // 5
        return self.jac_cap

    @property
    def fwd_cap_resolved(self) -> int:
        if self.fwd_cap == -1:
            return 0  # dense
        if self.fwd_cap == 0:
            # auto: 55% of the grid — measured in-radius fraction is ~41%
            # on the wild-pepper workload; overflow degrades gracefully
            # (dropped samples are treated as out-of-radius)
            return (11 * self.n_rays * self.n_sample_on_ray) // 20
        return self.fwd_cap

    @property
    def pose_dim(self) -> int:
        return 7 if self.scale_on else 6

    @property
    def n_rays(self) -> int:
        return self.n_fg_pix + self.n_bg_pix

    @classmethod
    def from_dict(cls, cfg: Dict[str, Any]) -> "JointOptConfig":
        """Build from a reference-schema YAML dict (the `opt:` subtree of the
        full config, i.e. `cfg['opt']`)."""
        opt = cfg["opt"] if "opt" in cfg else cfg
        lm = opt.get("lm", {})
        pi = opt.get("pose_init", {})
        rec = opt.get("recon", {})
        ren = opt.get("render", {})
        w = opt.get("weight", {})
        cv = opt.get("converge", {})
        out = opt.get("outlier", {})
        tpu = opt.get("tpu", {})  # extension block, absent in reference YAMLs
        d = cls()  # defaults
        return cls(
            scale_on=bool(opt.get("scale_on", d.scale_on)),
            lm_on=bool(lm.get("lm_on", d.lm_on)),
            lm_eye=bool(lm.get("lm_eye", d.lm_eye)),
            lm_lambda_0=float(lm.get("lm_lambda_0", d.lm_lambda_0)),
            # opt.tpu.s_damp (solver-variant override, e.g. annealed scale
            # damping for warm-started solves) wins over the reference-schema
            # opt.lm.s_damp when both are present
            s_damp=float(tpu.get("s_damp", lm.get("s_damp", d.s_damp))),
            yaw_damp=float(tpu.get("yaw_damp", d.yaw_damp)),
            rot_damp=float(tpu.get("rot_damp", d.rot_damp)),
            pose_init_rot_on=bool(pi.get("rot_on", d.pose_init_rot_on)),
            pose_init_scale_on=bool(pi.get("scale_on", d.pose_init_scale_on)),
            recon_n_pts=int(rec.get("n_pts", d.recon_n_pts)),
            recon_cluster_dist_m=float(rec.get("cluster_dist_m", d.recon_cluster_dist_m)),
            recon_robust_th_m=float(rec.get("robust_th_m", d.recon_robust_th_m)),
            n_fg_pix=int(ren.get("n_fg_pix", d.n_fg_pix)),
            n_bg_pix=int(ren.get("n_bg_pix", d.n_bg_pix)),
            n_bg_pad=int(ren.get("n_bg_pad", d.n_bg_pad)),
            n_frame=int(ren.get("n_frame", d.n_frame)),
            n_sample_on_ray=int(ren.get("n_sample_on_ray", d.n_sample_on_ray)),
            log_sdf_occ=bool(ren.get("log_sdf_occ", d.log_sdf_occ)),
            occ_cutoff_m=float(ren.get("occ_cutoff_m", d.occ_cutoff_m)),
            occlusion_on=bool(ren.get("occlusion_on", d.occlusion_on)),
            render_robust_th_m=float(ren.get("robust_th_m", d.render_robust_th_m)),
            w_recon=float(w.get("w_recon", d.w_recon)),
            w_depth=float(w.get("w_depth", d.w_depth)),
            w_mask=float(w.get("w_mask", d.w_mask)),
            w_codereg=float(w.get("w_codereg", d.w_codereg)),
            max_iter=int(cv.get("max_iter", d.max_iter)),
            epsilon_g=float(cv.get("epsilon_g", d.epsilon_g)),
            epsilon_c=float(cv.get("epsilon_c", d.epsilon_c)),
            epsilon_t=float(cv.get("epsilon_t", d.epsilon_t)),
            epsilon_r=float(cv.get("epsilon_r", d.epsilon_r)),
            epsilon_s=float(cv.get("epsilon_s", d.epsilon_s)),
            robust_iter=int(opt.get("robust_iter", d.robust_iter)),
            trust_region=bool(tpu.get("trust_region", d.trust_region)),
            tr_lambda_min=float(tpu.get("tr_lambda_min", d.tr_lambda_min)),
            tr_lambda_max=float(tpu.get("tr_lambda_max", d.tr_lambda_max)),
            tr_cost_rtol=float(tpu.get("tr_cost_rtol", d.tr_cost_rtol)),
            coarse_to_fine=bool(tpu.get("coarse_to_fine", d.coarse_to_fine)),
            coarse_frame_stride=int(tpu.get("coarse_frame_stride", d.coarse_frame_stride)),
            coarse_ray_frac=float(tpu.get("coarse_ray_frac", d.coarse_ray_frac)),
            coarse_sample_frac=float(tpu.get("coarse_sample_frac", d.coarse_sample_frac)),
            coarse_pts_frac=float(tpu.get("coarse_pts_frac", d.coarse_pts_frac)),
            coarse_max_iter=int(tpu.get("coarse_max_iter", d.coarse_max_iter)),
            coarse_s_damp=float(tpu.get("coarse_s_damp", d.coarse_s_damp)),
            fine_max_iter=int(tpu.get("fine_max_iter", d.fine_max_iter)),
            fine_frame_stride=int(tpu.get("fine_frame_stride", d.fine_frame_stride)),
            fine_ray_frac=float(tpu.get("fine_ray_frac", d.fine_ray_frac)),
            fine_sample_frac=float(tpu.get("fine_sample_frac", d.fine_sample_frac)),
            fine_pts_frac=float(tpu.get("fine_pts_frac", d.fine_pts_frac)),
            coarse_fused_tr=int(tpu.get("coarse_fused_tr", d.coarse_fused_tr)),
            init_mode=str(tpu.get("init_mode", d.init_mode)),
            retrieval_top_k=int(tpu.get("retrieval_top_k", d.retrieval_top_k)),
            retrieval_score_pts=int(tpu.get("retrieval_score_pts", d.retrieval_score_pts)),
            retrieval_n_scales=int(tpu.get("retrieval_n_scales", d.retrieval_n_scales)),
            retrieval_scale_min=float(tpu.get("retrieval_scale_min", d.retrieval_scale_min)),
            retrieval_scale_max=float(tpu.get("retrieval_scale_max", d.retrieval_scale_max)),
            retrieval_score_bf16=bool(tpu.get("retrieval_score_bf16", d.retrieval_score_bf16)),
            retrieval_prior_w=float(tpu.get("retrieval_prior_w", d.retrieval_prior_w)),
            multi_start=int(tpu.get("multi_start", d.multi_start)),
            rescue_starts=int(tpu.get("rescue_starts", d.rescue_starts)),
            rescue_cost_z=float(tpu.get("rescue_cost_z", d.rescue_cost_z)),
            pose_polish_iters=int(tpu.get("pose_polish_iters", d.pose_polish_iters)),
            outlier_scale_min=float(out.get("scale_min", d.outlier_scale_min)),
            outlier_scale_max=float(out.get("scale_max", d.outlier_scale_max)),
            outlier_rot_max_deg=float(out.get("rot_max_deg", d.outlier_rot_max_deg)),
            jac_cap=int(tpu.get("jac_cap", d.jac_cap)),
            fwd_cap=int(tpu.get("fwd_cap", d.fwd_cap)),
            fwd_bf16=bool(tpu.get("fwd_bf16", d.fwd_bf16)),
            use_pallas=tpu.get("use_pallas", d.use_pallas),
            fused_render=tpu.get("fused_render", d.fused_render),
            fused_bf16=bool(tpu.get("fused_bf16", d.fused_bf16)),
            fused_tr=int(tpu.get("fused_tr", d.fused_tr)),
        )
