"""On-chip fused-kernel equivalence gate (VERDICT r3 task #4).

The 12-variant fused-vs-dense render parity suite (tests/test_fused_render.py)
runs in Pallas INTERPRET mode on CPU, where both paths agree exactly in f32;
on the real TPU the fused kernel (auto-on, config.py fused_resolved) was
previously validated only indirectly through end-to-end CD. This gate runs
both paths ON the chip and asserts three things on a wild-pepper-shaped
frame (400 rays, flagship 512-wide decoder):

  1. residual agreement by QUANTILE (median / p90 / fraction above 1e-3):
     on hardware the two paths can legitimately disagree on individual rays
     — Mosaic's tanh differs from XLA's by ~1e-4, so a sample with |sdf|
     within ~1e-4 of the occupancy cutoff flips its in-band indicator on
     one side only (the reference's own band test, loss.py:66-68, is
     exactly this discontinuous) — so a max-abs assert would gate on noise;
  2. agreement of the assembled normal equations (relative Frobenius deltas
     of H = J^T J / n and b = J^T r / n per term) — what the LM step
     actually consumes; single-ray flips wash out here;
  3. final-solution QUALITY parity: the full bench solver (retrieval warm
     start + c2f) with fused_render on vs off on an 8-fruit batch, scored
     as Chamfer-L1 against the analytic GT surfaces — the fused path must
     not degrade solution quality (trajectory equality is NOT asserted:
     kernel rounding legitimately reorders LM steps).

Two rungs for (1)-(2): production bf16, and true-f32 (fused_bf16=False now
requests Precision.HIGHEST inside the kernel — at default precision Mosaic
runs f32 dots as single bf16 MXU passes) vs the dense path pinned to
jax.default_matmul_precision("highest").

Reference semantics matched by both paths: `/root/reference/wild_completion/
loss.py:8-217`. Measured deltas and tolerances: docs/PERF.md "fused-kernel
gate" (round 4). Wired into .claude/skills/verify/SKILL.md.

Prints one JSON line; exit code 1 on FAIL.
Usage: python tools/fused_check.py   (~3-5 min cold on the real chip)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Tolerances: measured on TPU v5e (docs/PERF.md round 4) with ~5-10x
# headroom. med/p90 over valid rays; frac = fraction of rays with residual
# delta > 1e-3 (band flips); relH/relb = relative Frobenius delta of the
# per-term normal equations.
TOL = {
    "f32": dict(res_med=1e-3, res_p90=2e-3, flip_frac=0.15, relH=0.25, relb=0.30),
    "bf16": dict(res_med=2e-3, res_p90=4e-3, flip_frac=0.20, relH=0.35, relb=0.45),
}
# Solution quality: fused-vs-dense mean CD gap on the 8-fruit bench
# workload (both solved to convergence from the same warm start).
TOL_CD_MM = 0.3


def _scene(spec, M):
    rng = np.random.default_rng(11)
    R_fg, R_bg = 200, 200
    R = R_fg + R_bg
    ang = np.concatenate([rng.normal(size=(R_fg, 2)) * 0.08,
                          rng.normal(size=(R_bg, 2)) * 0.35])
    rays = np.concatenate([ang, np.ones((R, 1))], axis=-1).astype(np.float32)
    depth_obs = (0.30 + rng.normal(size=R) * 0.03).astype(np.float32)
    depth_obs[R_fg + 3] = 0.0  # a bg ray without measured depth
    T_co = np.eye(4, dtype=np.float32)
    T_co[:3, 3] = [0.01, -0.02, 0.30]
    c, s = np.cos(0.2), np.sin(0.2)
    T_co[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32) * 1.05
    T_oc = np.linalg.inv(T_co).astype(np.float32)
    depths = np.linspace(0.20, 0.42, M).astype(np.float32)
    latent = (rng.normal(size=spec.code_length) * 0.2).astype(np.float32)
    return rays, depth_obs, T_oc, depths, latent, R_fg


def residual_gate(params, spec, record) -> bool:
    import jax
    import jax.numpy as jnp

    from hortimapping_tpu.ops.render import RenderConfig, render_residuals

    base = RenderConfig(scale_on=True, occ_cutoff=0.01, occlusion_on=True)

    def run(M, fused_cfg, dense_highest):
        rays, depth_obs, T_oc, depths, latent, R_fg = _scene(spec, M)
        R = rays.shape[0]
        args = (
            params, spec, jnp.asarray(latent), jnp.asarray(rays),
            jnp.arange(R) < R_fg, jnp.ones(R, bool), jnp.asarray(depth_obs),
            jnp.asarray(T_oc), jnp.asarray(depths), jnp.float32(0.08),
        )
        if dense_highest:
            with jax.default_matmul_precision("highest"):
                want = render_residuals(*args, dataclasses.replace(base, fused=False))
        else:
            want = render_residuals(*args, dataclasses.replace(base, fused=False))
        got = render_residuals(*args, fused_cfg)
        return want, got

    ok_all = True
    for name, M, fused_cfg, dense_high in (
        # f32 rung: HIGHEST both sides; M=20 keeps the f32 kernel (2x VMEM
        # per buffer vs bf16) inside the 16 MB scoped-vmem limit at tr=8
        ("f32", 20, dataclasses.replace(base, fused=True, fused_bf16=False,
                                        fused_tr=8), True),
        # production rung: shipped bf16 kernel at the wild shapes
        ("bf16", 30, dataclasses.replace(base, fused=True, fused_bf16=True), False),
    ):
        want, got = run(M, fused_cfg, dense_high)
        assert bool(np.asarray(want.frame_ok)) and bool(np.asarray(got.frame_ok))
        ok = np.asarray(want.ray_ok)
        np.testing.assert_array_equal(np.asarray(got.ray_ok), ok)
        n = int(ok.sum())
        tol = TOL[name]
        rung_ok = True
        worst_med = worst_p90 = worst_frac = 0.0
        for rf in ("res_d", "res_m"):
            d = np.abs(np.asarray(getattr(got, rf)) - np.asarray(getattr(want, rf)))[ok]
            worst_med = max(worst_med, float(np.median(d)))
            worst_p90 = max(worst_p90, float(np.percentile(d, 90)))
            worst_frac = max(worst_frac, float((d > 1e-3).mean()))
        rung_ok &= (worst_med <= tol["res_med"] and worst_p90 <= tol["res_p90"]
                    and worst_frac <= tol["flip_frac"])
        worst_H = worst_b = 0.0
        for rf, jf in (("res_d", "jac_d"), ("res_m", "jac_m")):
            rw = np.asarray(getattr(want, rf))[ok]
            jw = np.asarray(getattr(want, jf))[ok]
            rg = np.asarray(getattr(got, rf))[ok]
            jg = np.asarray(getattr(got, jf))[ok]
            Hw, bw = jw.T @ jw / n, jw.T @ rw / n
            Hg, bg = jg.T @ jg / n, jg.T @ rg / n
            worst_H = max(worst_H, float(np.linalg.norm(Hg - Hw) / np.linalg.norm(Hw)))
            worst_b = max(worst_b, float(np.linalg.norm(bg - bw)
                                         / max(np.linalg.norm(bw), 1e-12)))
        rung_ok &= worst_H <= tol["relH"] and worst_b <= tol["relb"]
        record[f"{name}_res_med"] = worst_med
        record[f"{name}_res_p90"] = worst_p90
        record[f"{name}_flip_frac"] = worst_frac
        record[f"{name}_relH"] = worst_H
        record[f"{name}_relb"] = worst_b
        record[f"{name}_ok"] = bool(rung_ok)
        ok_all &= rung_ok
    return ok_all


def solve_gate(params, spec, record) -> bool:
    import jax.numpy as jnp

    import bench
    from hortimapping_tpu.data.mesh import PointCloud
    from hortimapping_tpu.metrics import ChamferDistance
    from hortimapping_tpu.models.workspace import load_latent_vectors
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    cfg = bench.bench_cfg()
    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    rng = np.random.default_rng(42)
    obs_list, T_list, gts = [], [], []
    for b in range(8):
        code = (rng.normal(size=spec.code_length) * 0.3).astype(np.float32)
        T_wo = np.eye(4, dtype=np.float32)
        T_wo[:3, 3] = rng.normal(size=3) * 0.1
        obs, gt = make_scene(cat, code, T_wo, n_frames=cfg.n_frame,
                             n_fg=cfg.n_fg_pix, n_bg=cfg.n_bg_pix,
                             n_points=cfg.recon_n_pts, seed=b)
        obs_list.append(obs)
        T_list.append(np.linalg.inv(T_wo).astype(np.float32))
        gts.append(gt)
    import jax

    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    T0 = jnp.stack([jnp.asarray(t) for t in T_list])
    table = load_latent_vectors(os.path.join(bench.ASSETS, "synthetic_pepper_32"))
    mesher = MeshExtractor(params, spec, voxels_dim=40, cube_radius=0.08)

    def cd_of(res):
        T_wo = np.linalg.inv(np.asarray(res.T_ow))
        meshes = mesher.complete_mesh_batch(res.latent, list(T_wo))
        cd = ChamferDistance()
        for m, gt in zip(meshes, gts):
            cd.update(PointCloud(gt), m)
        return np.array(cd.cd_array)

    cds = {}
    for fused in (True, False):
        c = dataclasses.replace(cfg, fused_render=fused)
        res = retrieval_joint_opt(
            params, spec, c, table, obs, T0, 0.08,
            n_score_pts=128, n_scales=3, score_bf16=True,
        )
        assert not np.asarray(res.failed).any()
        cds[fused] = cd_of(res)
    gap = float(cds[True].mean() - cds[False].mean()) * 1e3
    record["solve_cd_fused_mm"] = float(cds[True].mean() * 1e3)
    record["solve_cd_dense_mm"] = float(cds[False].mean() * 1e3)
    record["solve_cd_gap_mm"] = gap
    return abs(gap) <= TOL_CD_MM


def main() -> int:
    import jax

    from hortimapping_tpu.models.workspace import config_decoder

    # persistent compile cache: the unfused dense c2f program is the long
    # pole (~5 min cold); warm re-runs of the gate take ~1-2 min
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    record = {"metric": "fused_kernel_gate", "backend": jax.default_backend()}
    params, spec = config_decoder(os.path.join(ROOT, "assets", "synthetic_pepper_32"))
    ok_res = residual_gate(params, spec, record)
    ok_solve = solve_gate(params, spec, record)
    record["tolerances"] = {**TOL, "solve_cd_gap_mm": TOL_CD_MM}
    record["pass"] = bool(ok_res and ok_solve)
    print(json.dumps(record))
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
