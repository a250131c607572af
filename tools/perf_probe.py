"""Perf/quality probe for solver variants on the wild-pepper bench workload.

Usage: python tools/perf_probe.py [variant ...]
Variants: parity, c2f (production coarse_to_fine_joint_opt), c2f_capN
(fine_max_iter=N), c2f:<fine>:<stride>:<rayfrac>:<samplefrac>:<coarsecap>,
tr, parity_lamX. Prints wall time, per-lane iterations, and mean/max
Chamfer-L1 vs the synthetic ground-truth surfaces. Set SEED_OFFSET to
evaluate on a held-out fruit set (guards schedule tuning against
overfitting the default 16 fruits).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRUITS = 16
SEED_OFFSET = int(os.environ.get("SEED_OFFSET", "0"))
# CATEGORY=berry runs the strawberry-scale workload: synthetic_berry_32
# decoder, 0.04 m radius, 1 mm meshing (80^3 grid — lab_berry.yaml scale)
CATEGORY = os.environ.get("CATEGORY", "pepper")


def main(variants):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.data.mesh import PointCloud
    from hortimapping_tpu.metrics import ChamferDistance
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.optim import lm
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if CATEGORY == "berry":
        asset, base_radius, cube_radius, voxels = "synthetic_berry_32", 0.03, 0.04, 80
    else:
        asset, base_radius, cube_radius, voxels = "synthetic_pepper_32", 0.06, 0.08, 40
    params, spec = config_decoder(os.path.join(root, "assets", asset))
    cfg = JointOptConfig(
        scale_on=True, n_fg_pix=200, n_bg_pix=200, n_frame=10,
        n_sample_on_ray=30, recon_n_pts=2000, max_iter=50,
    )
    cat = SyntheticCategory(spec=spec, base_radius=base_radius)
    rng = np.random.default_rng(42 + SEED_OFFSET)
    obs_list, lat_list, T_list, gts = [], [], [], []
    for b in range(N_FRUITS):
        code = (rng.normal(size=spec.code_length) * 0.3).astype(np.float32)
        T_wo = np.eye(4, dtype=np.float32)
        T_wo[:3, 3] = rng.normal(size=3) * 0.1
        obs, gt = make_scene(cat, code, T_wo, n_frames=cfg.n_frame,
                             n_fg=cfg.n_fg_pix, n_bg=cfg.n_bg_pix,
                             n_points=cfg.recon_n_pts, seed=SEED_OFFSET + b)
        obs_list.append(obs)
        lat_list.append(np.zeros(spec.code_length, np.float32))
        T_list.append(np.linalg.inv(T_wo).astype(np.float32))
        gts.append(gt)
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    lat0, T0 = jnp.stack(lat_list), jnp.stack(T_list)
    mesher = MeshExtractor(params, spec, voxels_dim=voxels, cube_radius=cube_radius)

    def cd_of(res):
        T_wo = np.linalg.inv(np.asarray(res.T_ow))
        meshes = mesher.complete_mesh_batch(res.latent, list(T_wo))
        cd = ChamferDistance()
        for m, gt in zip(meshes, gts):
            cd.update(PointCloud(gt), m)
        return np.array(cd.cd_array)

    def solver_for(name):
        if name == "parity":
            return cfg, lm.shape_pose_joint_opt_batched
        if name == "tr":
            return dataclasses.replace(cfg, trust_region=True), lm.shape_pose_joint_opt_batched
        if name.startswith("parity_lam"):
            return dataclasses.replace(cfg, lm_lambda_0=float(name[10:])), lm.shape_pose_joint_opt_batched
        if name == "c2f":
            return dataclasses.replace(cfg, coarse_to_fine=True), lm.coarse_to_fine_joint_opt
        if name.startswith("c2f_cap"):
            return dataclasses.replace(cfg, coarse_to_fine=True,
                                       fine_max_iter=int(name[7:])), lm.coarse_to_fine_joint_opt
        if name.startswith("c2f:") or name.startswith("c2ftr:"):
            # c2f[tr]:<fine_cap>:<stride>:<ray_frac>:<sample_frac>:<coarse_cap>
            #   [:<coarse_fused_tr>[:<fine_ray_frac>:<fine_sample_frac>[:<fine_pts_frac>]]]
            parts = name.split(":")[1:]
            fine, stride, rf, sf, ccap = parts[:5]
            ctr = int(parts[5]) if len(parts) > 5 else 0
            frf = float(parts[6]) if len(parts) > 6 else 1.0
            fsf = float(parts[7]) if len(parts) > 7 else 1.0
            fpf = float(parts[8]) if len(parts) > 8 else frf
            return dataclasses.replace(
                cfg, coarse_to_fine=True, fine_max_iter=int(fine),
                coarse_frame_stride=int(stride), coarse_ray_frac=float(rf),
                coarse_sample_frac=float(sf), coarse_pts_frac=float(rf),
                coarse_max_iter=int(ccap),
                coarse_fused_tr=ctr,
                fine_ray_frac=frf, fine_sample_frac=fsf, fine_pts_frac=fpf,
                trust_region=name.startswith("c2ftr:"),
            ), lm.coarse_to_fine_joint_opt
        raise SystemExit(f"unknown variant {name}")

    # retrieval scoring knobs (env): RETR_PTS, RETR_SCALES, RETR_BF16,
    # RETR_SMIN/RETR_SMAX (RETR_SCALES=1 RETR_SMIN=1 RETR_SMAX=1 = the
    # unit-scale scorer the greenhouse/lab configs ship)
    retr_pts = int(os.environ.get("RETR_PTS", "256"))
    retr_scales = int(os.environ.get("RETR_SCALES", "5"))
    retr_bf16 = os.environ.get("RETR_BF16", "0") == "1"
    retr_smin = float(os.environ.get("RETR_SMIN", "0.85"))
    retr_smax = float(os.environ.get("RETR_SMAX", "1.2"))

    for name in variants:
        if name.startswith("retr+"):
            # retrieval warm start from the asset's latent table, scored in
            # the pose-init frame (optim/warmstart.py), then the base solver.
            # The scoring runs INSIDE the timed loop — it is part of the
            # per-fruit cost the bench pays.
            from hortimapping_tpu.models.workspace import load_latent_vectors
            from hortimapping_tpu.optim.warmstart import retrieval_init_batched

            table = load_latent_vectors(os.path.join(root, "assets", asset))
            name_base = name[len("retr+"):]
            c, fn = solver_for(name_base)

            def solve():
                lat_v, T_v, _, _ = retrieval_init_batched(
                    params, spec, table, obs.points_w, obs.point_valid,
                    n_score_pts=retr_pts, n_scales=retr_scales,
                    scale_min=retr_smin, scale_max=retr_smax,
                    T_init=T0, score_bf16=retr_bf16)
                return fn(params, spec, c, obs, lat_v, T_v, cube_radius)
        else:
            c, fn = solver_for(name)

            def solve():
                return fn(params, spec, c, obs, lat0, T0, cube_radius)
        r = solve()
        np.asarray(r.T_ow)  # warmup sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = solve()
            np.asarray(r.T_ow)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        cd = cd_of(r)
        it = np.asarray(r.iter_count)
        print(
            f"{name:14s} {dt*1e3:6.0f} ms ({dt/N_FRUITS*1e3:6.1f}/fruit)  "
            f"iters sum {it.sum():4d} max {it.max():2d}  "
            f"CD mean {cd.mean()*1e3:.4f} mm max {cd.max()*1e3:.3f} mm",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["parity", "c2f"])
