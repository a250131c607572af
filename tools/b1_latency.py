"""Single-fruit (B=1) end-to-end solve latency over the device link.

The robot-loop shape: ONE fruit arrives, must be completed now — no batch to
amortize dispatch round trips. Measures the full host-visible latency of
`optim/lm.joint_opt_packed` (solver + on-device result packing in one
program, one packed fetch) on the wild-pepper workload, per solver variant.

Usage: python tools/b1_latency.py [variant ...]   (default: parity c2f)
       REPS=50 python tools/b1_latency.py c2f
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", "30"))


def main(variants) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.optim.lm import joint_opt_packed
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec = config_decoder(os.path.join(root, "assets", "synthetic_pepper_32"))
    cfg = JointOptConfig(
        scale_on=True, n_fg_pix=200, n_bg_pix=200, n_frame=10,
        n_sample_on_ray=30, recon_n_pts=2000, max_iter=50,
    )
    # the bench's validated wild schedule (configs/wild_pepper_tpu.yaml)
    c2f = dataclasses.replace(
        cfg, coarse_to_fine=True, fine_max_iter=2, coarse_frame_stride=4,
        coarse_ray_frac=0.3, coarse_sample_frac=0.35, coarse_pts_frac=0.3,
        coarse_max_iter=8,
        fine_ray_frac=0.6, fine_sample_frac=0.75, fine_pts_frac=0.6,
    )
    named = {"parity": cfg, "c2f": c2f, "retr_c2f": c2f,
             "tr": dataclasses.replace(cfg, trust_region=True)}

    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    rng = np.random.default_rng(42)
    code = (rng.normal(size=spec.code_length) * 0.3).astype(np.float32)
    T_wo = np.eye(4, dtype=np.float32)
    T_wo[:3, 3] = rng.normal(size=3) * 0.1
    obs, _ = make_scene(cat, code, T_wo, n_frames=cfg.n_frame,
                        n_fg=cfg.n_fg_pix, n_bg=cfg.n_bg_pix,
                        n_points=cfg.recon_n_pts, seed=0)
    obs1 = jax.tree_util.tree_map(lambda a: a[None], obs)
    lat0 = jnp.zeros((1, spec.code_length), jnp.float32)
    T0 = jnp.asarray(np.linalg.inv(T_wo)[None].astype(np.float32))

    from functools import partial

    from hortimapping_tpu.models.workspace import load_latent_vectors
    from hortimapping_tpu.optim.lm import pack_result
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    table = load_latent_vectors(os.path.join(root, "assets", "synthetic_pepper_32"))

    from hortimapping_tpu.ops.mesher import MeshExtractor

    mesher = MeshExtractor(params, spec, voxels_dim=40, cube_radius=0.08)

    for name in variants:
        mesh_out = name.endswith("_mesh")
        c = named[name.removesuffix("_mesh")]
        if mesh_out:
            # the full robot deliverable: solve + completed mesh + pose in
            # ONE fetch (mesher.pack_solve_with_grids combo buffer)
            def solve(obs1=obs1, T0=T0, c=c):
                res = retrieval_joint_opt(
                    params, spec, c, table, obs1, T0, 0.08,
                    n_score_pts=128, n_scales=3, score_bf16=True)
                host = np.asarray(mesher.pack_solve_with_grids(res))
                head, grids = mesher.unpack_solve_with_grids(host)
                T_wo = np.linalg.inv(head[:, spec.code_length:
                                          spec.code_length + 16].reshape(4, 4))
                mesher.meshes_from_grids(grids)[0].transform(T_wo)
                return head
        elif name.startswith("retr_"):
            # retrieval warm start + solve + pack, still ONE program
            @partial(jax.jit, static_argnames=())
            def solve(obs1=obs1, T0=T0, c=c):
                return pack_result(retrieval_joint_opt(
                    params, spec, c, table, obs1, T0, 0.08,
                    n_score_pts=128, n_scales=3, score_bf16=True))
        else:
            def solve(obs1=obs1, lat0=lat0, T0=T0, c=c):
                return joint_opt_packed(params, spec, c, obs1, lat0, T0, 0.08)[1]
        np.asarray(solve())  # warmup + sync
        lats = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = np.asarray(solve())  # the fetch IS part of robot latency
            lats.append(time.perf_counter() - t0)
        assert out.shape[0] == 1
        lats = np.sort(lats) * 1e3
        print(
            f"{name:8s} B=1 p50 {lats[len(lats)//2]:6.1f} ms  "
            f"p95 {lats[int(len(lats)*0.95)]:6.1f} ms  "
            f"min {lats[0]:6.1f} ms  ({REPS} reps)",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["parity", "c2f"])
