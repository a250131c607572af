"""Continuous-serving throughput benchmark on the wild-pepper workload.

Drives `serve.CompletionServer` with a saturating producer (the serving
shape of a mapping robot streaming submaps), measures steady-state
fruits/sec and p50/p95 request latency, and prints one JSON line. Usage:

    python tools/serve_bench.py [--n-fruits 64] [--max-batch 16] [--parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fruits", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--parity", action="store_true",
                    help="reference-parity solver instead of coarse-to-fine")
    ap.add_argument("--mesh", action="store_true", help="also mesh results")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.serve import CompletionRequest, CompletionServer
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    params, spec = config_decoder(os.path.join(ROOT, "assets", "synthetic_pepper_32"))
    cfg = JointOptConfig(
        scale_on=True, n_fg_pix=200, n_bg_pix=200, n_frame=10,
        n_sample_on_ray=30, recon_n_pts=2000, max_iter=50,
        coarse_to_fine=not args.parity, fine_max_iter=2,
        coarse_frame_stride=4, coarse_ray_frac=0.3, coarse_sample_frac=0.35,
        coarse_pts_frac=0.3,
    )
    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    rng = np.random.default_rng(42)
    reqs = []
    for b in range(args.n_fruits):
        code = (rng.normal(size=spec.code_length) * 0.3).astype(np.float32)
        T_wo = np.eye(4, dtype=np.float32)
        T_wo[:3, 3] = rng.normal(size=3) * 0.1
        obs, _ = make_scene(cat, code, T_wo, n_frames=cfg.n_frame,
                            n_fg=cfg.n_fg_pix, n_bg=cfg.n_bg_pix,
                            n_points=cfg.recon_n_pts, seed=b)
        reqs.append(CompletionRequest(
            fruit_id=f"fruit_{b:03d}", obs=obs,
            latent0=np.zeros(spec.code_length, np.float32),
            T_ow0=np.linalg.inv(T_wo).astype(np.float32)))

    mesher = (MeshExtractor(params, spec, voxels_dim=40, cube_radius=0.08)
              if args.mesh else None)
    srv = CompletionServer(params, spec, cfg, cube_radius=0.08,
                           max_batch=args.max_batch, max_wait_s=0.01,
                           mesher=mesher)
    with srv:
        # warmup with one FULL batch submitted together: sequential singles
        # would warm the padded batch-of-1 path but leave the full-width
        # jnp.stack/concat programs cold (~3 s first-batch penalty)
        warm = [srv.submit(r) for r in reqs[: args.max_batch]]
        [f.result(timeout=900) for f in warm]
        t0 = time.perf_counter()
        futs = [srv.submit(r) for r in reqs]  # saturating producer
        results = [f.result(timeout=900) for f in futs]
        wall = time.perf_counter() - t0
    assert all(not r.failed for r in results)
    lat = sorted(r.latency_s for r in results)
    out = {
        "metric": "serving_throughput",
        "value": round(args.n_fruits / wall, 2),
        "unit": "fruits/sec",
        "n_fruits": args.n_fruits,
        "max_batch": args.max_batch,
        "solver": "parity" if args.parity else "coarse_to_fine",
        "meshing": bool(args.mesh),
        "latency_p50_s": round(lat[len(lat) // 2], 3),
        "latency_p95_s": round(lat[int(len(lat) * 0.95)], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
