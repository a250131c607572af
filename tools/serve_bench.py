"""Continuous-serving benchmark on the wild-pepper workload.

Drives `serve.CompletionServer` two ways:

  * default: a saturating producer (all requests at once) — measures
    steady-state CAPACITY in fruits/sec; latency there is queue-depth, not
    service time;
  * `--sweep 0.25,0.5,0.75,0.9`: an offered-load sweep — requests arrive at
    the given fraction of measured capacity with uniform inter-arrival
    times, so p50/p95 reflect what a robot at that load actually waits.
    `--max-queue N` bounds the queue (admission control); rejected submits
    are counted, not retried.

Prints one JSON line per measurement. Usage:

    python tools/serve_bench.py [--n-fruits 64] [--max-batch 16] [--parity]
    python tools/serve_bench.py --warmstart          # bench.py's retr_c2f solver
    python tools/serve_bench.py --sweep 0.25,0.5,0.75,0.9 [--max-queue 32]
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
    ap.add_argument("--sweep", default=None,
                    help="comma-separated offered-load fractions of capacity")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="admission-control bound on in-flight requests")
    ap.add_argument("--deadline-ms", type=float, default=None,
                    help="per-request latency contract for the --sweep runs: "
                         "a request still queued past this resolves "
                         "DeadlineExceeded instead of serving stale")
    ap.add_argument("--warmstart", action="store_true",
                    help="retrieval warm start inside the served program + "
                         "the shipped 8-iteration coarse cap (the bench.py "
                         "solver configuration)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))

    from hortimapping_tpu.config import JointOptConfig
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.serve import (CompletionRequest, CompletionServer,
                                        ServerOverloaded)
    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    params, spec = config_decoder(os.path.join(ROOT, "assets", "synthetic_pepper_32"))
    cfg = JointOptConfig(
        scale_on=True, n_fg_pix=200, n_bg_pix=200, n_frame=10,
        n_sample_on_ray=30, recon_n_pts=2000, max_iter=50,
        coarse_to_fine=not args.parity, fine_max_iter=2,
        coarse_frame_stride=4, coarse_ray_frac=0.3, coarse_sample_frac=0.35,
        coarse_pts_frac=0.3,
    )
    latent_table = None
    if args.warmstart:
        import dataclasses

        from hortimapping_tpu.models.workspace import load_latent_vectors

        cfg = dataclasses.replace(
            cfg, init_mode="retrieval", coarse_max_iter=8,
            retrieval_score_pts=128, retrieval_n_scales=1,
            retrieval_scale_min=1.0, retrieval_scale_max=1.0,
            retrieval_score_bf16=True,
            fine_ray_frac=0.6, fine_sample_frac=0.75, fine_pts_frac=0.6,
        )
        latent_table = load_latent_vectors(
            os.path.join(ROOT, "assets", "synthetic_pepper_32"))
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
                           mesher=mesher, max_queue=args.max_queue,
                           latent_table=latent_table)
    with srv:
        # precompile every batch width the packer can emit (a cold width
        # hit mid-stream stalls serving for the full XLA compile), then one
        # real full batch to warm the host-side stack/concat paths
        srv.warmup(reqs[0])
        warm = [srv.submit(r) for r in reqs[: min(args.max_batch, len(reqs))]]
        [f.result(timeout=900) for f in warm]

        # capacity: saturating producer (bypasses admission: batched waves)
        t0 = time.perf_counter()
        results = []
        pending = []
        for r in reqs:
            while True:
                try:
                    pending.append(srv.submit(r))
                    break
                except ServerOverloaded:  # backpressure under --max-queue
                    results.append(pending.pop(0).result(timeout=900))
        results += [f.result(timeout=900) for f in pending]
        wall = time.perf_counter() - t0
        assert all(not r.failed for r in results)
        capacity = args.n_fruits / wall
        lat = sorted(r.latency_s for r in results)
        print(json.dumps({
            "metric": "serving_throughput",
            "value": round(capacity, 2),
            "unit": "fruits/sec",
            "n_fruits": args.n_fruits,
            "max_batch": args.max_batch,
            "max_queue": args.max_queue,
            "solver": ("parity" if args.parity else
                       "retr_c2f" if args.warmstart else "coarse_to_fine"),
            "meshing": bool(args.mesh),
            "latency_p50_s": round(lat[len(lat) // 2], 3),
            "latency_p95_s": round(lat[int(len(lat) * 0.95)], 3),
        }), flush=True)

        # offered-load sweep: uniform arrivals at load * capacity
        import dataclasses as _dc

        from hortimapping_tpu.serve import DeadlineExceeded

        deadline_s = args.deadline_ms / 1e3 if args.deadline_ms else None
        for load in ([float(x) for x in args.sweep.split(",")] if args.sweep else []):
            rate = load * capacity
            futs, rejected = [], 0
            t0 = time.perf_counter()
            for i, r in enumerate(reqs):
                target = t0 + i / rate
                dt = target - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
                if deadline_s is not None:
                    r = _dc.replace(r, deadline_s=deadline_s)
                try:
                    futs.append(srv.submit(r))
                except Exception:
                    rejected += 1
            results, expired = [], 0
            for f in futs:
                try:
                    results.append(f.result(timeout=900))
                except DeadlineExceeded:
                    expired += 1
            lat = sorted(r.latency_s for r in results)
            rec = {
                "metric": "serving_latency",
                "offered_load": load,
                "rate_fruits_per_sec": round(rate, 2),
                "served": len(results),
                "rejected": rejected,
                "latency_p50_s": round(lat[len(lat) // 2], 3) if lat else None,
                "latency_p95_s": round(lat[int(len(lat) * 0.95)], 3) if lat else None,
                "max_queue": args.max_queue,
            }
            if deadline_s is not None:
                rec["deadline_ms"] = args.deadline_ms
                rec["expired"] = expired
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
