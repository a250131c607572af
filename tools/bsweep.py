"""Batch-size sweep for the headline bench (VERDICT r3 task #1).

Runs the exact bench.py workload (wild-pepper shapes, c2f solver, retrieval
warm start, one-fetch solve+grids packing, one-deep pipeline) at several
fruit batch sizes B and reports, per B:

  - median rep wall time and ms/fruit (the headline metric at that B)
  - a breakdown per rep: dispatch-return time (async enqueue cost), fetch
    time (the blocking np.asarray of the packed buffer), host meshing time

Rationale (docs/PERF.md round 3): a rep is ~105 ms device solve + ~25 ms
fetch round-trip floor + ~22 ms grid payload + ~20 ms host MT. The fixed
round-trip floor and launch-queue contention amortize with B while device
solve scales linearly, so ms/fruit should drop toward the ~6.6 ms device
floor as B grows — until HBM or host meshing pushes back.

Usage:  python tools/bsweep.py [--sizes 16,32,64] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (repo-root bench.py: workload + config source of truth)


def run_solve_only(B: int, n_rep: int) -> dict:
    """Sequential solve-only timing: retrieval + c2f solve with the SMALL
    packed head fetched (no SDF grids, no meshing). Isolates device-solve
    scaling with B from the grid payload / host-MT components."""
    import os

    from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
    from hortimapping_tpu.optim.lm import pack_result
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    import jax

    params, spec = config_decoder(os.path.join(bench.ASSETS, "synthetic_pepper_32"))
    cfg = bench.bench_cfg()
    obs, lat0, T0 = bench.build_batch(spec, cfg, B)
    latent_table = load_latent_vectors(os.path.join(bench.ASSETS, "synthetic_pepper_32"))
    pack = jax.jit(pack_result)

    def step():
        res = retrieval_joint_opt(
            params, spec, cfg, latent_table, obs, T0, 0.08,
            n_score_pts=128, n_scales=3, score_bf16=True,
        )
        return np.asarray(pack(res))

    step()
    reps = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        step()
        reps.append(time.perf_counter() - t0)
    med = sorted(reps)[len(reps) // 2]
    out = {
        "B": B, "mode": "solve_only",
        "rep_ms": [round(r * 1e3, 1) for r in reps],
        "rep_ms_median": round(med * 1e3, 1),
        "ms_per_fruit": round(med * 1e3 / B, 2),
    }
    del obs, lat0, T0
    jax.clear_caches()
    return out


def run_one(B: int, n_rep: int) -> dict:
    import os

    import jax

    from hortimapping_tpu.models.workspace import config_decoder, load_latent_vectors
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    params, spec = config_decoder(os.path.join(bench.ASSETS, "synthetic_pepper_32"))
    cfg = bench.bench_cfg()
    cube_radius = 0.08
    voxels_dim = 40

    obs, lat0, T0 = bench.build_batch(spec, cfg, B)
    mesher = MeshExtractor(params, spec, voxels_dim=voxels_dim, cube_radius=cube_radius)
    latent_table = load_latent_vectors(os.path.join(bench.ASSETS, "synthetic_pepper_32"))
    C = spec.code_length

    def dispatch():
        res = retrieval_joint_opt(
            params, spec, cfg, latent_table, obs, T0, cube_radius,
            n_score_pts=128, n_scales=3, score_bf16=True,
        )
        return mesher.pack_solve_with_grids(res)

    def consume(pack):
        t0 = time.perf_counter()
        host = np.asarray(pack)
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        head, grids = mesher.unpack_solve_with_grids(host)
        T_wo = np.linalg.inv(head[:, C:C + 16].reshape(-1, 4, 4))
        meshes = [
            m.transform(T) for m, T in zip(mesher.meshes_from_grids(grids), T_wo)
        ]
        t_mesh = time.perf_counter() - t0
        return (head, meshes), t_fetch, t_mesh

    consume(dispatch())  # compile + first meshing
    reps, fetches, meshes_t, disps = [], [], [], []
    inflight = dispatch()
    for i in range(n_rep + 1):
        t0 = time.perf_counter()
        nxt = dispatch()
        t_disp = time.perf_counter() - t0
        _, t_fetch, t_mesh = consume(inflight)
        inflight = nxt
        if i > 0:  # rep 0 discarded (head start, see bench.py)
            reps.append(time.perf_counter() - t0)
            fetches.append(t_fetch)
            meshes_t.append(t_mesh)
            disps.append(t_disp)
    consume(inflight)

    med = sorted(reps)[len(reps) // 2]
    out = {
        "B": B,
        "rep_ms": [round(r * 1e3, 1) for r in reps],
        "rep_ms_median": round(med * 1e3, 1),
        "ms_per_fruit": round(med * 1e3 / B, 2),
        "dispatch_ms_median": round(sorted(disps)[len(disps) // 2] * 1e3, 1),
        "fetch_ms_median": round(sorted(fetches)[len(fetches) // 2] * 1e3, 1),
        "mesh_ms_median": round(sorted(meshes_t)[len(meshes_t) // 2] * 1e3, 1),
    }
    # release device buffers before the next B
    del obs, lat0, T0, inflight
    jax.clear_caches()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,32,64")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--solve-only", action="store_true",
                    help="sequential solve-only reps (head fetch, no grids/"
                         "meshing): isolates device-solve scaling with B")
    args = ap.parse_args()

    for B in [int(s) for s in args.sizes.split(",")]:
        out = run_solve_only(B, args.reps) if args.solve_only else run_one(B, args.reps)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
