"""Headline benchmark: batched per-fruit completion THROUGHPUT on one TPU chip.

Workload mirrors the reference's wild-pepper configuration
(`/root/reference/configs/wild_pepper.yaml`: 10 frames x 400 rays x 30 ray
samples + 2000 surface points per LM iteration, Sim(3) pose, max 50 iters)
on the flagship synthetic_pepper_32 decoder (the reference sweet-pepper
architecture: 32-d latent, 8x512 MLP). A whole submap's worth of fruits runs
as ONE vmapped fused-LM program — the reference completes fruits one at a
time in a Python loop at ~0.6 s each (`/root/reference/README.md:23`).

The number is pipelined steady-state throughput (one batch in flight,
exactly how serve.py's worker consumes batches), expressed per fruit; with
one batch in flight, per-batch completion LATENCY is ~2x the rep time. The
B=1 latency claim lives in tools/b1_latency.py (p50 31.6 ms solve / 41.5 ms
incl. watertight mesh + pose — docs/PERF.md).

Prints one JSON line:
  {"metric": "per_fruit_throughput", "value": <ms>, "unit": "ms",
   "pipelined": true, "vs_baseline": <reference_seconds / measured_seconds>}
(vs_baseline > 1 means faster than the published reference number.)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_PER_FRUIT_S = 0.6  # /root/reference/README.md:23
# B=32 from the round-4 batch-size sweep (tools/bsweep.py, docs/PERF.md):
# the solve is device-bound at ~9.3-9.5 ms/fruit (solve-only sequential:
# 11.4/10.2/10.0 ms/fruit at B=16/32/64 — linear device time, only the
# ~30 ms fixed link round trip amortizes), and pipelined end-to-end is
# 11.1/10.7/11.0/11.7 at B=16/32/48/64: B>=48 loses to host meshing on
# this 1-core host and link-variance; 32 is the plateau.
N_FRUITS = 32
ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def build_batch(spec, cfg, n_fruits: int):
    import jax
    import jax.numpy as jnp

    from hortimapping_tpu.tools.synthetic import SyntheticCategory, make_scene

    cat = SyntheticCategory(spec=spec, base_radius=0.06)
    rng = np.random.default_rng(42)
    obs_list, lat_list, T_list = [], [], []
    for b in range(n_fruits):
        code = (rng.normal(size=spec.code_length) * 0.3).astype(np.float32)
        T_wo = np.eye(4, dtype=np.float32)
        T_wo[:3, 3] = rng.normal(size=3) * 0.1
        obs, _ = make_scene(
            cat, code, T_wo, n_frames=cfg.n_frame, n_fg=cfg.n_fg_pix,
            n_bg=cfg.n_bg_pix, n_points=cfg.recon_n_pts, seed=b,
        )
        obs_list.append(obs)
        lat_list.append(np.zeros(spec.code_length, np.float32))
        T_list.append(np.linalg.inv(T_wo).astype(np.float32))
    obs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *obs_list)
    return obs, jnp.stack(lat_list), jnp.stack(T_list)


def bench_cfg():
    """The shipped bench solver config (shared with tools/bsweep.py)."""
    from hortimapping_tpu.config import JointOptConfig

    # wild_pepper.yaml workload shapes (configs/wild_pepper.yaml:30-49), solved
    # with the two-resolution schedule (optim/lm.coarse_to_fine_joint_opt):
    # phase A on every 4th frame at 0.3x rays / 0.35x samples / 0.3x points
    # (~16x cheaper per iteration, capped at 8 iterations — the retrieval
    # warm start below converges the coarse problem that fast; a 25-cap
    # budget measures identically on held-out seeds at +3.4 ms/fruit),
    # phase B polish capped at 2 iterations, itself subsampled at 0.6x
    # rays / 0.75x samples / 0.6x points with ALL frames (the full-res
    # polish was ~2/3 of device time; the subsampled one is held-out
    # BETTER on mean CD and equal on max CD across three seed sets).
    # Measured AGAINST the single-phase reference-parity solve on this
    # workload (tools/perf_probe.py, 16 fruits vs analytic GT, tuning AND
    # held-out seeds, device NN-metric with the round-3 cancellation fix):
    # 189 -> ~11 ms/fruit solve with mean Chamfer-L1 2.99-3.01 vs 3.79 mm
    # (~21% BETTER, warm start included) and max CD 3.39 vs 4.17 mm — the
    # speedup does not trade quality. docs/PERF.md has the sweep and the
    # challenge-config negative result (c2f stays per-config opt-in).
    return JointOptConfig(
        scale_on=True, n_fg_pix=200, n_bg_pix=200, n_frame=10,
        n_sample_on_ray=30, recon_n_pts=2000, max_iter=50,
        coarse_to_fine=True, fine_max_iter=2,
        coarse_frame_stride=4, coarse_ray_frac=0.3, coarse_sample_frac=0.35,
        coarse_pts_frac=0.3, coarse_max_iter=8, coarse_fused_tr=64,
        fine_ray_frac=0.6, fine_sample_frac=0.75, fine_pts_frac=0.6,
    )


def main():
    from hortimapping_tpu.models.workspace import config_decoder
    from hortimapping_tpu.ops.mesher import MeshExtractor

    params, spec = config_decoder(os.path.join(ASSETS, "synthetic_pepper_32"))
    cfg = bench_cfg()
    cube_radius = 0.08  # object_radius_max_m, wild_pepper.yaml
    mc_res_mm = 4.0
    voxels_dim = int(2 * cube_radius * 1e3 / mc_res_mm)  # = 40

    obs, lat0, T0 = build_batch(spec, cfg, N_FRUITS)
    mesher = MeshExtractor(params, spec, voxels_dim=voxels_dim, cube_radius=cube_radius)

    # retrieval warm start (optim/warmstart.py): per-fruit code from the
    # trained latent table scored against the observed cloud — held-out
    # validated CD -9% over the mean init at the same schedule
    # (docs/PERF.md round 3, re-measured after the NN-metric fix). bf16
    # scoring over 128 points at UNIT scale (~0.5 ms/fruit): on 4 held-out
    # seed sets the 3-scale grid was never better (round 4, "unit-scale
    # retrieval on wild") — the Sim(3) solver owns scale. The warm start
    # is what lets the coarse phase stop at 8 iterations.
    from hortimapping_tpu.models.workspace import load_latent_vectors
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    latent_table = load_latent_vectors(os.path.join(ASSETS, "synthetic_pepper_32"))

    C = spec.code_length

    def dispatch():
        # retrieval scoring + both c2f phases in ONE dispatched program;
        # JAX dispatch is async, so this returns immediately with the packed
        # device buffer still computing — the fetch below is the sync point
        res = retrieval_joint_opt(
            params, spec, cfg, latent_table, obs, T0, cube_radius,
            n_score_pts=128, n_scales=1, scale_min=1.0, scale_max=1.0,
            score_bf16=True,
        )
        return mesher.pack_solve_with_grids(res)

    def consume(pack):
        # solve result + SDF grids cross the tunnel in ONE bitcast-packed
        # fetch (mesher.pack_solve_with_grids): every separate np.asarray is
        # a round trip with polling backoff (~30-80 ms each measured; the
        # former two-fetch overlap scheme ran ~456 ms/rep, this ~395)
        host = np.asarray(pack)
        head, grids = mesher.unpack_solve_with_grids(host)
        T_wo = np.linalg.inv(head[:, C:C + 16].reshape(-1, 4, 4))
        meshes = [
            m.transform(T) for m, T in zip(mesher.meshes_from_grids(grids), T_wo)
        ]
        return head, meshes

    consume(dispatch())  # warmup: compile + first meshing
    # steady-state throughput with ONE batch in flight (double-buffered):
    # dispatch batch k+1 before fetching batch k, so the ~45 ms tunnel fetch
    # + ~20 ms host marching tetrahedra of batch k run UNDER batch k+1's
    # device solve — exactly how serve.py's pipelined worker consumes
    # batches. Measured on this link: ~315 ms/rep sequential vs ~170 ms/rep
    # pipelined for the identical program (docs/PERF.md round 3).
    n_rep = 7
    reps = []
    inflight = dispatch()
    # rep 0 is discarded: its in-flight batch was dispatched before the
    # timer started (a head start equal to the loop-entry overhead), which
    # biases it fast — the timed reps all pay the full dispatch+consume cost
    for i in range(n_rep + 1):
        t0 = time.perf_counter()
        nxt = dispatch()
        res, meshes = consume(inflight)
        inflight = nxt
        if i > 0:
            reps.append(time.perf_counter() - t0)
    consume(inflight)
    # median over reps: the remote-TPU link adds occasional multi-hundred-ms
    # hiccups that a mean would average into the device number
    import sys

    print("rep times (ms):", [round(r * 1e3) for r in reps], file=sys.stderr)
    dt = sorted(reps)[len(reps) // 2]

    per_fruit_s = dt / N_FRUITS
    print(
        json.dumps(
            {
                "metric": "per_fruit_throughput",
                "value": round(per_fruit_s * 1e3, 3),
                "unit": "ms",
                "pipelined": True,
                "note": "steady-state throughput per fruit, one batch in "
                        "flight (serve.py worker schedule); B=1 p50 latency "
                        "is 31.6 ms solve / 41.5 ms incl. mesh+pose "
                        "(tools/b1_latency.py, docs/PERF.md)",
                "vs_baseline": round(BASELINE_PER_FRUIT_S / per_fruit_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
