"""Roofline check: how close is the shipped bench solve to v5e peak?

Counts the MXU FLOPs the bench program actually executes (decoder matmuls
at the fused kernel's padded layout, per phase of the shipped
retrieval + coarse-to-fine schedule, using the MEASURED while_loop trip
counts) and divides by measured device time to report achieved TFLOP/s
against the chip's bf16 peak. This grounds the "speed-of-light" claim for
the hot path (`bench.py`, docs/PERF.md) — or quantifies the headroom left.

    python tools/roofline.py [--n-fruits 32] [--reps 8]

Methodology notes:
  * FLOPs are EXECUTED MXU flops: the fused kernel pads the 35-d input and
    the scalar head to 128 lanes (ops/pallas_mlp.py:10-22), frozen lanes
    keep stepping inside the shared while_loop, and both phases run until
    their slowest lane converges — so trip counts are max-over-lanes.
  * The fused fwd+input-grad kernel does one forward chain plus one
    reverse `g @ W^T` chain — 2x the forward matmul flops. Grid decode and
    retrieval scoring are forward-only.
  * Device time is amortized: `--reps` identical programs dispatched
    back-to-back (async) with one final block, so the ~30 ms tunnel round
    trip is paid once, not per rep.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

V5E_BF16_TFLOPS = 197.0  # per-chip peak, public v5e spec


def decoder_fwd_flops_per_point(spec, padded: bool) -> float:
    """Matmul FLOPs (2*m*n per point) of one decoder forward pass.

    padded=True counts the fused kernel's executed layout: input and head
    padded to 128 lanes, every hidden width at spec.dims (the latent_in
    narrow layer is lane-padded back to full width).
    """
    lane = 128
    dims = list(spec.dims)
    in_dim = spec.code_length + 3
    total = 0
    if padded:
        total += 2 * lane * dims[0]                       # W0: 128 -> 512
        for l in range(1, len(dims)):
            total += 2 * dims[l - 1] * dims[l]            # hidden (padded)
        total += 2 * dims[-1] * lane                      # head: 512 -> 128
        # latent_in skip as a placement matmul x @ P (128 x 512)
        if spec.latent_in:
            total += 2 * lane * dims[0]
    else:
        fan = [(in_dim, dims[0])]
        for l in range(1, len(dims)):
            fan_out = dims[l] - (in_dim if (l + 1) in spec.latent_in else 0)
            fan.append((dims[l - 1], fan_out))
        fan.append((dims[-1], 1))
        total = sum(2 * a * b for a, b in fan)
    return float(total)


def phase_points(cfg, stride, ray_frac, sample_frac, pts_frac) -> int:
    """Decoder evaluations per fruit per LM iteration of one c2f phase
    (mirrors optim/lm.py:699-703 subsample arithmetic)."""
    n_rays = int(cfg.n_fg_pix * ray_frac) + int(cfg.n_bg_pix * ray_frac)
    m = max(int(cfg.n_sample_on_ray * sample_frac), 2)
    f = (cfg.n_frame + stride - 1) // stride
    return f * n_rays * m + int(cfg.recon_n_pts * pts_frac)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fruits", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--with-grids", action="store_true",
                    help="include the SDF grid decode + packed fetch "
                         "(the full bench dispatch) instead of solve-only")
    ap.add_argument("--json-out", default=None,
                    help="also dump {flops, device time, achieved TF/s, "
                         "%% of peak} as JSON evidence")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))

    import bench
    from hortimapping_tpu.models.workspace import (config_decoder,
                                                   load_latent_vectors)
    from hortimapping_tpu.ops.mesher import MeshExtractor
    from hortimapping_tpu.optim.warmstart import retrieval_joint_opt

    params, spec = config_decoder(os.path.join(ROOT, "assets",
                                               "synthetic_pepper_32"))
    cfg = bench.bench_cfg()
    obs, lat0, T0 = bench.build_batch(spec, cfg, args.n_fruits)
    latent_table = load_latent_vectors(
        os.path.join(ROOT, "assets", "synthetic_pepper_32"))
    mesher = MeshExtractor(params, spec, voxels_dim=40, cube_radius=0.08)

    def solve():
        return retrieval_joint_opt(
            params, spec, cfg, latent_table, obs, T0, 0.08,
            n_score_pts=128, n_scales=1, scale_min=1.0, scale_max=1.0,
            score_bf16=True,
        )

    def dispatch():
        res = solve()
        if args.with_grids:
            return mesher.pack_solve_with_grids(res)
        return jnp.concatenate(
            [res.latent,
             res.T_ow.reshape(args.n_fruits, 16),
             res.iter_count[:, None].astype(jnp.float32)], axis=1)

    # ---- measured trip counts (the while_loop runs to the slowest lane) ----
    res = jax.block_until_ready(solve())
    total_iters = np.asarray(res.iter_count)
    fine_cap = cfg.fine_max_iter or cfg.max_iter
    coarse_trips = int(total_iters.max()) - fine_cap  # fine lanes never
    fine_trips = fine_cap                             # converge before cap 2
    print(f"iter_count: max {int(total_iters.max())}, "
          f"mean {total_iters.mean():.1f} -> coarse trips {coarse_trips}, "
          f"fine trips {fine_trips}")

    # ---- timed: reps back-to-back, one sync ----
    out = dispatch()
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    outs = [dispatch() for _ in range(args.reps)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / args.reps
    ms_fruit = dt * 1e3 / args.n_fruits

    # ---- executed-FLOP model ----
    fwd_pad = decoder_fwd_flops_per_point(spec, padded=True)
    fwd_use = decoder_fwd_flops_per_point(spec, padded=False)
    pts_coarse = phase_points(cfg, cfg.coarse_frame_stride,
                              cfg.coarse_ray_frac, cfg.coarse_sample_frac,
                              cfg.coarse_pts_frac)
    pts_fine = phase_points(cfg, cfg.fine_frame_stride, cfg.fine_ray_frac,
                            cfg.fine_sample_frac, cfg.fine_pts_frac)
    n_codes = int(latent_table.shape[0])
    per_fruit = {
        "retrieval scoring (fwd, 128 pts x table)": 128 * n_codes * fwd_pad,
        f"coarse phase ({coarse_trips} it x {pts_coarse} pts, fwd+grad)":
            coarse_trips * pts_coarse * 2 * fwd_pad,
        f"fine phase ({fine_trips} it x {pts_fine} pts, fwd+grad)":
            fine_trips * pts_fine * 2 * fwd_pad,
    }
    if args.with_grids:
        per_fruit["grid decode (fwd, 40^3)"] = 40 ** 3 * fwd_pad
    tot = sum(per_fruit.values())
    print(f"\nexecuted MXU FLOPs per fruit (padded-lane layout, "
          f"useful/executed fwd ratio {fwd_use / fwd_pad:.2f}):")
    for k, v in per_fruit.items():
        print(f"  {k:58s} {v / 1e9:8.1f} GFLOP")
    print(f"  {'total':58s} {tot / 1e9:8.1f} GFLOP")

    tflops = tot / 1e12 / (ms_fruit / 1e3)
    label = "full dispatch (solve+grids)" if args.with_grids else "solve-only"
    print(f"\n{label}, B={args.n_fruits}, {args.reps} reps amortized:")
    print(f"  device time        {dt * 1e3:7.1f} ms/rep  "
          f"({ms_fruit:.2f} ms/fruit)")
    print(f"  achieved           {tflops:7.1f} TFLOP/s")
    print(f"  v5e bf16 peak      {V5E_BF16_TFLOPS:7.1f} TFLOP/s  "
          f"-> {100 * tflops / V5E_BF16_TFLOPS:.0f}% MXU utilization")
    if args.json_out:
        import json
        with open(args.json_out, "w") as f:
            json.dump({
                "program": label, "n_fruits": args.n_fruits,
                "reps": args.reps,
                "coarse_trips": coarse_trips, "fine_trips": fine_trips,
                "executed_gflop_per_fruit": tot / 1e9,
                "useful_over_executed_fwd": fwd_use / fwd_pad,
                "ms_per_rep": dt * 1e3, "ms_per_fruit": ms_fruit,
                "achieved_tflops": tflops,
                "peak_bf16_tflops": V5E_BF16_TFLOPS,
                "mxu_utilization_pct": 100 * tflops / V5E_BF16_TFLOPS,
            }, f, indent=1)


if __name__ == "__main__":
    main()
