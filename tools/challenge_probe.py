"""Quality/perf probe for the ECCV challenge config (solver + init variants).

The challenge workload is the one externally scored benchmark
(`/root/reference/run_shape_completion_challenge.py`); this probe measures
CD / F1 / iterations for init and solver variants of `pipeline/challenge`
on a synthetic challenge dataset, so schedule/init choices can be tuned on
one seed and validated held-out on another (SEED env var; default 11 =
tuning set, any other value = held-out fruits).

Usage:
    python tools/challenge_probe.py [variant ...]
    SEED=900 N_FRUITS=12 python tools/challenge_probe.py mean retrieval

Variants:
    mean           reference-parity init (mean of the latent table)
    retrieval      retrieval (code, scale) init
    retrieval_msK  retrieval + K-start solve, best final objective kept
    mean_tr / retrieval_tr   + trust-region damping
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_FRUITS = int(os.environ.get("N_FRUITS", "12"))
SEED = int(os.environ.get("SEED", "11"))
N_FRAMES = int(os.environ.get("N_FRAMES", "5"))


def variant_tpu_block(name: str) -> tuple:
    """-> (opt.tpu dict, max_iter override or None).

    Variant grammar: base[_s1][_prN][_tr][_ydX][_rdX][_csX][_sdX][_rsN][_ppN]
    [_itN] (suffixes in this order);
    base = mean | retrieval | retrieval_msK. `_s1` scores the retrieval at
    unit scale only — for SE(3) workloads (lab) where an init-scale offset
    could never be optimized away, and for one-view workloads where scale is
    ambiguous. `_prN` sets the prior-shrinkage penalty retrieval_prior_w =
    N/100. `_ppN` runs N code-frozen pose-polish iterations after the joint
    solve. `_ydX`/`_rdX`/`_csX`/`_sdX` set yaw_damp / rot_damp /
    coarse_s_damp / s_damp to the literal float X with `p` as the decimal
    point (e.g. `_yd0p01`). `_rsN` turns on the selective multi-start rescue
    with N starts per hard lane (optim/warmstart.selective_rescue)."""
    tpu: dict = {}
    max_iter = None
    base = name
    if "_it" in base:
        base, it = base.rsplit("_it", 1)
        max_iter = int(it)
    if "_pp" in base:
        # code-frozen pose polish: N extra pose-only LM iterations after the
        # joint solve (optim/lm.pose_polish_batched)
        base, pp = base.rsplit("_pp", 1)
        tpu["pose_polish_iters"] = int(pp)
    if "_rs" in base:
        # selective multi-start rescue of hard lanes: N = rescue_starts
        base, rsn = base.rsplit("_rs", 1)
        tpu["rescue_starts"] = int(rsn)
    if "_sd" in base:
        base, sd = base.rsplit("_sd", 1)
        tpu["s_damp"] = float(sd.replace("p", "."))
    if "_cs" in base:
        # annealed scale damping: coarse-phase-only s_damp override
        base, cs = base.rsplit("_cs", 1)
        tpu["coarse_s_damp"] = float(cs.replace("p", "."))
    if "_rd" in base:
        base, rd = base.rsplit("_rd", 1)
        tpu["rot_damp"] = float(rd.replace("p", "."))
    if "_yd" in base:
        base, yd = base.rsplit("_yd", 1)
        tpu["yaw_damp"] = float(yd.replace("p", "."))
    if base.endswith("_tr"):
        tpu["trust_region"] = True
        base = base[:-3]
    if "_pr" in base:
        base, pr = base.rsplit("_pr", 1)
        tpu["retrieval_prior_w"] = int(pr) / 100.0
    if base.endswith("_c2fw"):
        # the wild-tuned annealing schedule (configs/wild_pepper_tpu.yaml):
        # aggressive coarse phase + short SUBSAMPLED fine polish
        tpu.update(coarse_to_fine=True, fine_max_iter=2,
                   coarse_frame_stride=4, coarse_ray_frac=0.3,
                   coarse_sample_frac=0.35, coarse_pts_frac=0.3,
                   coarse_max_iter=8, coarse_fused_tr=64,
                   fine_ray_frac=0.6, fine_sample_frac=0.75,
                   fine_pts_frac=0.6)
        base = base[:-5]
    elif base.endswith("_c2f"):
        # the mild two-resolution schedule from the round-2 negative result
        # (docs/PERF.md): re-checkable against the fixed NN metric
        tpu.update(coarse_to_fine=True, fine_max_iter=2,
                   coarse_frame_stride=2, coarse_ray_frac=0.5,
                   coarse_sample_frac=0.5, coarse_pts_frac=0.5,
                   coarse_max_iter=10)
        base = base[:-4]
    if base.endswith("_s1"):
        tpu["retrieval_n_scales"] = 1
        tpu["retrieval_scale_min"] = 1.0
        tpu["retrieval_scale_max"] = 1.0
        base = base[:-3]
    if base == "mean":
        pass
    elif base == "retrieval":
        tpu["init_mode"] = "retrieval"
    elif base.startswith("retrieval_ms"):
        tpu["init_mode"] = "retrieval"
        tpu["multi_start"] = int(base[len("retrieval_ms"):])
    else:
        raise SystemExit(f"unknown variant {name}")
    return tpu, max_iter


def main(variants) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hortimapping_tpu.config import load_config
    from hortimapping_tpu.pipeline.challenge import run_challenge
    from hortimapping_tpu.tools.make_demo_data import make_challenge_dataset

    deepsdf_dir = os.path.join(ROOT, "assets", "synthetic_pepper_32")
    data_dir = os.path.join(
        ROOT, "data", f"probe_challenge_s{SEED}_n{N_FRUITS}")
    if not os.path.isdir(os.path.join(data_dir, "val")):
        print(f"generating {N_FRUITS}-fruit challenge dataset (seed {SEED})")
        make_challenge_dataset(data_dir, deepsdf_dir, split="val",
                               n_fruits=N_FRUITS, n_frames=N_FRAMES, seed=SEED)

    for name in variants:
        cfg = load_config(os.path.join(
            ROOT, "configs", "shape_completion_challenge_pepper.yaml"))
        cfg["data_dir"] = data_dir
        cfg["split"] = "val"
        cfg["deepsdf_dir"] = deepsdf_dir
        cfg["run_name"] = f"probe_{name}"
        tpu, max_iter = variant_tpu_block(name)
        cfg.setdefault("opt", {})["tpu"] = tpu
        if max_iter is not None:
            cfg["opt"].setdefault("converge", {})["max_iter"] = max_iter
        t0 = time.perf_counter()
        summary = run_challenge(cfg, log=lambda *a: None)
        dt = time.perf_counter() - t0
        print(
            f"{name:16s} CD {summary['CD[mm]']:.4f} mm  "
            f"F1 {summary['F-score[%]']:.2f}%  "
            f"iters {summary['iteration']:.1f}  "
            f"solve {summary['timing_s']*1e3:.1f} ms/fruit  "
            f"wall {dt:.1f} s",
            flush=True,
        )
        shutil.rmtree(os.path.join(data_dir, "results"), ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["mean", "retrieval"])
