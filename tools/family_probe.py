"""Quality probe for solver/init variants on the lab + greenhouse families.

Companion to `tools/challenge_probe.py` (same variant grammar) for the two
eval families where round 3 is still at reference parity: runs
`pipeline/lab.run_lab_eval` / `pipeline/greenhouse.run_greenhouse_eval`
with an injected `opt.tpu` block on a synthetic dataset, so init/solver
choices can be tuned on one seed and validated held-out on others.

Usage:
    FAMILY=greenhouse MODE=multi SEED=23 N_FRUITS=8 \
        python tools/family_probe.py mean retrieval retrieval_tr

Env: FAMILY=lab|greenhouse, MODE=single|multi, SEED (dataset seed; 23 is
the head-to-head/tuning seed — use a different one for held-out), N_FRUITS,
N_FRAMES. Variants: mean | retrieval [_msK] [_tr] [_itN] — see
`challenge_probe.variant_tpu_block`.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from challenge_probe import variant_tpu_block  # noqa: E402
from reference_head2head_lab import _gh_cfg, _lab_cfg  # noqa: E402

FAMILY = os.environ.get("FAMILY", "greenhouse")
MODE = os.environ.get("MODE", "multi")
SEED = int(os.environ.get("SEED", "23"))
N_FRUITS = int(os.environ.get("N_FRUITS", "8"))
N_FRAMES = int(os.environ.get("N_FRAMES", "6"))


def main(variants) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/horti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    deepsdf_dir = os.path.join(ROOT, "assets", "synthetic_pepper_32")
    multi = MODE == "multi"

    if FAMILY == "lab":
        from hortimapping_tpu.pipeline.lab import run_lab_eval
        from hortimapping_tpu.tools.make_demo_data import make_lab_dataset

        data_dir = os.path.join(ROOT, "data", f"h2h_lab_s{SEED}_n{N_FRUITS}")
        if not os.path.isdir(data_dir):
            print(f"generating lab dataset (seed {SEED}, {N_FRUITS} fruits)")
            make_lab_dataset(data_dir, deepsdf_dir, n_fruits=N_FRUITS,
                             n_frames=N_FRAMES, seed=SEED)
        base_cfg = lambda: _lab_cfg(data_dir, deepsdf_dir)
        run = lambda cfg: run_lab_eval(cfg, multi_frame=multi,
                                       log=lambda *a: None)
    elif FAMILY == "greenhouse":
        from hortimapping_tpu.pipeline.greenhouse import run_greenhouse_eval
        from hortimapping_tpu.tools.make_demo_data import make_greenhouse_dataset

        data_dir = os.path.join(ROOT, "data",
                                f"h2h_greenhouse_s{SEED}_n{N_FRUITS}")
        if not os.path.isdir(data_dir):
            print(f"generating greenhouse dataset (seed {SEED}, "
                  f"{N_FRUITS} fruits)")
            make_greenhouse_dataset(data_dir, deepsdf_dir, n_fruits=N_FRUITS,
                                    n_frames=N_FRAMES, seed=SEED)
        base_cfg = lambda: _gh_cfg(data_dir, deepsdf_dir)
        run = lambda cfg: run_greenhouse_eval(cfg, multi_frame=multi,
                                              log=lambda *a: None)
    else:
        raise SystemExit(f"unknown FAMILY {FAMILY}")

    json_out = os.environ.get("JSON_OUT")
    dump = {"family": FAMILY, "mode": MODE, "seed": SEED,
            "n_fruits": N_FRUITS, "variants": {}}
    for name in variants:
        cfg = base_cfg()
        tpu, max_iter = variant_tpu_block(name)
        cfg.setdefault("opt", {})["tpu"] = tpu
        if max_iter is not None:
            cfg["opt"].setdefault("converge", {})["max_iter"] = max_iter
        t0 = time.perf_counter()
        summary = run(cfg)
        dt = time.perf_counter() - t0
        extra = ""
        if "Error_trans[mm]" in summary:
            extra = (f"  trans {summary['Error_trans[mm]']:.2f} mm"
                     f"  rot {summary['Error_rot[deg]']:.1f} deg")
        print(
            f"{name:16s} CD {summary['CD[mm]']:.4f} mm  "
            f"F1 {summary['F-score[%]']:.2f}%  "
            f"iters {summary['iteration']:.1f}{extra}  wall {dt:.1f} s",
            flush=True,
        )
        if json_out:
            dump["variants"][name] = {
                k: summary[k] for k in ("cd_per_fruit_mm",
                                        "tran_err_per_fruit_mm",
                                        "rot_err_per_fruit_deg")
                if k in summary
            }
        shutil.rmtree(os.path.join(data_dir, "results"), ignore_errors=True)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(dump, f, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["mean", "retrieval", "retrieval_tr"])
