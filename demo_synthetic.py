"""Self-contained quickstart: synthetic data -> wild completion -> meshes.

No downloads needed (this environment has zero egress; the real datasets
come via `scripts/download_*.sh`). Generates a small BUP20-layout synthetic
scene (analytic ellipsoid fruits rendered to posed RGB-D + instance masks,
`hortimapping_tpu/tools/make_demo_data.py`), then runs the full wild
completion pipeline (`test_wild_completion.py` equivalent) with the tuned
TPU config and reports what was written where.

    python demo_synthetic.py                 # ~1 min incl. TPU compile
    python demo_synthetic.py --config configs/wild_pepper.yaml   # parity solver
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default=os.path.join(ROOT, "configs", "wild_pepper_tpu.yaml"))
    ap.add_argument("--data", default=os.path.join(ROOT, "data", "BUP20_example_data"))
    ap.add_argument("--n-fruits", type=int, default=3)
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate the synthetic dataset even if present")
    args = ap.parse_args()

    if args.fresh or not os.path.isdir(os.path.join(args.data, "submaps")):
        print(f"generating synthetic BUP20-layout dataset in {args.data} ...")
        subprocess.run(
            [sys.executable, "-m", "hortimapping_tpu.tools.make_demo_data",
             "--out", args.data, "--n_fruits", str(args.n_fruits)],
            check=True, cwd=ROOT)

    import yaml

    cfg = yaml.safe_load(open(args.config))
    cfg["data_dir"] = args.data
    cfg["cam_info_path"] = os.path.join(args.data, "cam_info.yaml")

    from hortimapping_tpu.pipeline.wild import run_wild_completion

    t0 = time.perf_counter()
    results = run_wild_completion(cfg)
    dt = time.perf_counter() - t0
    ok = [r for r in results if r.valid]
    print(f"\ncompleted {len(ok)}/{len(results)} fruit submaps in {dt:.1f} s "
          f"(includes one-time XLA compile)")
    import numpy as np

    for r in ok:
        scale = float(np.linalg.det(r.T_wo[:3, :3]) ** (1.0 / 3.0))
        print(f"  {r.name}: {r.iter_count} LM iters, final scale {scale:.3f}")
    out = cfg["data_dir"]
    print(f"\noutputs (reference-compatible layout):")
    for sub in ("submaps_complete", "submaps_clean", "submaps_pose"):
        d = os.path.join(out, sub)
        if os.path.isdir(d):
            print(f"  {d}/: {sorted(os.listdir(d))}")


if __name__ == "__main__":
    main()
