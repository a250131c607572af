"""Pool wild pose-noise head-to-head JSON dumps across --base-seed runs.

    python tools/pool_wild_pose.py [--variant NAME] [--against NAME]
                                   out1.json out2.json ...

Each input comes from `tools/reference_head2head_wild.py --pose-noise
--json-out ...` (must contain the `--against` variant; default
`reference`, which requires runs made without --ours-only). Prints pooled
paired statistics (the `--variant` rows, default the shipped
retrieval+c2f, vs the against side): mean delta +- sem per metric, win
counts — the same discipline as the lab/greenhouse pooled studies
(tools/pool_h2h.py).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    argv = sys.argv[1:]
    variant, against = "retrieval", "reference"
    if "--variant" in argv:
        i = argv.index("--variant")
        variant = argv[i + 1]
        del argv[i:i + 2]
    if "--against" in argv:
        i = argv.index("--against")
        against = argv[i + 1]
        del argv[i:i + 2]
    paths = argv
    if not paths:
        sys.exit(__doc__)
    metrics = ["cd_mm", "trans_mm", "rot_deg", "scale_pct"]
    ours = {m: [] for m in metrics}
    ref = {m: [] for m in metrics}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for side, name in [("ours", variant), ("against", against)]:
            if name not in d["variants"]:
                sys.exit(f"{p}: no '{name}' variant "
                         f"(has: {sorted(d['variants'])})")
        for m in metrics:
            if m in d["variants"][variant]:
                ours[m] += d["variants"][variant][m]
                ref[m] += d["variants"][against][m]
    n = len(ours["cd_mm"])
    print(f"pooled N = {n} fruits over {len(paths)} run(s); "
          f"paired ours({variant}) - {against}:")
    for m in metrics:
        if not ours[m]:
            continue
        a, b = np.array(ours[m]), np.array(ref[m])
        d = a - b
        sem = d.std(ddof=1) / np.sqrt(len(d))
        verdict = ("WIN" if d.mean() < -2 * sem else
                   "LOSS" if d.mean() > 2 * sem else "parity")
        print(f"  {m:10s} ours {a.mean():7.3f}  ref {b.mean():7.3f}  "
              f"delta {d.mean():+7.3f} +- {sem:.3f} "
              f"({d.mean() / sem if sem else 0:+.1f} sem)  "
              f"wins {(d < 0).sum()}/{len(d)}  -> {verdict}")


if __name__ == "__main__":
    main()
