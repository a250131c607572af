"""Pool per-instance head-to-head JSONs (reference_head2head_lab --json-out)
from multiple seeds into one paired verdict (VERDICT r3 task #2: resolve the
multi-frame modes at N >= 16 instances).

Usage: python tools/pool_h2h.py out1.json out2.json ...

Prints pooled paired CD delta (mean, sem, wins) and — for greenhouse —
pooled paired translation/rotation deltas, plus the verdict sentence the
docs should carry ("win" needs |mean| >= 2 sem; otherwise "parity").
"""

from __future__ import annotations

import json
import sys

import numpy as np


def paired(rows, ours_key, ref_key):
    d = np.array([r[ours_key] - r[ref_key] for r in rows if r.get(ours_key) is not None])
    if len(d) == 0:
        return None
    sem = d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else float("nan")
    return dict(n=len(d), mean=float(d.mean()), sem=float(sem),
                wins=int((d < 0).sum()),
                verdict=("win" if d.mean() <= -2 * sem else
                         "loss" if d.mean() >= 2 * sem else "parity"))


def main(paths):
    rows, metas = [], []
    for p in paths:
        with open(p) as f:
            rec = json.load(f)
        metas.append({k: rec[k] for k in ("family", "multi", "seed", "n_fruits",
                                          "variant")})
        rows.extend(rec["instances"])
    fams = {m["family"] for m in metas}
    assert len(fams) == 1, f"mixing families: {fams}"
    print(f"pooled {len(rows)} instances from {len(paths)} runs "
          f"({[m['seed'] for m in metas]} seeds, variant(s) "
          f"{sorted({m['variant'] for m in metas})})")
    out = {"runs": metas, "n_instances": len(rows)}
    for name, ok, rk in (("cd_mm", "ours_cd_mm", "ref_cd_mm"),
                         ("trans_mm", "ours_trans_mm", "ref_trans_mm"),
                         ("rot_deg", "ours_rot_deg", "ref_rot_deg")):
        st = paired(rows, ok, rk) if rows and ok in rows[0] else None
        if st:
            out[name] = st
            ours = np.mean([r[ok] for r in rows])
            ref = np.mean([r[rk] for r in rows])
            print(f"{name:9s}: ours {ours:8.4f}  ref {ref:8.4f}  "
                  f"paired delta {st['mean']:+.4f} sem {st['sem']:.4f} "
                  f"({st['mean']/st['sem']:+.1f} sems)  wins {st['wins']}/{st['n']}"
                  f"  -> {st['verdict'].upper()}")
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
