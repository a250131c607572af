"""Pair family_probe per-instance arrays (ours, per solver variant) against
the reference per-instance values stored in head-to-head JSON dumps.

The head-to-head (`tools/reference_head2head_lab.py --json-out`) runs ours
AND the genuine reference once per seed and stores per-instance metrics;
the variant sweep (`tools/family_probe.py` with `JSON_OUT=`) re-runs only
OUR side per variant on the SAME deterministic datasets. Pairing the two
gives a paired delta per variant without re-running the slow reference.

Usage:
    python tools/pair_variants.py --h2h '/tmp/h2h_gh_multi_s*.json' \
                                  --vars '/tmp/gh_var_s*.json'
"""

from __future__ import annotations

import argparse
import glob
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h2h", required=True, help="glob of h2h --json-out files")
    ap.add_argument("--vars", required=True, help="glob of family_probe JSON_OUT files")
    args = ap.parse_args()

    ref = {}  # (seed, idx) -> instance dict
    counts = {}
    for p in sorted(glob.glob(args.h2h)):
        with open(p) as f:
            rec = json.load(f)
        s = rec["seed"]
        for i, r in enumerate(rec["instances"]):
            ref[(s, i)] = r
        counts[s] = len(rec["instances"])

    ours = {}  # variant -> list of (seed, idx, cd, trans, rot)
    for p in sorted(glob.glob(args.vars)):
        with open(p) as f:
            rec = json.load(f)
        s = rec["seed"]
        if s not in counts:
            print(f"{p}: seed {s} has no h2h reference run, skipping")
            continue
        for v, d in rec["variants"].items():
            n = len(d["cd_per_fruit_mm"])
            if n != counts[s]:
                print(f"WARNING seed {s} variant {v}: {n} instances vs ref {counts[s]}")
            for i in range(min(n, counts[s])):
                ours.setdefault(v, []).append(
                    (s, i, d["cd_per_fruit_mm"][i],
                     d.get("tran_err_per_fruit_mm", [None] * n)[i],
                     d.get("rot_err_per_fruit_deg", [None] * n)[i]))

    def st(d):
        d = np.asarray(d, np.float64)
        sem = d.std(ddof=1) / np.sqrt(len(d))
        return f"{d.mean():+7.3f}±{sem:.3f} ({d.mean() / sem:+4.1f}s)"

    print(f"{'variant':<16}{'N':>3} {'CD d(mm)':>22} {'trans d(mm)':>22} "
          f"{'rot d(deg)':>22}")
    for v, rows in ours.items():
        dc = [c - ref[(s, i)]["ref_cd_mm"] for s, i, c, t, r in rows]
        cols = [st(dc)]
        if rows[0][3] is not None and "ref_trans_mm" in ref[rows[0][:2]]:
            cols.append(st([t - ref[(s, i)]["ref_trans_mm"] for s, i, c, t, r in rows]))
            cols.append(st([r - ref[(s, i)]["ref_rot_deg"] for s, i, c, t, r in rows]))
        else:
            cols += ["-", "-"]
        print(f"{v:<16}{len(rows):>3} {cols[0]:>22} {cols[1]:>22} {cols[2]:>22}")


if __name__ == "__main__":
    main()
