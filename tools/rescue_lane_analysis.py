"""Per-lane evidence for the selective multi-start rescue studies.

Joins the rescue head-to-head dumps (`h2h_gh_rs4_s*.json`, which carry
`rescue: {lanes, cost_before, cost_after, accepted}` from
`optim/warmstart.LAST_RESCUE_INFO`) against the same-seed BASELINE dumps
(round-4 `h2h_gh_s1_s*.json`, the un-rescued `retrieval_s1` solve on
identical instances) and reports, per accepted rescue lane, the objective
improvement vs what it bought: ΔCD / Δrot / Δtrans against the baseline
solve, plus the objective↔quality correlations the rescue's accept rule
rests on.

    python tools/rescue_lane_analysis.py \
        --rescue 'docs/evidence/round5/h2h_gh_rs4_s*.json' \
        --baseline-dir docs/evidence/round4 --baseline-prefix h2h_gh_s1_s \
        [--json-out out.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rescue", default="docs/evidence/round5/h2h_gh_rs4_s*.json")
    ap.add_argument("--baseline-dir", default="docs/evidence/round4")
    ap.add_argument("--baseline-prefix", default="h2h_gh_s1_s")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    base = {}
    for f in sorted(glob.glob(os.path.join(
            args.baseline_dir, args.baseline_prefix + "*.json"))):
        d = json.load(open(f))
        for inst in d["instances"]:
            base[(d["seed"], inst["label"])] = inst

    rows = []
    for f in sorted(glob.glob(args.rescue)):
        d = json.load(open(f))
        resc = d.get("rescue")
        if not resc:
            continue
        acc = set(resc["accepted"])
        cb = np.asarray(resc["cost_before"], float)
        ca = np.asarray(resc["cost_after"], float)
        for j, lane in enumerate(resc["lanes"]):
            inst = d["instances"][lane]
            b = base.get((d["seed"], inst["label"]))
            if b is None:
                continue
            rows.append({
                "seed": d["seed"], "label": inst["label"],
                "accepted": j in acc,
                "dcost_pct": float(100.0 * (ca[j] - cb[j]) / cb[j]),
                "dcd_mm": inst["ours_cd_mm"] - b["ours_cd_mm"],
                "drot_deg": inst["ours_rot_deg"] - b["ours_rot_deg"],
                "dtrans_mm": inst["ours_trans_mm"] - b["ours_trans_mm"],
            })

    acc = [r for r in rows if r["accepted"]]
    dc = np.array([r["dcost_pct"] for r in acc])
    dcd = np.array([r["dcd_mm"] for r in acc])
    drot = np.array([r["drot_deg"] for r in acc])

    def sem(a):
        return float(a.std(ddof=1) / np.sqrt(len(a)))

    out = {
        "n_dispatched": len(rows), "n_accepted": len(acc),
        "accepted_dcd_mean": float(dcd.mean()), "accepted_dcd_sem": sem(dcd),
        "accepted_drot_mean": float(drot.mean()),
        "accepted_drot_sem": sem(drot),
        "corr_dcost_dcd": float(np.corrcoef(dc, dcd)[0, 1]),
        "corr_dcost_drot": float(np.corrcoef(dc, drot)[0, 1]),
        "by_cost_improvement": [],
        "lanes": rows,
    }
    print(f"dispatched {len(rows)} lanes, accepted {len(acc)}")
    print(f"accepted: dCD {dcd.mean():+.3f}±{sem(dcd):.3f} mm, "
          f"drot {drot.mean():+.2f}±{sem(drot):.2f} deg")
    print(f"corr(dcost%, dCD) = {out['corr_dcost_dcd']:+.3f}   "
          f"corr(dcost%, drot) = {out['corr_dcost_drot']:+.3f}")
    for th in (2, 5, 10, 20):
        m = dc < -th
        if m.sum() >= 5:
            rec = {"threshold_pct": th, "n": int(m.sum()),
                   "dcd_mean": float(dcd[m].mean()),
                   "drot_mean": float(drot[m].mean())}
            out["by_cost_improvement"].append(rec)
            print(f"  >{th}% cost improvement: n={m.sum():3d}  "
                  f"dCD {dcd[m].mean():+.3f}  drot {drot[m].mean():+.2f}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
