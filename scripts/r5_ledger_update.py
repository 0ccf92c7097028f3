"""Bank the round-5 continuation drag rows into results/RESULTS.json.

Reads outputs/drag_study/*.npz (written by scripts/drag_study.py in the
2026-08-21 continuation session) and updates the `drag-study-r5` entry
in place: fills in any newly landed rows (notably the flagship
optimal-policy-observer / optimal-observer gradient rows), records per-row
step counts (partial-banked rows are budget-bounded, reported as such),
and refreshes the unit string's vs-unmanipulated percentages.

Idempotent; run any time.  Usage: python scripts/r5_ledger_update.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "outputs/drag_study"
LEDGER = "results/RESULTS.json"
ROWS = ["unmanipulated", "gt", "rand", "fno", "rno", "transformer",
        "optimal-policy-observer", "optimal-observer", "ddpg"]


def main():
    d = json.load(open(LEDGER))
    entry = next(e for e in d["entries"] if e["id"] == "drag-study-r5")
    vals = dict(entry["value"])
    # rows ledgered before this script existed all ran the full 50k
    steps = {k: 50000 for k in vals}
    steps.update(entry.get("steps", {}))
    fresh = {}
    for name in ROWS:
        npz = os.path.join(OUT, f"{name}.npz")
        if not os.path.exists(npz):
            continue
        z = np.load(npz, allow_pickle=True)
        shear = z["shear"]
        tail = float(np.mean(shear[len(shear) // 2:]))
        n = int(len(shear))
        tag = str(z["tag"]) if "tag" in z else name
        prev = vals.get(name)
        vals[name] = tail
        steps[name] = n
        fresh[name] = (tail, n, tag, prev)
    base = vals.get("unmanipulated")
    pct = {k: 100.0 * (v - base) / base for k, v in vals.items()
           if k != "unmanipulated" and base}
    entry["value"] = vals
    entry["steps"] = steps
    entry["unit"] = ("tail-mean shear over the banked series' last half "
                     "(lower better); vs unmanipulated: "
                     + ", ".join(f"{k} {pct[k]:+.1f}%" for k in ROWS
                                 if k in pct))
    with open(LEDGER, "w") as f:
        json.dump(d, f, indent=1)
    print("updated drag-study-r5:")
    for k in ROWS:
        if k in vals:
            n = steps.get(k)
            note = "" if (n or 50000) >= 50000 else "  (budget-bounded)"
            p = f" {pct[k]:+.1f}%" if k in pct else ""
            star = " *fresh*" if k in fresh else ""
            print(f"  {k:26s} {vals[k]:.6e}{p}  steps={n}{note}{star}")


if __name__ == "__main__":
    main()
