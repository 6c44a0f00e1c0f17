#!/usr/bin/env python
"""Calibrate the reference-certification tolerance bands (VERDICT r3 #5).

Runs the exact machinery of tests/test_reference_certification.py once:
train the tiny certification checkpoint, evaluate it with OUR harness at
each of OUR_EVAL_SEEDS (the test compares the seed MEAN), export to .pt,
then score the same checkpoint with the reference's own
`eval_lidc_uncertainty` driver at several torch seeds. The printed spread
of |mean(ours) - theirs(seed_i)| is the ancestral-sampling noise the test's
bands must absorb; pin each band at max|diff| plus ~50% margin.

Usage:  python scripts/calibrate_certification_bands.py
Output: per-metric table + suggested bands (JSON on the last line).
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

import test_reference_certification as cert

REF_SEEDS = (0, 1, 2)


def main() -> int:
    with cert.patched_synthetic():
        out = tempfile.mkdtemp(prefix="cert_calib_")
        print(f"[calib] training certification checkpoint -> {out}")
        cert.train_certification_checkpoint(out)

        our_runs = []
        for s in cert.OUR_EVAL_SEEDS:
            r = cert.our_eval(out, s)
            our_runs.append(r)
            print(f"[calib] ours seed {s}: " + " ".join(
                f"{k}={r[k]:.4f}" for k in sorted(r)
                if k.startswith(("GED_", "HMIoU_"))))
        ours = cert.mean_metrics(our_runs)

        pt_path = os.path.join(out, "exported.pt")
        cert.export_checkpoint(out, pt_path)

        cert.install_reference_path()
        theirs_runs = []
        for s in REF_SEEDS:
            t = cert.run_reference_eval(pt_path, torch_seed=s)
            theirs_runs.append(t)
            print(f"[calib] reference torch seed {s}: " + " ".join(
                f"{k}={t[k]:.4f}" for k in sorted(t)
                if k.startswith(("GED_", "HMIoU_"))))

    keys = [f"GED_{s}" for s in cert.EVALUATIONS] + \
           [f"HMIoU_{s}" for s in cert.EVALUATIONS]
    suggested = {}
    for k in keys:
        diffs = [abs(ours[k] - t[k]) for t in theirs_runs]
        suggested[k] = round(1.5 * max(diffs) + 0.005, 3)
        print(f"[calib] {k}: ours(mean)={ours[k]:.4f} "
              f"theirs={[round(t[k], 4) for t in theirs_runs]} "
              f"|diff|max={max(diffs):.4f} -> band {suggested[k]}")
    d_diffs = [abs(ours["Dice"][1] - t["Dice"][1]) for t in theirs_runs]
    suggested["Dice1"] = round(1.5 * max(d_diffs) + 0.005, 3)
    print(f"[calib] Dice[1]: ours={ours['Dice'][1]:.4f} "
          f"theirs={[round(t['Dice'][1], 4) for t in theirs_runs]} "
          f"|diff|max={max(d_diffs):.4f} -> band {suggested['Dice1']}")
    m_diffs = [abs(ours["mIoU"] - t["mIoU"]) for t in theirs_runs]
    suggested["mIoU"] = round(1.5 * max(m_diffs) + 0.005, 3)
    print(f"[calib] mIoU: ours={ours['mIoU']:.4f} "
          f"theirs={[round(t['mIoU'], 4) for t in theirs_runs]} "
          f"|diff|max={max(m_diffs):.4f} -> band {suggested['mIoU']}")
    print(json.dumps(suggested))
    return 0


if __name__ == "__main__":
    sys.exit(main())
