#!/usr/bin/env python
"""Calibrate the Cityscapes reference-certification bands (VERDICT r4 #4).

Cityscapes analogue of calibrate_certification_bands.py: runs the exact
machinery of tests/test_reference_cityscapes_cert.py once — build the
Voronoi tree, train the certification checkpoint, score it with OUR
`cityscapes_eval.run_inference` at each of OUR_EVAL_SEEDS (the test
compares the seed MEAN), export to .pt, then score the same checkpoint with
the reference's own `eval_cdm.run_inference` at several torch seeds. The
printed spread of |mean(ours) - theirs(seed_i)| is the ancestral-sampling
noise the test's MIOU_BAND / CM19_BAND must absorb; pin each at max|diff|
plus ~50-150% margin.

Usage:  python scripts/calibrate_cs_certification.py
Output: per-seed table + suggested bands (JSON on the last line).
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

import test_reference_cityscapes_cert as cert

REF_SEEDS = (0, 1, 2)


def main() -> int:
    tree = tempfile.mkdtemp(prefix="cs_calib_tree_")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from cityscapes_gate import make_learnable_tree

    make_learnable_tree(tree, n_train=24, n_val=cert.N_VAL, size=cert.SIZE,
                        seed=0)
    os.environ["CCDM_CITYSCAPES_PATH"] = tree

    out = tempfile.mkdtemp(prefix="cs_calib_run_")
    print(f"[calib] training certification checkpoint -> {out}")
    cert.train_cs_checkpoint(out)

    our_runs = []
    for s in cert.OUR_EVAL_SEEDS:
        r = cert.our_eval(out, tempfile.mkdtemp(prefix=f"cs_calib_eval{s}_"), s)
        our_runs.append(r)
        print(f"[calib] ours seed {s}: "
              f"official={r['official']['averageScoreClasses']:.4f}")
    ours = cert.mean_our_evals(our_runs)
    print(f"[calib] ours mean: official={ours['official_miou']:.4f} "
          f"cm19={ours['cm19_miou']:.4f}")

    pt_path = os.path.join(out, "exported.pt")
    cert.export_checkpoint(out, pt_path)

    cert.install_reference_path()
    diffs_official, diffs_cm19 = [], []
    for s in REF_SEEDS:
        workdir = tempfile.mkdtemp(prefix=f"cs_calib_ref{s}_")
        theirs, theirs_cm, _, _ = cert._run_reference_eval(
            pt_path, workdir, torch_seed=s)
        d_off = abs(ours["official_miou"] - theirs["averageScoreClasses"])
        d_cm = abs(ours["cm19_miou"] - theirs_cm)
        diffs_official.append(d_off)
        diffs_cm19.append(d_cm)
        print(f"[calib] reference torch seed {s}: "
              f"official={theirs['averageScoreClasses']:.4f} cm19={theirs_cm:.4f} "
              f"|d_off|={d_off:.4f} |d_cm19|={d_cm:.4f}")

    suggestion = {
        "max_abs_diff_official": round(max(diffs_official), 4),
        "max_abs_diff_cm19": round(max(diffs_cm19), 4),
        "suggested_MIOU_BAND": round(2.5 * max(diffs_official), 3),
        "suggested_CM19_BAND": round(2.5 * max(diffs_cm19), 3),
        "current_MIOU_BAND": cert.MIOU_BAND,
        "current_CM19_BAND": cert.CM19_BAND,
    }
    print(json.dumps(suggestion))
    return 0


if __name__ == "__main__":
    sys.exit(main())
