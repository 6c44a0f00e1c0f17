#!/usr/bin/env python
"""Quality-regression gate: train the flagship config on synthetic data and
FAIL (exit 1) if distributional quality regresses past pinned thresholds.

Protocol = TRAINING_DEMO.md's extended run (reference protocol:
`evaluate_lidc_uncertainty.py` + in-training GED validation,
`ddpm/trainer.py:521-538`): 5000 train steps, then the 16-sample uncertainty
eval on the fixed-seed synthetic test split.

Round-1 measured values at these settings: GED(16) 0.113, HM-IoU(16) 0.757,
nodule Dice 0.841 (TRAINING_DEMO.md). Gates leave headroom for sampling
noise but catch real regressions:

    GED_16  <= 0.15      HMIoU_16 >= 0.70      Dice[nodule] >= 0.78

Usage:  make demo            (or: python scripts/demo_gate.py)
        DEMO_STEPS=800 make demo   # quicker, looser gates scaled off
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# gates for the full 5000-step run; the short (DEMO_STEPS < 5000) run uses
# the step-800 measurements + margin instead (TRAINING_DEMO.md tables)
FULL_GATES = {"GED_16": 0.15, "HMIoU_16": 0.70, "dice_nodule": 0.78}
SHORT_GATES = {"GED_16": 0.25, "HMIoU_16": 0.55, "dice_nodule": 0.70}


def main() -> int:
    import yaml

    steps = int(os.environ.get("DEMO_STEPS", 5000))
    gates = FULL_GATES if steps >= 5000 else SHORT_GATES

    with open(os.path.join(REPO, "configs", "params_demo.yml")) as f:
        train_params = yaml.safe_load(f)
    with open(os.path.join(REPO, "configs", "params_demo_eval.yml")) as f:
        eval_params = yaml.safe_load(f)

    # a fresh run dir every time: a leftover checkpoint from an earlier
    # (possibly longer) run would otherwise be the `latest_step` the eval
    # silently loads, gating stale weights
    import shutil

    from ccdm_tpu.config import expanduservars

    run_dir = expanduservars(train_params["output_path"])
    if os.path.isdir(run_dir):
        shutil.rmtree(run_dir)

    from ccdm_tpu.train.trainer import run_train

    state = run_train(train_params, max_steps=steps)
    assert int(state.step) >= steps

    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    results = eval_lidc_uncertainty(eval_params)
    results["dice_nodule"] = results["Dice"][1]

    failures = []
    for key, bound in gates.items():
        value = float(results[key])
        ok = value <= bound if key.startswith("GED") else value >= bound
        word = "<=" if key.startswith("GED") else ">="
        status = "ok" if ok else "FAIL"
        print(f"[demo-gate] {key} = {value:.4f} (gate {word} {bound}) {status}")
        if not ok:
            failures.append(key)

    summary = {"steps": steps, "gates": gates, "failures": failures,
               **{k: float(results[k]) for k in gates}}
    out = os.path.join(run_dir, "demo_gate.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[demo-gate] summary -> {out}")

    if failures:
        print(f"[demo-gate] QUALITY REGRESSION: {failures}")
        return 1
    print("[demo-gate] all quality gates passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
