"""Sampling-speed benchmark: quality-vs-steps sweep + wall-clock throughput.

Parity: `evaluation/evaluate_lidc_sampling_speed.py` — the same uncertainty
evaluation run at denoising step counts {250, 200, 150, 100, 50, 25, 10}
(`:195-199`). The reference encodes K as `t = 10000 + K` decoded inside
`forward_denoising` (`diffusion_denoising.py:178-187`); here K is simply a
static sampler argument, each K compiling its own `lax.scan` once.

Unlike the reference (which measures wall-clock externally via logs), each
sweep point also reports measured samples/sec on-device — the BASELINE.json
north-star metric.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

LOGGER = logging.getLogger(__name__)

DEFAULT_STEP_SWEEP = [250, 200, 150, 100, 50, 25, 10]  # evaluate_lidc_sampling_speed.py:195


def eval_lidc_sampling_speed(params: Dict[str, Any],
                             step_sweep: Optional[List[int]] = None) -> Dict[int, Dict[str, Any]]:
    step_sweep = step_sweep or params.get("step_sweep") or DEFAULT_STEP_SWEEP
    results: Dict[int, Dict[str, Any]] = {}
    for steps in step_sweep:
        LOGGER.info("=== sampling with %d denoising steps ===", steps)
        results[steps] = eval_lidc_uncertainty(dict(params), num_steps=int(steps))
        LOGGER.info("steps=%d: samples/sec=%.2f", steps, results[steps]["samples_per_sec"])
    return results
