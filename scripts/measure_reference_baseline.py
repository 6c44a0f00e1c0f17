#!/usr/bin/env python
"""Measure the PyTorch reference's sampling throughput on this host.

Runs the *reference implementation itself* (imported from /root/reference,
never copied) with its published LIDC eval protocol — batch of
1 image x 16 samples through `DenoisingModel.forward_denoising` — for a few
denoising steps, and extrapolates the steady-state per-step cost to the full
250-step run (the loop cost is linear in steps; `diffusion_denoising.py:189`).

Writes BASELINE_MEASURED.json consumed by bench.py's `vs_baseline`.

Note: this container has CPU-only torch; the paper's GPU numbers are not
reproducible here. The JSON records host + backend so the comparison is
explicit.
"""

import json
import os
import platform
import sys
import time

sys.path.insert(0, "/root/reference")

# The reference's `ddpm/__init__.py` pulls in its trainer (and thus ignite,
# absent here). Register a stub package so `ddpm.models.*` imports resolve
# without executing that __init__.
import types  # noqa: E402

_pkg = types.ModuleType("ddpm")
_pkg.__path__ = ["/root/reference/ddpm"]
sys.modules["ddpm"] = _pkg

import torch  # noqa: E402

torch.set_num_threads(os.cpu_count() or 1)


def main():
    from ddpm.models import build_model  # reference code, executed in place

    params = {
        "backbone": "unet_openai",
        "unet_openai": {
            "base_channels": 32,
            "channel_mult": None,
            "attention_resolutions": [32, 16, 8],
            "num_heads": 1,
            "num_head_channels": 32,
            "softmax_output": True,
        },
    }
    num_samples = int(os.environ.get("BASE_SAMPLES", 16))
    measure_steps = int(os.environ.get("BASE_STEPS", 3))
    full_steps = 250
    h = w = 128

    model = build_model(
        time_steps=full_steps,
        schedule="cosine",
        schedule_params={"s": 0.008},
        backbone=params["backbone"],
        backbone_params=params["unet_openai"],
        input_shapes=[(1, h, w), (2, h, w)],
        cond_encoded_shape=(1, h, w),
        dataset_file="datasets.lidc",
        step_T_sample="confidence",
        feature_cond_encoder=None,
    )
    model.eval()

    x = torch.randn(num_samples, 1, h, w)
    from ddpm.models.one_hot_categorical import OneHotCategoricalBCHW

    xt = OneHotCategoricalBCHW(logits=torch.zeros(num_samples, 2, h, w)).sample()

    with torch.no_grad():
        # warm-up one step (weight packing, allocator)
        model(xt, x, None, torch.as_tensor(10000 + 1))
        t0 = time.perf_counter()
        model(xt, x, None, torch.as_tensor(10000 + measure_steps))
        dt = time.perf_counter() - t0

    per_step = dt / measure_steps
    full_time = per_step * full_steps
    samples_per_sec = num_samples / full_time

    out = {
        "reference_samples_per_sec": samples_per_sec,
        "protocol": {
            "samples": num_samples, "resolution": h, "full_steps": full_steps,
            "measured_steps": measure_steps, "per_step_seconds": per_step,
            "extrapolated": True,
        },
        "backend": "torch-cpu",
        "torch_version": torch.__version__,
        "host_cpus": os.cpu_count(),
        "host": platform.node(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BASELINE_MEASURED.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
