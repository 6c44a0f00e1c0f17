#!/usr/bin/env python
"""Multi-host training smoke worker: one process of an N-process
`jax.distributed` run on the virtual CPU backend.

Exercises the full multi-process stack together (reference capability:
single-node DDP via `ignite.distributed`, `ddpm_train.py:31-38`,
`DistributedSampler` `trainer.py:652-656`):

- `jax.distributed.initialize` (the `idist.Parallel` analogue)
- `EpochLoader` process sharding: each host loads `batch/process_count`
  samples, staged as ONE global array via
  `make_array_from_process_local_data`
- the sharded jitted train step over the global mesh (XLA emits the
  cross-host gradient all-reduce)
- in-training GED validation on a host-local EMA copy, the process-0 score
  broadcast, and the multihost best-checkpoint save barrier
- multihost Orbax save (all processes participate) + resume

Launched pairwise by tests/test_multihost.py; standalone:

    for i in 0 1; do
      python scripts/multihost_smoke.py --process-id $i --num-processes 2 \
          --coordinator localhost:12377 --output /tmp/mh_smoke &
    done; wait
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12377")
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, jax.devices()

    import ccdm_tpu.data.synthetic as syn

    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=16, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)

    params = {
        "dataset_file": "ccdm_tpu.data.synthetic",
        "output_path": args.output,
        "batch_size": 8,           # global batch; 4 per process
        "max_epochs": 4,
        "time_steps": 4,
        "beta_schedule": "cosine",
        "polyak_alpha": 0.9,
        "compute_dtype": "float32",
        "optim": {"name": "Adam", "learning_rate": 1e-3, "lr_function": "polynomial",
                  "lr_params": {"power": 1.0, "min_lr": 1e-5}, "epochs": 4},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
        "display_freq": 2,
        "save_freq": 2,
        # K=2 launches exercise the stacked [K, B, ...] global staging path
        "steps_per_launch": 2,
        # validation runs process-locally on a host-local EMA copy, then the
        # broadcast score drives the multihost best-checkpoint barrier
        "validation_freq": 4,
        "samples": 2,
        "dataset_val_max_size": 4,
        "validation_max_batches": 1,
        "n_validation_images": 2,
        "n_validation_predictions": 2,
        "seed": 0,
    }

    from ccdm_tpu.train.trainer import run_train

    state = run_train(params, max_steps=4)
    assert int(state.step) == 4, int(state.step)
    loss_tree = jax.tree.leaves(state.params)
    assert all(bool(jax.numpy.isfinite(x).all()) for x in loss_tree)

    # multihost resume: all processes restore the same step-4 checkpoint
    params2 = dict(params, load_from=args.output,
                   output_path=args.output + "_resumed")
    state2 = run_train(params2, max_steps=2)
    assert int(state2.step) == 6, int(state2.step)

    if jax.process_index() == 0:
        print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
