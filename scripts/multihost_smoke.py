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


def _make_fake_cityscapes(root: str, n: int = 4) -> None:
    """Minimal leftImg8bit/gtFine val tree (4 images, 64x128), deterministic."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "val", "cityA")
    gt_dir = os.path.join(root, "gtFine", "val", "cityA")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        img = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
        ids = rng.choice([7, 8, 11, 26, 0], size=(64, 128)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"img{i}_leftImg8bit.png"))
        Image.fromarray(ids).save(os.path.join(gt_dir, f"img{i}_gtFine_labelIds.png"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12377")
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel axis size; with --devices-per-process"
                         " 1 the TP collectives cross the host boundary")
    ap.add_argument("--light", action="store_true",
                    help="train+validate+save only (TP smoke), skip the eval "
                         "harness sections")
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

    if args.light:
        # TP-across-hosts smoke: shard the model axis over devices owned by
        # DIFFERENT processes (devices-per-process 1, mesh-model 2), so the
        # TP all-gathers/reduce-scatters XLA emits ride the cross-host
        # transport; includes one validation (score broadcast + best-save
        # barrier over TP-sharded state) and a multihost Orbax save.
        params = dict(params, mesh={"model": args.mesh_model}, batch_size=4,
                      steps_per_launch=1, save_freq=2, validation_freq=2,
                      max_epochs=2,
                      # wide enough that the TP rule (_TP_MIN_WIDTH=64)
                      # actually shards the time-embed Dense (4*16=64 wide)
                      unet_openai=dict(params["unet_openai"], base_channels=16))
        state = run_train(params, max_steps=2)
        assert int(state.step) == 2, int(state.step)
        assert all(bool(jax.numpy.isfinite(x).all())
                   for x in jax.tree.leaves(state.params))
        # with 1 device per process, any non-replicated layout necessarily
        # places model-axis shards on devices of DIFFERENT processes
        tp_sharded = [
            x for x in jax.tree.leaves(state.params)
            if not x.sharding.is_fully_replicated
        ]
        assert tp_sharded, "no parameter was TP-sharded over the model axis"
        if jax.process_index() == 0:
            print(f"TP_SHARDED_PARAMS {len(tp_sharded)}", flush=True)
            print("MULTIHOST_OK", flush=True)
        return

    state = run_train(params, max_steps=4)
    assert int(state.step) == 4, int(state.step)
    loss_tree = jax.tree.leaves(state.params)
    assert all(bool(jax.numpy.isfinite(x).all()) for x in loss_tree)

    # multihost resume: all processes restore the same step-4 checkpoint
    params2 = dict(params, load_from=args.output,
                   output_path=args.output + "_resumed")
    state2 = run_train(params2, max_steps=2)
    assert int(state2.step) == 6, int(state2.step)

    # host-sharded evaluation: each process scores a strided slice of the
    # test set; one allgather combines. Every (image, sample) draw is keyed
    # by its global dataset position, so the combined results are identical
    # to a single-process run even at batch_size > 1 (host 0 scores images
    # [0, 2] in ONE batch here — a composition no single-process batch has).
    syn.test_dataset = lambda max_size=None: syn.synthetic_test_dataset(
        n=4, resolution=32)
    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    eval_params = dict(params, load_from=args.output + "_resumed",
                       batch_size=2, evaluations=[2], output_path=None)
    results = eval_lidc_uncertainty(eval_params)

    # host-sharded Cityscapes inference: strided dataset slices, PNGs named
    # by global index into a shared output dir, ONE allgather for the CM,
    # official re-scoring on process 0 (cityscapes_eval.py). Random-init
    # weights (seed-deterministic) keep both topologies comparable without a
    # 20-class training run.
    from jax.experimental import multihost_utils

    cs_root = args.output + "_cs_data"
    if jax.process_index() == 0:
        _make_fake_cityscapes(cs_root)
    multihost_utils.sync_global_devices("cs_data_ready")
    os.environ["CCDM_CITYSCAPES_PATH"] = cs_root
    from ccdm_tpu.eval.cityscapes_eval import run_inference

    cs_results = run_inference({
        "output_path": args.output + "_cs_out",
        "dataset_file": "ccdm_tpu.data.cityscapes",
        "batch_size": 2,
        "time_steps": 2,
        "beta_schedule": "cosine",
        "compute_dtype": "float32",
        "evaluation": {"resolution": "dataloader", "evaluations": 2,
                       "evaluation_vote_strategy": "confidence"},
        "dataset_pipeline_val": ["resize", "torchvision_normalise"],
        "dataset_pipeline_val_settings": {"target_size": [32, 64]},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
        "seed": 0,
    })

    if jax.process_index() == 0:
        import json

        print("EVAL_RESULTS " + json.dumps(results), flush=True)
        print("CS_EVAL_RESULTS " + json.dumps(
            {"mIoU": cs_results["mIoU"], "images": cs_results["images"],
             "official_mIoU": cs_results["official"]["averageScoreClasses"]}),
            flush=True)
        print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
