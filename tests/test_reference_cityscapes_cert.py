"""End-to-end Cityscapes-family certification against the reference's OWN
evaluator (the analogue of test_reference_certification.py for the mIoU
path; round-3 verdict item #1).

A checkpoint trained HERE on the learnable synthetic Cityscapes tree
(scripts/cityscapes_gate.py's Voronoi task), exported to the reference's
`.pt` schema through the shipped CLI, is loaded and scored by
`/root/reference/evaluation/eval_cdm.py` ITSELF (`run_inference`, lines
373-432 — torch CPU): the real `Evaluator` sampling loop, confidence vote,
soft confusion matrix, PNG dumps, and the vendored official scorer
(`cs_eval.py:579`). Its official class mIoU must agree with OUR
`ccdm_tpu/eval/cityscapes_eval.py::run_inference` on the same images and
the same weights within ancestral-sampling tolerance — plus one
DETERMINISTIC check: our `cs_scoring.score_img_lists` re-scores the PNGs
the reference dumped and must reproduce the reference's own
`evaluateImgLists` numbers exactly (same inputs, two independent scorers).

The reference code is imported from /root/reference and executed — never
copied. Two shims are required by bugs in the reference's OWN main branch
for this path (cts-branch residue, noted in SURVEY.md component #25):
`Evaluator.predict_condition` is called at `eval_cdm.py:206` but never
defined (the condition is the image itself on the cdm-only path — identity
shim), and `_build_feature_cond_encoder`'s (encoder, vis_fn) tuple is not
unpacked at `eval_cdm.py:406` (shimmed to return a no-feature module).
Everything the certification measures executes unmodified.
"""

import json
import logging
import os
import re
import subprocess
import sys
import types
from unittest import mock

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE), reason="reference repo not mounted"),
    pytest.mark.certification,  # slow tier: `make test-full` (VERDICT r4 #6)
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZE = (32, 64)  # H, W
N_VAL = 8
EVALUATIONS = 4
TRAIN_STEPS = 600
# our side is averaged over independent eval seeds (the LIDC loop's trick,
# test_reference_certification.py) so the band absorbs only the REFERENCE
# run's single-seed sampling noise plus the residual mean noise
OUR_EVAL_SEEDS = (3, 4, 5)
# Bands pinned from scripts/calibrate_cs_certification.py at this exact
# protocol (round 5): over 3 reference torch seeds, max |mean(ours) -
# theirs| was 0.0062 official mIoU and 0.0128 cm19 mIoU; bands are ~3x
# that measured noise, so a vote-strategy or upsample regression of ~0.05
# mIoU FAILS (the old 0.10 band hid it).
MIOU_BAND = 0.02
CM19_BAND = 0.035

UNET = {
    # base 32: the reference's GroupNorm32 requires channels % 32 == 0
    "base_channels": 32, "channel_mult": [1, 2],
    "attention_resolutions": [4], "num_head_channels": 16,
    "softmax_output": True,
}
PIPELINE = {
    "dataset_pipeline_train": ["flip", "resize", "torchvision_normalise"],
    "dataset_pipeline_train_settings": {"target_size": list(SIZE)},
    "dataset_pipeline_val": ["resize", "torchvision_normalise"],
    "dataset_pipeline_val_settings": {"target_size": list(SIZE)},
}
COMMON = {
    "dataset_file": "ccdm_tpu.data.cityscapes",
    "time_steps": 10,
    "beta_schedule": "cosine",
    "beta_schedule_params": {"s": 0.008},
    "polyak_alpha": 0.95,
    "compute_dtype": "float32",
    "unet_openai": UNET,
}


@pytest.fixture(scope="module")
def cs_tree(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from cityscapes_gate import make_learnable_tree

    root = str(tmp_path_factory.mktemp("cs_cert_tree"))
    make_learnable_tree(root, n_train=24, n_val=N_VAL, size=SIZE, seed=0)
    old = os.environ.get("CCDM_CITYSCAPES_PATH")
    os.environ["CCDM_CITYSCAPES_PATH"] = root
    yield root
    if old is None:
        os.environ.pop("CCDM_CITYSCAPES_PATH", None)
    else:
        os.environ["CCDM_CITYSCAPES_PATH"] = old
    sys.path.remove(os.path.join(REPO, "scripts"))


def train_cs_checkpoint(out: str):
    """Train the certification checkpoint on the Voronoi tree."""
    from ccdm_tpu.train.trainer import run_train

    train_params = dict(
        COMMON, output_path=out, **PIPELINE,
        dataset_val_max_size=2, batch_size=8, max_epochs=10 ** 6,
        optim={"name": "Adam", "learning_rate": 2e-3,
               "lr_function": "polynomial",
               "lr_params": {"power": 1.0, "min_lr": 1e-6},
               "epochs": max(1, TRAIN_STEPS // 3)},
        display_freq=200, save_freq=10_000, validation_freq=10_000,
        validation_max_batches=1, n_validation_images=1,
        n_validation_predictions=1, seed=0)
    state = run_train(train_params, max_steps=TRAIN_STEPS)
    assert int(state.step) >= TRAIN_STEPS


def our_eval(run_dir: str, out_dir: str, seed: int) -> dict:
    """Score the checkpoint with OUR evaluator at one sampling seed."""
    from ccdm_tpu.eval.cityscapes_eval import run_inference

    eval_params = dict(
        COMMON, output_path=out_dir,
        **{k: v for k, v in PIPELINE.items() if "val" in k},
        dataset_val_max_size=N_VAL, batch_size=2,
        evaluation={"resolution": "dataloader", "evaluations": EVALUATIONS,
                    "evaluation_vote_strategy": "confidence"},
        load_from=run_dir, seed=seed)
    return run_inference(eval_params)


def mean_our_evals(results: list) -> dict:
    """Seed-mean of the quantities the certification compares."""
    official = float(np.mean(
        [r["official"]["averageScoreClasses"] for r in results]))
    # per-class IoU vectors, absent classes (NaN) as 0, elementwise mean
    cm19 = float(np.mean([
        np.nan_to_num(np.asarray(r["IoU"], dtype=np.float64), nan=0.0).mean()
        for r in results]))
    return {"official_miou": official, "cm19_miou": cm19}


@pytest.fixture(scope="module")
def trained_cs_run(cs_tree, tmp_path_factory):
    """Train on the Voronoi tree here; return (run_dir, seed-mean our-evals)."""
    out = str(tmp_path_factory.mktemp("cs_cert_run"))
    train_cs_checkpoint(out)
    ours = mean_our_evals([
        our_eval(out, str(tmp_path_factory.mktemp(f"cs_cert_eval_s{s}")), s)
        for s in OUR_EVAL_SEEDS])
    return out, ours


def install_reference_path():
    import reference_stubs

    reference_stubs.install()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "ddpm" not in sys.modules:
        pkg = types.ModuleType("ddpm")
        pkg.__path__ = [os.path.join(REFERENCE, "ddpm")]
        sys.modules["ddpm"] = pkg
    if "datasets" in sys.modules and not getattr(
            sys.modules["datasets"], "__file__", "").startswith(REFERENCE):
        del sys.modules["datasets"]


@pytest.fixture(scope="module")
def reference_on_path():
    install_reference_path()
    yield
    sys.path.remove(REFERENCE)


def _torch_dataset_module():
    """The SAME validation images/labels our evaluator scored, through the
    reference's eval protocol: `(image BCHW, one-hot label BCHW, label_orig
    BHW)` (`eval_cdm.py:200`). Wraps OUR pipeline output so both sides
    consume bit-identical inputs."""
    import torch

    from ccdm_tpu.data import cityscapes as cs_data

    ds = cs_data.validation_dataset(max_size=N_VAL, params=PIPELINE)

    class RefValDataset(torch.utils.data.Dataset):
        return_metadata = False  # run_inference sets this True (`:386-388`)

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            item = ds.get(i)
            image = torch.from_numpy(item["image"]).permute(2, 0, 1).float()
            onehot = torch.from_numpy(item["x0"]).permute(2, 0, 1).float()
            label_orig = torch.from_numpy(item["label"].astype(np.int64))
            return image, onehot, label_orig

    mod = types.ModuleType("synthetic_cityscapes_ref")
    mod.training_dataset = lambda: RefValDataset()
    mod.validation_dataset = lambda max_size=None: RefValDataset()
    mod.get_num_classes = cs_data.get_num_classes
    mod.get_ignore_class = cs_data.get_ignore_class
    mod.get_weights = lambda _=None: torch.ones(cs_data.get_num_classes())
    return mod


class _LogCapture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.INFO)
        self.records = []

    def emit(self, record):
        self.records.append(record)


def _run_reference_eval(pt_path, workdir, torch_seed=0):
    """Execute the reference's own `run_inference` (`eval_cdm.py:373-432`).

    Plain function (no pytest objects) so scripts/calibrate_cs_certification.py
    can drive the same loop at several torch seeds.
    """
    import importlib

    import torch

    sys.modules["synthetic_cityscapes_ref"] = _torch_dataset_module()
    # Evaluator resolves `<dataset_file>_config` for the PNG id/color maps
    # (`eval_cdm.py:101`): alias the reference's own cityscapes_config
    sys.modules["synthetic_cityscapes_ref_config"] = importlib.import_module(
        "datasets.cityscapes_config")
    import reference_stubs

    reference_stubs.install_cityscapesscripts()
    from evaluation import eval_cdm

    # --- shims for the reference's OWN main-branch bugs on this path ---
    # `predict_condition` is called (`:206`) but never defined; on the
    # cdm-only path the condition IS the input image
    class _NoEncoder(torch.nn.Module):
        # `_build_feature_cond_encoder(params)` returns (encoder, vis_fn)
        # but `:406` does not unpack — hand the Evaluator a real
        # no-feature module
        def forward(self, x):
            return None

    # `_build_datasets` returns train_ids_to_class_names=None for any
    # dataset_file other than the literal 'datasets.cityscapes'/'datasets.
    # ade20k' (`:43-53`), but `:423` indexes it unconditionally in a log
    # f-string — fill the names, keep their dataset plumbing untouched
    orig_build_datasets = eval_cdm._build_datasets

    def _build_datasets_with_names(params):
        loader, w, ign, nc, t2n = orig_build_datasets(params)
        if t2n is None:
            t2n = {i: str(i) for i in range(nc - 1)}
        return loader, w, ign, nc, t2n

    # `archive_code` (`:380`) copies ./params.yml and tars `git ls-files`
    workdir = str(workdir)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "params.yml"), "w") as f:
        f.write("# cert dummy\n")

    ref_params = {
        "output_path": os.path.join(workdir, "ref_out"),
        "dataset_file": "synthetic_cityscapes_ref",
        "dataset_val_max_size": N_VAL,
        "batch_size": 2,
        "mp_loaders": 0,
        "class_weights": "uniform",
        "cdm_only": True,
        "wandb": False,
        "evaluation": {"resolution": "dataloader", "evaluations": EVALUATIONS,
                       "evaluation_vote_strategy": "confidence"},
        "evaluation_vote_strategy": "confidence",  # -> step_T_sample (`trainer.py:599`)
        "time_steps": COMMON["time_steps"],
        "beta_schedule": "cosine",
        "beta_schedule_params": COMMON["beta_schedule_params"],
        "polyak_alpha": COMMON["polyak_alpha"],
        "backbone": "unet_openai",
        "unet_openai": dict(UNET),
        "feature_cond_encoder": {"type": "none"},
        "distributed": False,
        "multigpu": False,
        "load_from": pt_path,
    }
    handler = _LogCapture()
    root_logger = logging.getLogger()
    old_level = root_logger.level
    cwd = os.getcwd()
    try:
        root_logger.addHandler(handler)
        root_logger.setLevel(logging.INFO)
        os.chdir(workdir)
        with mock.patch.object(eval_cdm.Evaluator, "predict_condition",
                               lambda self, x: x, create=True), \
             mock.patch.object(eval_cdm, "_build_feature_cond_encoder",
                               lambda params: _NoEncoder()), \
             mock.patch.object(eval_cdm, "_build_datasets",
                               _build_datasets_with_names):
            torch.manual_seed(torch_seed)
            eval_cdm.run_inference(ref_params)
    finally:
        os.chdir(cwd)
        root_logger.removeHandler(handler)
        root_logger.setLevel(old_level)

    ckpt_dir = os.path.dirname(pt_path)
    with open(os.path.join(ckpt_dir, "cs_script_results.json")) as f:
        official = json.load(f)
    text = "\n".join(r.getMessage() for r in handler.records)
    m = re.search(r"my miou is (?:tensor\()?([\d.eE+-]+)", text)
    cm_miou = float(m.group(1))
    outputs = os.path.join(ckpt_dir, "outputs", "val")
    pred_pngs = sorted(
        os.path.join(outputs, "submit", f) for f in os.listdir(
            os.path.join(outputs, "submit")))
    label_pngs = sorted(
        os.path.join(outputs, "label", f) for f in os.listdir(
            os.path.join(outputs, "label")))
    return official, cm_miou, pred_pngs, label_pngs


def export_checkpoint(run_dir: str, pt_path: str) -> None:
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_torch_checkpoint.py"),
         run_dir, pt_path],
        capture_output=True, text=True, env=dict(
            os.environ, JAX_PLATFORMS="cpu", CCDM_COMPILE_CACHE="0"))
    assert res.returncode == 0, res.stderr
    assert os.path.exists(pt_path)


def test_reference_evaluator_scores_our_cityscapes_checkpoint(
        trained_cs_run, reference_on_path, tmp_path):
    run_dir, ours = trained_cs_run

    pt_path = str(tmp_path / "exported.pt")
    export_checkpoint(run_dir, pt_path)

    theirs, theirs_cm_miou, pred_pngs, label_pngs = _run_reference_eval(
        pt_path, tmp_path, torch_seed=0)

    # --- deterministic half: the SCORERS must agree exactly. Our official
    # scorer re-scores the PNGs the reference's Evaluator dumped; same
    # inputs, independent implementations (cs_scoring.py vs cs_eval.py:579)
    from ccdm_tpu.eval.cs_scoring import score_img_lists

    cross = score_img_lists(pred_pngs, label_pngs)
    assert abs(cross["averageScoreClasses"]
               - theirs["averageScoreClasses"]) < 1e-9, (
        cross["averageScoreClasses"], theirs["averageScoreClasses"])
    # their dict covers all 34 labels (nan outside the 19 eval classes);
    # ours covers the eval classes — every shared class must match exactly
    shared = 0
    for cls, score in theirs["classScores"].items():
        if cls not in cross["classScores"]:
            assert np.isnan(score), (cls, score)
            continue
        got = cross["classScores"][cls]
        assert (np.isnan(score) and np.isnan(got)) or abs(got - score) < 1e-9, (
            cls, got, score)
        if not np.isnan(score):
            shared += 1
    assert shared >= 6, f"only {shared} classes scored — tree degenerated"

    # --- sampling half: same trained weights, same test images, independent
    # ancestral chains (different PRNGs) + independent EVALUATIONS-vote
    # averages; our side is the OUR_EVAL_SEEDS mean. Bands calibrated by
    # scripts/calibrate_cs_certification.py at this exact protocol (see the
    # MIOU_BAND comment above). A broken export is far outside: random
    # weights score ~0.05 official mIoU on this tree.
    ours_official = ours["official_miou"]
    assert abs(ours_official - theirs["averageScoreClasses"]) < MIOU_BAND, (
        ours_official, theirs["averageScoreClasses"])
    assert ours_official > 0.5 and theirs["averageScoreClasses"] > 0.5, (
        ours_official, theirs["averageScoreClasses"])

    # their train-id confusion-matrix mIoU (`get_miou_and_ious`): soft CM of
    # confidence-averaged probabilities, NaN-IoU classes zeroed and averaged
    # over ALL 19 eval classes (`eval_cdm.py:321-322`) — on this 8-class tree
    # that mean includes eleven structural zeros. Compare on their
    # semantics: our per-class IoU vector, absent classes as 0, mean over 19.
    assert abs(ours["cm19_miou"] - theirs_cm_miou) < CM19_BAND, (
        ours["cm19_miou"], theirs_cm_miou)
