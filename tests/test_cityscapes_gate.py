"""Cityscapes quality-gate harness (scripts/cityscapes_gate.py): the
learnable synthetic tree is well-formed, and the tiny end-to-end gate run
(train -> CityscapesEvaluator -> official scoring) executes on CPU.

The real gate (mIoU >= the pinned CS_GATE_MIOU threshold at the default
CS_STEPS=6000) runs on TPU via `make demo-cityscapes`; this keeps its
machinery covered in CI. Earlier failure mode covered here: this test ran
the whole suite's slowest subprocess — it gets a 900s timeout because a
loaded 1-core host can push the tiny run past 10 minutes.
"""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_learnable_tree_is_wellformed(tmp_path):
    from cityscapes_gate import LEARNABLE_IDS, make_learnable_tree

    from ccdm_tpu.data.cityscapes_labels import LABELS, encode_target

    root = make_learnable_tree(str(tmp_path), n_train=2, n_val=1,
                               size=(32, 64), seed=3)
    lbl_p = os.path.join(root, "gtFine", "train", "synth",
                         "synth000_gtFine_labelIds.png")
    img_p = os.path.join(root, "leftImg8bit", "train", "synth",
                         "synth000_leftImg8bit.png")
    ids = np.asarray(Image.open(lbl_p))
    img = np.asarray(Image.open(img_p)).astype(np.float32)
    # only evaluated label ids appear, and all map to non-ignore train ids
    assert set(np.unique(ids)) <= set(LEARNABLE_IDS)
    assert (encode_target(ids) < 19).all()
    # the task is learnable from color: mean pixel color of each class's
    # region is close to the official class color (noise sigma is 12)
    color_of = {lbl.id: np.asarray(lbl.color, np.float32) for lbl in LABELS}
    for v in np.unique(ids):
        mean = img[ids == v].mean(axis=0)
        assert np.abs(mean - color_of[int(v)]).max() < 20.0


def test_gate_script_end_to_end_tiny(tmp_path):
    env = dict(
        os.environ,
        # CS_CPU (a jax.config update inside the script) is what actually
        # forces CPU — the env var alone is overridden by sitecustomize's
        # early jax import; kept too for non-sitecustomize environments
        JAX_PLATFORMS="cpu",
        CS_CPU="1",
        CS_TINY="1",
        CS_STEPS="2",
        CS_GATE_MIOU="0.0",
        CS_GATE_ROOT=str(tmp_path / "gate"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "cityscapes_gate.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "cityscapes quality gate passed" in proc.stdout
    assert os.path.exists(tmp_path / "gate" / "cityscapes_gate.json")
