"""Test harness config: run all tests on a virtual 8-device CPU backend.

This is JAX's standard fake-backend trick for exercising pjit/Mesh/sharding
code paths without TPU pods (SURVEY.md §4e).

Note: this image's `sitecustomize` imports jax at interpreter startup with
`JAX_PLATFORMS=axon` (remote TPU tunnel), so setting env vars here is too
late for jax's config — we must override through `jax.config` before any
backend is initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: repeat suite runs skip most XLA-CPU compiles.
# Lives under ~/.cache (namespaced per host CPU feature set), NOT /tmp —
# /tmp is wiped between sessions and a cold suite on a 1-core host is slow.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ccdm_tpu.utils.compile_cache import (  # noqa: E402
    default_cache_dir, enable_compilation_cache)

# Explicit params here win over any CCDM_COMPILE_CACHE* env vars a user set
# for CLI runs (test artifacts must never land in — or disable — the CLI
# cache); XDG-aware base, same as the CLI default.
enable_compilation_cache({"compilation_cache": True,
                          "compilation_cache_dir": default_cache_dir("xla_tests")})

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def cityscapes_tree_factory():
    """Builder for a minimal Cityscapes leftImg8bit/gtFine folder tree.

    One shared implementation for the three harnesses that need a fake
    dataset (trainer smoke, eval harness, trainable-encoder run) — they
    differ only in splits/size/classes/instanceIds, passed as arguments.
    """
    from PIL import Image

    def build(root, splits, size=(64, 128), classes=(7, 8, 11, 26, 0),
              instance_ids=False, seed=0):
        rng = np.random.default_rng(seed)
        h, w = size
        for split, n in splits.items():
            img_dir = root / "leftImg8bit" / split / "cityA"
            gt_dir = root / "gtFine" / split / "cityA"
            img_dir.mkdir(parents=True, exist_ok=True)
            gt_dir.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
                ids = rng.choice(list(classes), size=(h, w)).astype(np.uint8)
                Image.fromarray(img).save(img_dir / f"img{i}_leftImg8bit.png")
                Image.fromarray(ids).save(gt_dir / f"img{i}_gtFine_labelIds.png")
                if instance_ids:
                    inst = ids.astype(np.int32)
                    inst[ids == 26] = 26001  # one car instance per image
                    Image.fromarray(inst.astype(np.uint16)).save(
                        gt_dir / f"img{i}_gtFine_instanceIds.png")
        return str(root)

    return build
