"""Numerical parity: the Flax UNet must reproduce the reference torch UNet.

Instantiates the reference implementation (imported from /root/reference,
never copied), converts its randomly-initialised weights with
`torch_unet_to_flax`, and checks both networks produce the same outputs on
the same inputs. This pins down conv padding, norm epsilon, attention
scaling/packing, timestep embedding, and the softmax head all at once —
and certifies that published reference checkpoints convert correctly.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def reference_unet():
    sys.path.insert(0, REFERENCE)
    if "ddpm" not in sys.modules:
        pkg = types.ModuleType("ddpm")
        pkg.__path__ = [os.path.join(REFERENCE, "ddpm")]
        sys.modules["ddpm"] = pkg
    import torch
    from ddpm.models.unet_openai import create_unet_openai

    torch.manual_seed(0)
    unet = create_unet_openai(
        image_size=64,
        base_channels=32,
        in_channels=3,  # 2 classes + 1 image channel
        out_channels=2,
        num_res_blocks=2,
        cond_encoded_shape=None,
        attention_resolutions=[4, 2],
        num_head_channels=16,
        softmax_output=True,
    )
    # Un-zero every zero-initialised parameter (output head, ResBlock
    # out_convs, attention projections): with them at zero the network
    # emits uniform softmax regardless of the torso, making parity vacuous
    # — this caught a square-Linear transpose bug in the converter.
    with torch.no_grad():
        gen = torch.Generator().manual_seed(1)
        for p in unet.parameters():
            if float(p.abs().sum()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    unet.eval()
    return unet


def test_unet_matches_reference(reference_unet):
    import jax
    import jax.numpy as jnp
    import torch

    from ccdm_tpu.models.torch_convert import torch_unet_to_flax
    from ccdm_tpu.models.unet import create_unet

    flax_unet = create_unet(
        image_size=64, base_channels=32, out_channels=2, num_res_blocks=2,
        channel_mult=(1, 2, 3, 4), attention_resolutions=(4, 2),
        num_head_channels=16, dtype=jnp.float32,
    )
    b, h, w = 2, 64, 64
    rng = np.random.default_rng(0)
    xt = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))]
    cond = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    t = np.array([7.0, 201.0], dtype=np.float32)

    template = flax_unet.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(xt), jnp.asarray(cond), jnp.asarray(t))["params"]
    state_dict = {k: v.numpy() for k, v in reference_unet.state_dict().items()}
    params = torch_unet_to_flax(state_dict, template)

    ours = np.asarray(flax_unet.apply(
        {"params": params}, jnp.asarray(xt), jnp.asarray(cond), jnp.asarray(t)
    )["diffusion_out"])

    with torch.no_grad():
        ref = reference_unet(
            torch.from_numpy(np.moveaxis(xt, -1, 1)),
            torch.from_numpy(np.moveaxis(cond, -1, 1)),
            None,
            torch.from_numpy(t),
        )["diffusion_out"].numpy()
    ref = np.moveaxis(ref, 1, -1)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_export_to_torch_roundtrip_and_parity(reference_unet):
    """`flax_unet_to_torch`: a randomly-initialised FLAX tree loads into the
    reference torch UNet (strict load: full key and shape coverage), the two
    networks agree numerically, and torch->flax->torch round-trips exactly."""
    import jax
    import jax.numpy as jnp
    import torch

    from ccdm_tpu.models.torch_convert import flax_unet_to_torch, torch_unet_to_flax
    from ccdm_tpu.models.unet import create_unet

    flax_unet = create_unet(
        image_size=64, base_channels=32, out_channels=2, num_res_blocks=2,
        channel_mult=(1, 2, 3, 4), attention_resolutions=(4, 2),
        num_head_channels=16, dtype=jnp.float32,
    )
    b, h, w = 2, 64, 64
    rng = np.random.default_rng(5)
    xt = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))]
    cond = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    t = np.array([3.0, 118.0], dtype=np.float32)

    params = flax_unet.init(
        {"params": jax.random.PRNGKey(9)},
        jnp.asarray(xt), jnp.asarray(cond), jnp.asarray(t))["params"]
    # un-zero the zero-init heads so the comparison is non-vacuous
    params = jax.tree.map(
        lambda p: p if float(jnp.abs(p).sum()) > 0
        else jax.random.normal(jax.random.PRNGKey(p.size), p.shape) * 0.05,
        params)

    exported = flax_unet_to_torch(params)
    # strict load proves exact key/shape coverage of the reference schema
    reference_unet.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=True)
    reference_unet.eval()

    ours = np.asarray(flax_unet.apply(
        {"params": params}, jnp.asarray(xt), jnp.asarray(cond), jnp.asarray(t)
    )["diffusion_out"])
    with torch.no_grad():
        ref = reference_unet(
            torch.from_numpy(np.moveaxis(xt, -1, 1)),
            torch.from_numpy(np.moveaxis(cond, -1, 1)),
            None,
            torch.from_numpy(t),
        )["diffusion_out"].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(ref, 1, -1), atol=2e-5)

    # exact round-trip through the importer
    back = torch_unet_to_flax(exported, params)
    for (pa, a), (_, c) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a, np.float32), c, err_msg=str(pa))
