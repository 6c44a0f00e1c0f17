"""PyTorch reference checkpoint -> Flax UNet parameter conversion.

The reference saves UNet state dicts under `model` / `average_model` keys
(`ddpm/trainer.py:357-365`). This module maps those torch parameter names
onto this package's Flax tree so published checkpoints (LIDC Google-Drive,
`cdm_dino_256x512`) evaluate directly on TPU.

Name correspondence (reference `unet.py:515-726` module indices are
reproduced 1:1 by `UNetModel`'s `block_idx`/`out_idx` naming):

| torch                                   | flax                         |
|-----------------------------------------|------------------------------|
| `time_embed.0/.2`                       | `time_mlp1` / `time_mlp2`    |
| `input_blocks.0.0`                      | `in_conv`                    |
| `input_blocks.i.0` (ResBlock)           | `down_i_res`                 |
| `input_blocks.i.1` (AttentionBlock)     | `down_i_attn`                |
| `input_blocks.i.0` (Downsample)         | `down_i_downsample`          |
| `middle_block.0/.1/.2`                  | `mid_res1/mid_attn/mid_res2` |
| `output_blocks.j.0/.1/.last`            | `up_j_res/_attn/_upsample`   |
| `out.0/.2`                              | `out_norm` / `out_conv`      |
| `out_ce.0/.2`                           | `out_ce_norm` / `out_ce_conv`|

Weight layout: Conv2d OIHW -> HWIO; Conv1d (qkv/proj 1x1) [O,I,1] -> [I,O];
Linear [O,I] -> [I,O]; GroupNorm weight/bias -> scale/bias. The qkv packing
needs no head reshuffle: the reference's legacy attention splits channels as
(heads, [q|k|v] x head_dim) (`unet.py:350-353`) and the Flax block reshapes
`Dense(3C)` output to `[..., heads, 3*dh]` then splits — identical layout.
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import jax
import numpy as np

LOGGER = logging.getLogger(__name__)


def _torch_prefix_for(module_name: str) -> str:
    """Map a top-level Flax module name to the reference torch prefix."""
    if module_name == "in_conv":
        return "input_blocks.0.0"
    if module_name == "time_mlp1":
        return "time_embed.0"
    if module_name == "time_mlp2":
        return "time_embed.2"
    if module_name == "out_norm":
        return "out.0"
    if module_name == "out_conv":
        return "out.2"
    if module_name == "out_ce_norm":
        return "out_ce.0"
    if module_name == "out_ce_conv":
        return "out_ce.2"
    if module_name == "mid_res1":
        return "middle_block.0"
    if module_name == "mid_attn":
        return "middle_block.1"
    if module_name == "mid_res2":
        return "middle_block.2"
    m = re.match(r"down_(\d+)_(res|attn|downsample)$", module_name)
    if m:
        idx, kind = int(m.group(1)), m.group(2)
        return {"res": f"input_blocks.{idx}.0",
                "attn": f"input_blocks.{idx}.1",
                "downsample": f"input_blocks.{idx}.0"}[kind]
    m = re.match(r"up_(\d+)_(res|attn|upsample)$", module_name)
    if m:
        idx, kind = int(m.group(1)), m.group(2)
        if kind == "res":
            return f"output_blocks.{idx}.0"
        if kind == "attn":
            return f"output_blocks.{idx}.1"
        return f"output_blocks.{idx}.__last__"  # resolved against the state dict
    raise KeyError(f"no torch mapping for flax module {module_name!r}")


_SUBMAP = {
    # ResBlock internals (unet.py:188-228)
    ("in_norm", "GroupNorm_0", "scale"): "in_layers.0.weight",
    ("in_norm", "GroupNorm_0", "bias"): "in_layers.0.bias",
    ("in_conv", "kernel"): "in_layers.2.weight",
    ("in_conv", "bias"): "in_layers.2.bias",
    ("emb_proj", "kernel"): "emb_layers.1.weight",
    ("emb_proj", "bias"): "emb_layers.1.bias",
    ("out_norm", "GroupNorm_0", "scale"): "out_layers.0.weight",
    ("out_norm", "GroupNorm_0", "bias"): "out_layers.0.bias",
    ("out_conv", "kernel"): "out_layers.3.weight",
    ("out_conv", "bias"): "out_layers.3.bias",
    ("skip", "kernel"): "skip_connection.weight",
    ("skip", "bias"): "skip_connection.bias",
    # AttentionBlock internals (unet.py:291-300)
    ("norm", "GroupNorm_0", "scale"): "norm.weight",
    ("norm", "GroupNorm_0", "bias"): "norm.bias",
    ("qkv", "kernel"): "qkv.weight",
    ("qkv", "bias"): "qkv.bias",
    ("proj", "kernel"): "proj_out.weight",
    ("proj", "bias"): "proj_out.bias",
    # Up/Downsample convs (unet.py:104,137)
    ("conv", "kernel"): "conv.weight",
    ("conv", "bias"): "conv.bias",
    ("op", "kernel"): "op.weight",
    ("op", "bias"): "op.bias",
    # bare GroupNorm/Conv heads & time MLP
    ("GroupNorm_0", "scale"): "weight",
    ("GroupNorm_0", "bias"): "bias",
    ("kernel",): "weight",
    ("bias",): "bias",
}


def _convert_array(torch_arr: np.ndarray, flax_leaf) -> np.ndarray:
    # Transpose strictly by rank — never skip on a shape match, or square
    # Linear weights (e.g. the [time_dim, time_dim] time_mlp2) would load
    # untransposed and silently corrupt the conversion.
    t = np.asarray(torch_arr)
    target_shape = tuple(flax_leaf.shape)
    if t.ndim == 4:  # Conv2d OIHW -> HWIO
        t = np.transpose(t, (2, 3, 1, 0))
    elif t.ndim == 3:  # Conv1d [O,I,1] -> Dense [I,O]
        t = np.transpose(t[:, :, 0])
    elif t.ndim == 2:  # Linear [O,I] -> [I,O]
        t = np.transpose(t)
    assert t.shape == target_shape, f"shape {t.shape} != {target_shape}"
    return t


def _torch_key_for(parts, last_index: Dict[int, int]) -> str:
    """Full torch state-dict key for a flax param path (shared by both
    conversion directions)."""
    prefix = _torch_prefix_for(parts[0])
    if prefix.endswith(".__last__"):
        j = int(prefix.split(".")[1])
        prefix = f"output_blocks.{j}.{last_index[j]}"
    for pattern, torch_sub in _SUBMAP.items():
        if parts[1:] == pattern:
            return f"{prefix}.{torch_sub}"
    raise KeyError(f"no torch mapping for flax path {parts}")


def flax_unet_to_torch(flax_params) -> Dict[str, np.ndarray]:
    """Inverse of `torch_unet_to_flax`: a Flax UNet param tree -> a reference
    torch state dict (numpy values; `torch.from_numpy` + `load_state_dict`
    on the consumer side).

    Layout inversions: Conv2d HWIO -> OIHW; attention qkv/proj Dense [I,O]
    -> Conv1d [O,I,1] (the reference's 1x1 convs, `unet.py:291-300`); other
    Dense [I,O] -> Linear [O,I]; GroupNorm scale/bias -> weight/bias.

    Completes the migration story in both directions: checkpoints trained
    here export to the reference's eval tooling (`evaluate_lidc_uncertainty
    .py:138-143` loads `average_model` state dicts) and round-trip through
    `torch_unet_to_flax` bit-exactly (tests/test_torch_parity.py).
    """
    leaves_with_path, _ = jax.tree_util.tree_flatten_with_path(flax_params)
    paths = [tuple(str(getattr(k, "key", k)) for k in path)
             for path, _ in leaves_with_path]
    # '__last__' (upsample position in each output block) from the tree
    # itself: [ResBlock, AttentionBlock?, Upsample] -> 2 with attention, 1
    # without (`unet.py:646-676` ordering)
    has_attn = {int(m.group(1)) for p in paths
                for m in [re.match(r"up_(\d+)_attn$", p[0])] if m}
    last_index = {int(m.group(1)): 2 if int(m.group(1)) in has_attn else 1
                  for p in paths
                  for m in [re.match(r"up_(\d+)_upsample$", p[0])] if m}

    state_dict: Dict[str, np.ndarray] = {}
    for parts, (_, leaf) in zip(paths, leaves_with_path):
        t = np.asarray(jax.device_get(leaf), dtype=np.float32)
        if t.ndim == 4:  # HWIO -> OIHW
            t = np.transpose(t, (3, 2, 0, 1))
        elif t.ndim == 2:
            if parts[0].endswith("attn") and parts[1] in ("qkv", "proj"):
                t = np.transpose(t)[:, :, None]  # Dense [I,O] -> Conv1d [O,I,1]
            else:
                t = np.transpose(t)  # Dense [I,O] -> Linear [O,I]
        state_dict[_torch_key_for(parts, last_index)] = t
    return state_dict


def torch_unet_to_flax(state_dict: Dict[str, np.ndarray], flax_params):
    """Map a reference UNet state dict onto a Flax param tree (same config)."""
    # resolve '__last__' (upsample position inside each output block)
    last_index: Dict[int, int] = {}
    for key in state_dict:
        m = re.match(r"output_blocks\.(\d+)\.(\d+)\.", key)
        if m:
            j, pos = int(m.group(1)), int(m.group(2))
            last_index[j] = max(last_index.get(j, 0), pos)

    leaves_with_path, _ = jax.tree_util.tree_flatten_with_path(flax_params)
    new_leaves = []
    used = set()
    for path, leaf in leaves_with_path:
        parts = tuple(str(getattr(k, "key", k)) for k in path)
        torch_key = _torch_key_for(parts, last_index)
        if torch_key not in state_dict:
            raise KeyError(f"{torch_key!r} (for flax {'/'.join(parts)}) missing from state dict")
        new_leaves.append(_convert_array(state_dict[torch_key], leaf))
        used.add(torch_key)

    unused = set(state_dict) - used
    if unused:
        LOGGER.warning("unconverted torch params: %s", sorted(unused)[:10])
    return jax.tree_util.tree_unflatten(jax.tree.structure(flax_params), new_leaves)
