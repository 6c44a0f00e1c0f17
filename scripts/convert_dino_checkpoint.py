#!/usr/bin/env python
"""Convert DINO ViT torch weights (.pth from facebookresearch/dino) to the
.npz layout `ccdm_tpu.models.dino.load_dino_npz` expects.

Usage:  python scripts/convert_dino_checkpoint.py dino_vits8.pth out.npz \
            [--model dino_vits8]

Mapping (torch timm-style DINO VisionTransformer -> Flax DinoViT):
- patch_embed.proj.{weight OIHW, bias}      -> patch_embed/{kernel HWIO, bias}
- cls_token, pos_embed                      -> cls_token, pos_embed
- blocks.N.norm1.{weight,bias}              -> block_N/norm1/{scale,bias}
- blocks.N.attn.qkv.{weight,bias}           -> block_N/attn_qkv/{kernel.T, bias}
- blocks.N.attn.proj.{weight,bias}          -> block_N/attn_proj/{kernel.T, bias}
- blocks.N.norm2, blocks.N.mlp.fc1/.fc2     -> block_N/norm2, mlp_fc1, mlp_fc2

Note on qkv ordering: torch packs qkv as [3*D, D] with q,k,v contiguous on
the output dim; the Flax module reshapes `Dense(3D)` output to
[..., 3, heads, dh], i.e. expects the same q,k,v-major packing — the weight
transpose alone is sufficient.

This needs network-free local .pth files; run it wherever the weights exist
and ship the .npz.
"""

import argparse

import numpy as np


def convert(state: dict) -> dict:
    out = {}

    def put(name, arr):
        out[name] = np.asarray(arr)

    put("cls_token", state["cls_token"])
    put("pos_embed", state["pos_embed"])
    put("patch_embed/kernel", np.transpose(state["patch_embed.proj.weight"], (2, 3, 1, 0)))
    put("patch_embed/bias", state["patch_embed.proj.bias"])

    n = 0
    while f"blocks.{n}.norm1.weight" in state:
        pre = f"blocks.{n}"
        dst = f"block_{n}"
        put(f"{dst}/norm1/scale", state[f"{pre}.norm1.weight"])
        put(f"{dst}/norm1/bias", state[f"{pre}.norm1.bias"])
        put(f"{dst}/attn_qkv/kernel", np.transpose(state[f"{pre}.attn.qkv.weight"]))
        put(f"{dst}/attn_qkv/bias", state[f"{pre}.attn.qkv.bias"])
        put(f"{dst}/attn_proj/kernel", np.transpose(state[f"{pre}.attn.proj.weight"]))
        put(f"{dst}/attn_proj/bias", state[f"{pre}.attn.proj.bias"])
        put(f"{dst}/norm2/scale", state[f"{pre}.norm2.weight"])
        put(f"{dst}/norm2/bias", state[f"{pre}.norm2.bias"])
        put(f"{dst}/mlp_fc1/kernel", np.transpose(state[f"{pre}.mlp.fc1.weight"]))
        put(f"{dst}/mlp_fc1/bias", state[f"{pre}.mlp.fc1.bias"])
        put(f"{dst}/mlp_fc2/kernel", np.transpose(state[f"{pre}.mlp.fc2.weight"]))
        put(f"{dst}/mlp_fc2/bias", state[f"{pre}.mlp.fc2.bias"])
        n += 1
    assert n > 0, "no transformer blocks found in state dict"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_pth")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import torch

    state = torch.load(args.torch_pth, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    converted = convert(state)
    np.savez(args.out_npz, **converted)
    print(f"wrote {args.out_npz} ({len(converted)} arrays)")


if __name__ == "__main__":
    main()
