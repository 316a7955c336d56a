"""Torch -> JAX conversion for VGGT-1B (and SPFSplatV2-L) checkpoints.

TPU-native replacement for the reference's HF-hub weight loading
(reference: src/model/encoder/backbone/backbone_masked_vggt.py:37-40
`VGGT.from_pretrained("facebook/VGGT-1B")`): maps the vendored Meta module
names (src/model/encoder/backbone/vggt/) onto this package's flax trees:

  torch                                   flax (models/vggt, models/encoder_vggt)
  aggregator.patch_embed.*  (DINOv2)  ->  aggregator/patch_embed/*
  aggregator.frame_blocks.{i}.*       ->  aggregator/frame_blocks_{i}/*
  aggregator.global_blocks.{i}.*      ->  aggregator/global_blocks_{i}/*
  aggregator.camera_token / register_token -> params (first/other frame rows)
  camera_head.*                       ->  camera_head/*
  point_head.*                        ->  point_head/*
  gaussian_param_head.*               ->  gaussian_param_head/*  (SPFSplat ckpts)

`track_head` / `depth_head` weights are ignored (the reference never
instantiates them for SPFSplatV2-L, models/vggt.py).
"""

from __future__ import annotations

import numpy as np

from spfsplatv2_tpu.utils.ckpt_convert import (
    _conv,
    _conv_transpose,
    _dense,
    _layernorm,
)


def _vggt_block(sd: dict, p: str, qk_norm: bool) -> dict:
    out = {
        "norm1": _layernorm(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"]),
        "attn": {
            "qkv": _dense(sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"]),
            "proj": _dense(sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"]),
        },
        "norm2": _layernorm(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"]),
        "mlp_fc1": _dense(sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"]),
        "mlp_fc2": _dense(sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"]),
    }
    if qk_norm and f"{p}.attn.q_norm.weight" in sd:
        out["attn"]["q_norm"] = _layernorm(
            sd[f"{p}.attn.q_norm.weight"], sd[f"{p}.attn.q_norm.bias"]
        )
        out["attn"]["k_norm"] = _layernorm(
            sd[f"{p}.attn.k_norm.weight"], sd[f"{p}.attn.k_norm.bias"]
        )
    if f"{p}.ls1.gamma" in sd:
        out["ls1"] = {"gamma": sd[f"{p}.ls1.gamma"]}
        out["ls2"] = {"gamma": sd[f"{p}.ls2.gamma"]}
    return out


def convert_dinov2(sd: dict, prefix: str, depth: int = 24) -> dict:
    p = prefix
    out = {
        "patch_embed": _conv(
            sd[f"{p}.patch_embed.proj.weight"], sd[f"{p}.patch_embed.proj.bias"]
        ),
        "cls_token": sd[f"{p}.cls_token"],
        "pos_embed": sd[f"{p}.pos_embed"],
        "register_tokens": sd[f"{p}.register_tokens"],
        "norm": _layernorm(sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"]),
    }
    for i in range(depth):
        out[f"blocks_{i}"] = _vggt_block(sd, f"{p}.blocks.{i}", qk_norm=False)
    return out


def convert_vggt_dpt_head(sd: dict, prefix: str, gs: bool = False) -> dict:
    p = prefix
    out = {
        "norm": _layernorm(sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"]),
    }
    for i in range(4):
        out[f"projects_{i}"] = _conv(
            sd[f"{p}.projects.{i}.weight"], sd[f"{p}.projects.{i}.bias"]
        )
    out["resize_0"] = _conv_transpose(
        sd[f"{p}.resize_layers.0.weight"], sd[f"{p}.resize_layers.0.bias"]
    )
    out["resize_1"] = _conv_transpose(
        sd[f"{p}.resize_layers.1.weight"], sd[f"{p}.resize_layers.1.bias"]
    )
    out["resize_3"] = _conv(
        sd[f"{p}.resize_layers.3.weight"], sd[f"{p}.resize_layers.3.bias"]
    )
    for i in range(1, 5):
        out[f"layer{i}_rn"] = _conv(sd[f"{p}.scratch.layer{i}_rn.weight"])
        rp = f"{p}.scratch.refinenet{i}"
        block = {
            "out_conv": _conv(
                sd[f"{rp}.out_conv.weight"], sd[f"{rp}.out_conv.bias"]
            ),
            "resConfUnit2": {
                "conv1": _conv(
                    sd[f"{rp}.resConfUnit2.conv1.weight"],
                    sd[f"{rp}.resConfUnit2.conv1.bias"],
                ),
                "conv2": _conv(
                    sd[f"{rp}.resConfUnit2.conv2.weight"],
                    sd[f"{rp}.resConfUnit2.conv2.bias"],
                ),
            },
        }
        if f"{rp}.resConfUnit1.conv1.weight" in sd:
            block["resConfUnit1"] = {
                "conv1": _conv(
                    sd[f"{rp}.resConfUnit1.conv1.weight"],
                    sd[f"{rp}.resConfUnit1.conv1.bias"],
                ),
                "conv2": _conv(
                    sd[f"{rp}.resConfUnit1.conv2.weight"],
                    sd[f"{rp}.resConfUnit1.conv2.bias"],
                ),
            }
        out[f"refinenet{i}"] = block
    out["output_conv1"] = _conv(
        sd[f"{p}.scratch.output_conv1.weight"], sd[f"{p}.scratch.output_conv1.bias"]
    )
    out["output_conv2_0"] = _conv(
        sd[f"{p}.scratch.output_conv2.0.weight"],
        sd[f"{p}.scratch.output_conv2.0.bias"],
    )
    out["output_conv2_2"] = _conv(
        sd[f"{p}.scratch.output_conv2.2.weight"],
        sd[f"{p}.scratch.output_conv2.2.bias"],
    )
    if gs and f"{p}.input_merger.0.weight" in sd:
        out["input_merger"] = _conv(
            sd[f"{p}.input_merger.0.weight"], sd[f"{p}.input_merger.0.bias"]
        )
    return out


def convert_camera_head(sd: dict, prefix: str, trunk_depth: int = 4) -> dict:
    p = prefix
    out = {
        "token_norm": _layernorm(
            sd[f"{p}.token_norm.weight"], sd[f"{p}.token_norm.bias"]
        ),
        "trunk_norm": _layernorm(
            sd[f"{p}.trunk_norm.weight"], sd[f"{p}.trunk_norm.bias"]
        ),
        "empty_pose_tokens": sd[f"{p}.empty_pose_tokens"],
        "embed_pose": _dense(
            sd[f"{p}.embed_pose.weight"], sd[f"{p}.embed_pose.bias"]
        ),
        "poseLN_modulation": _dense(
            sd[f"{p}.poseLN_modulation.1.weight"],
            sd[f"{p}.poseLN_modulation.1.bias"],
        ),
        "pose_branch_fc1": _dense(
            sd[f"{p}.pose_branch.fc1.weight"], sd[f"{p}.pose_branch.fc1.bias"]
        ),
        "pose_branch_fc2": _dense(
            sd[f"{p}.pose_branch.fc2.weight"], sd[f"{p}.pose_branch.fc2.bias"]
        ),
    }
    for i in range(trunk_depth):
        out[f"trunk_{i}"] = _vggt_block(sd, f"{p}.trunk.{i}", qk_norm=False)
    return out


def convert_vggt_checkpoint(
    sd: dict,
    depth: int = 24,
    dinov2_depth: int = 24,
    has_gs_head: bool = True,
) -> dict:
    """Full VGGT / SPFSplatV2-L torch state dict -> flax params tree."""
    import re

    sd = {re.sub(r"^(encoder\.|model\.|backbone\.model\.)", "", k): np.asarray(v)
          for k, v in sd.items()}

    agg: dict = {
        "patch_embed": convert_dinov2(sd, "aggregator.patch_embed", dinov2_depth),
        "camera_token": np.asarray(sd["aggregator.camera_token"])[0, :, 0],
        "register_token": np.asarray(sd["aggregator.register_token"])[0],
    }
    # camera_token torch (1, 2, 1, C) -> ours (2, 1, C); register (1,2,R,C)->(2,R,C)
    agg["camera_token"] = np.asarray(sd["aggregator.camera_token"])[0][:, :, :][
        :, :1, :
    ].reshape(2, 1, -1)
    agg["register_token"] = np.asarray(sd["aggregator.register_token"])[0]
    for i in range(depth):
        agg[f"frame_blocks_{i}"] = _vggt_block(
            sd, f"aggregator.frame_blocks.{i}", qk_norm=True
        )
        agg[f"global_blocks_{i}"] = _vggt_block(
            sd, f"aggregator.global_blocks.{i}", qk_norm=True
        )
    if "aggregator.intrinsic_encoder.weight" in sd:
        agg["intrinsic_encoder"] = _dense(
            sd["aggregator.intrinsic_encoder.weight"],
            sd["aggregator.intrinsic_encoder.bias"],
        )

    params: dict = {"aggregator": agg}
    if "camera_head.token_norm.weight" in sd:
        params["camera_head"] = convert_camera_head(sd, "camera_head")
    if "point_head.norm.weight" in sd:
        params["point_head"] = convert_vggt_dpt_head(sd, "point_head")
    if has_gs_head and "gaussian_param_head.norm.weight" in sd:
        params["gaussian_param_head"] = convert_vggt_dpt_head(
            sd, "gaussian_param_head", gs=True
        )
    return params
