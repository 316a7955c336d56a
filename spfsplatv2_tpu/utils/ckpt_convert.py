"""Torch -> JAX checkpoint conversion for MASt3R/SPFSplatV2 weights.

TPU-native replacement for the reference's pretrained-weight surgery
(reference: src/misc/weight_modify.py:144-204 checkpoint_filter_fn and the
`load_state_dict` dec_blocks2 duplication, backbone_masked_croco.py:126-133):

  * maps reference torch module names onto this package's flax param tree,
  * transposes Dense (out, in) -> (in, out), Conv OIHW -> HWIO and
    ConvTranspose IOHW -> HWIO kernels,
  * duplicates `dec_blocks` into `dec_blocks2` when the checkpoint predates
    the asymmetric decoder (MASt3R checkpoints),
  * strips DPT confidence channels when present (conf-head stripping),
  * resamples the patch-embed kernel for resolution changes
    (FlexiViT-style pseudo-inverse resize, weight_modify.py:13-100).

Input is a flat {torch_name: numpy array} dict (load it host-side with
`torch.load(..., map_location='cpu')` and `.numpy()`), so the converter
itself has no torch dependency.
"""

from __future__ import annotations

import re

import numpy as np


def _dense(w, b=None):
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = b
    return out


def _conv(w, b=None):
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if b is not None:
        out["bias"] = b
    return out


def _conv_transpose(w, b=None):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # with transpose_kernel=True, kernel (kh, kw, out, in); verified exact
    # against torch in tests/test_parity.py.
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if b is not None:
        out["bias"] = b
    return out


def _layernorm(w, b):
    return {"scale": w, "bias": b}


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def resample_patch_embed(kernel_oihw: np.ndarray, new_hw: tuple[int, int]) -> np.ndarray:
    """FlexiViT pinv-resize of a patch-embed kernel (weight_modify.py:13-100)."""
    o, i, h, w = kernel_oihw.shape
    nh, nw = new_hw
    if (h, w) == (nh, nw):
        return kernel_oihw

    def resize_mat(old, new):
        # Matrix mapping a flattened old patch to a flattened resized patch
        # via bilinear interpolation.
        from spfsplatv2_tpu.utils.interp import resize_bilinear
        import jax.numpy as jnp

        basis = np.eye(old[0] * old[1], dtype=np.float32).reshape(
            -1, old[0], old[1], 1
        )
        resized = np.asarray(
            resize_bilinear(jnp.asarray(basis), new, align_corners=False)
        )
        return resized.reshape(-1, new[0] * new[1])

    mat = resize_mat((h, w), (nh, nw))  # (h*w, nh*nw)
    pinv = np.linalg.pinv(mat)  # (nh*nw, h*w)
    flat = kernel_oihw.reshape(o * i, h * w)
    out = flat @ pinv.T
    return out.reshape(o, i, nh, nw)


def convert_croco_block(sd: dict, prefix: str, cross: bool) -> dict:
    """One encoder/decoder transformer block."""
    p = prefix
    out = {
        "norm1": _layernorm(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"]),
        "attn": {
            "qkv": _dense(sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"]),
            "proj": _dense(sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"]),
        },
        "norm2": _layernorm(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"]),
        "mlp": {
            "fc1": _dense(sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"]),
            "fc2": _dense(sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"]),
        },
    }
    if cross:
        out["norm3"] = _layernorm(sd[f"{p}.norm3.weight"], sd[f"{p}.norm3.bias"])
        out["norm_y"] = _layernorm(sd[f"{p}.norm_y.weight"], sd[f"{p}.norm_y.bias"])
        out["cross_attn"] = {
            name: _dense(
                sd[f"{p}.cross_attn.{name}.weight"], sd[f"{p}.cross_attn.{name}.bias"]
            )
            for name in ("projq", "projk", "projv", "proj")
        }
    return out


def convert_dpt_head(sd: dict, prefix: str, gs: bool, strip_conf: bool = True) -> dict:
    """DPT head weights (reference heads/dpt_block.py naming)."""
    p = f"{prefix}.dpt"
    core = {}
    act_names = [
        ("act_0_proj", f"{p}.act_postprocess.0.0", _conv),
        ("act_0_up", f"{p}.act_postprocess.0.1", _conv_transpose),
        ("act_1_proj", f"{p}.act_postprocess.1.0", _conv),
        ("act_1_up", f"{p}.act_postprocess.1.1", _conv_transpose),
        ("act_2_proj", f"{p}.act_postprocess.2.0", _conv),
        ("act_3_proj", f"{p}.act_postprocess.3.0", _conv),
        ("act_3_down", f"{p}.act_postprocess.3.1", _conv),
    ]
    for flax_name, torch_name, fn in act_names:
        core[flax_name] = fn(
            sd[f"{torch_name}.weight"], sd.get(f"{torch_name}.bias")
        )
    for i in range(1, 5):
        core[f"layer{i}_rn"] = _conv(sd[f"{p}.scratch.layer{i}_rn.weight"])
    for i in range(1, 5):
        rp = f"{p}.scratch.refinenet{i}"
        core[f"refinenet{i}"] = {
            "out_conv": _conv(sd[f"{rp}.out_conv.weight"], sd[f"{rp}.out_conv.bias"]),
            **{
                f"resConfUnit{j}": {
                    "conv1": _conv(
                        sd[f"{rp}.resConfUnit{j}.conv1.weight"],
                        sd[f"{rp}.resConfUnit{j}.conv1.bias"],
                    ),
                    "conv2": _conv(
                        sd[f"{rp}.resConfUnit{j}.conv2.weight"],
                        sd[f"{rp}.resConfUnit{j}.conv2.bias"],
                    ),
                }
                for j in (1, 2)
            },
        }
    out = {"core": core}
    if gs:
        out["input_merger"] = _conv(
            sd[f"{p}.input_merger.0.weight"], sd[f"{p}.input_merger.0.bias"]
        )
        out["head_conv"] = _conv(sd[f"{p}.head.0.weight"])
        out["head_out"] = _conv(sd[f"{p}.head.4.weight"], sd[f"{p}.head.4.bias"])
    else:
        out["head_conv1"] = _conv(sd[f"{p}.head.0.weight"], sd[f"{p}.head.0.bias"])
        out["head_conv2"] = _conv(sd[f"{p}.head.2.weight"], sd[f"{p}.head.2.bias"])
        w4, b4 = sd[f"{p}.head.4.weight"], sd[f"{p}.head.4.bias"]
        if strip_conf and w4.shape[0] == 4:
            # Conf-channel stripping (weight_modify.py:195-200).
            w4, b4 = w4[:3], b4[:3]
        out["head_out"] = _conv(w4, b4)
    return out


def convert_pose_head(sd: dict, prefix: str) -> dict:
    p = prefix
    return {
        "mlp1": _dense(sd[f"{p}.more_mlps.0.weight"], sd[f"{p}.more_mlps.0.bias"]),
        "mlp2": _dense(sd[f"{p}.more_mlps.2.weight"], sd[f"{p}.more_mlps.2.bias"]),
        "fc_t": _dense(sd[f"{p}.fc_t.weight"], sd[f"{p}.fc_t.bias"]),
        "fc_rot": _dense(sd[f"{p}.fc_rot.weight"], sd[f"{p}.fc_rot.bias"]),
    }


def convert_spfsplat_checkpoint(
    sd: dict,
    enc_depth: int = 24,
    dec_depth: int = 12,
    patch_hw: tuple[int, int] = (16, 16),
    has_gs_heads: bool = True,
    has_pose_heads: bool = True,
) -> dict:
    """Full SPFSplatV2 (or raw MASt3R) torch state dict -> flax params.

    Accepts either `backbone.`-prefixed SPFSplat checkpoints or raw MASt3R
    checkpoints (keys are normalized first, mirroring checkpoint_filter_fn).
    Missing pieces (gs/pose heads in a raw MASt3R ckpt) are simply absent
    from the returned tree; merge over freshly-initialized params.
    """
    # Normalize: drop a leading "encoder." (lightning) prefix if present.
    sd = {re.sub(r"^encoder\.", "", k): np.asarray(v) for k, v in sd.items()}

    # MASt3R ckpts have no backbone. prefix; SPFSplat ckpts do.
    if not any(k.startswith("backbone.") for k in sd):
        sd = {
            (f"backbone.{k}" if not k.startswith(("downstream_head", "gaussian_param_head", "pose_head")) else k): v
            for k, v in sd.items()
        }

    # dec_blocks2 duplication (backbone_masked_croco.py:126-133).
    if not any("dec_blocks2" in k for k in sd):
        for k in list(sd):
            if ".dec_blocks." in k:
                sd[k.replace(".dec_blocks.", ".dec_blocks2.")] = sd[k]

    params: dict = {"backbone": {}}
    bb = params["backbone"]

    pe_w = sd["backbone.patch_embed.proj.weight"]
    if pe_w.shape[-2:] != patch_hw:
        pe_w = resample_patch_embed(pe_w, patch_hw)
    bb["patch_embed"] = {"proj": _conv(pe_w, sd["backbone.patch_embed.proj.bias"])}

    for i in range(enc_depth):
        bb[f"enc_blocks_{i}"] = convert_croco_block(
            sd, f"backbone.enc_blocks.{i}", cross=False
        )
    bb["enc_norm"] = _layernorm(
        sd["backbone.enc_norm.weight"], sd["backbone.enc_norm.bias"]
    )
    bb["decoder_embed"] = _dense(
        sd["backbone.decoder_embed.weight"], sd["backbone.decoder_embed.bias"]
    )
    for i in range(dec_depth):
        bb[f"dec_blocks_{i}"] = convert_croco_block(
            sd, f"backbone.dec_blocks.{i}", cross=True
        )
        bb[f"dec_blocks2_{i}"] = convert_croco_block(
            sd, f"backbone.dec_blocks2.{i}", cross=True
        )
    bb["dec_norm"] = _layernorm(
        sd["backbone.dec_norm.weight"], sd["backbone.dec_norm.bias"]
    )
    if "backbone.intrinsic_encoder.weight" in sd:
        bb["intrinsic_encoder"] = _dense(
            sd["backbone.intrinsic_encoder.weight"],
            sd["backbone.intrinsic_encoder.bias"],
        )
    if "backbone.pose_token" in sd:
        bb["pose_token"] = sd["backbone.pose_token"]

    for n in (1, 2):
        if f"downstream_head{n}.dpt.scratch.layer1_rn.weight" in sd:
            params[f"downstream_head{n}"] = convert_dpt_head(
                sd, f"downstream_head{n}", gs=False
            )
        if has_gs_heads and f"gaussian_param_head{n}.dpt.scratch.layer1_rn.weight" in sd:
            params[f"gaussian_param_head{n}"] = convert_dpt_head(
                sd, f"gaussian_param_head{n}", gs=True
            )
        pose_key = "pose_head" if n == 1 else "pose_head2"
        if has_pose_heads and f"{pose_key}.fc_t.weight" in sd:
            params[f"pose_head{n}"] = convert_pose_head(sd, pose_key)

    return params


def convert_dust3r_distiller_checkpoint(
    sd: dict, enc_depth: int = 24, dec_depth: int = 12,
    patch_hw: tuple[int, int] = (16, 16),
) -> dict:
    """Raw DUSt3R/MASt3R torch state dict -> Dust3RDistiller flax params.

    The teacher (reference src/model/distiller/dust3r_backbone.py) is the
    same CroCo trunk as the student backbone plus two 4-channel (pts3d +
    conf) DPT heads, so this reuses the SPFSplat converter with conf
    channels KEPT (the distillation loss consumes them).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if not any(k.startswith("backbone.") for k in sd):
        sd = {
            (
                f"backbone.{k}"
                if not k.startswith("downstream_head")
                else k
            ): v
            for k, v in sd.items()
        }
    if not any("dec_blocks2" in k for k in sd):
        for k in list(sd):
            if ".dec_blocks." in k:
                sd[k.replace(".dec_blocks.", ".dec_blocks2.")] = sd[k]

    params = convert_spfsplat_checkpoint(
        sd, enc_depth=enc_depth, dec_depth=dec_depth, patch_hw=patch_hw,
        has_gs_heads=False, has_pose_heads=False,
    )
    # Re-convert heads keeping the confidence output channel.
    for n in (1, 2):
        if f"downstream_head{n}.dpt.scratch.layer1_rn.weight" in sd:
            params[f"downstream_head{n}"] = convert_dpt_head(
                sd, f"downstream_head{n}", gs=False, strip_conf=False
            )
    return params


def merge_params(init_params: dict, converted: dict) -> dict:
    """Overlay converted weights onto freshly-initialized params.

    Raises on shape mismatch; leaves params missing from `converted` at
    their fresh initialization (e.g. heads absent from a raw MASt3R ckpt).
    """
    import jax

    if "params" in init_params and "params" not in converted:
        # flax .init() wraps everything in a top-level "params" collection.
        converted = {"params": converted}

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted param {path}/{k} not in model")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"model {dst[k].shape} vs ckpt {np.shape(v)}"
                    )
                out[k] = jax.numpy.asarray(v, dtype=dst[k].dtype)
        return out

    return {**init_params, "params": merge(init_params["params"], converted)}
