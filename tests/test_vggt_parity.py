"""Numerical parity of the VGGT-family flax modules vs the vendored Meta
torch code (reference: src/model/encoder/backbone/vggt/), through the
checkpoint converter — pinning VGGT-1B conversion fidelity. Skipped when
torch or the reference tree is unavailable."""

import sys
from pathlib import Path

import numpy as np
import pytest

REF_BACKBONE = Path("/root/reference/src/model/encoder/backbone")

torch = pytest.importorskip("torch")
if not (REF_BACKBONE / "vggt").exists():
    pytest.skip("reference vggt tree not available", allow_module_level=True)

# The vendored vggt is a proper package; import it by adding its parent dir.
sys.path.insert(0, str(REF_BACKBONE))

import jax
import jax.numpy as jnp


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestVGGTBlockParity:
    def test_block_with_qknorm_layerscale_rope(self):
        from vggt.layers.block import Block
        from vggt.layers.rope import PositionGetter, RotaryPositionEmbedding2D

        torch.manual_seed(0)
        dim, heads, b = 64, 4, 2
        rope = RotaryPositionEmbedding2D(frequency=100.0)
        blk = Block(
            dim=dim, num_heads=heads, qkv_bias=True, init_values=0.01,
            qk_norm=True, rope=rope, fused_attn=False,
        )
        blk.eval()
        pos = PositionGetter()(b, 3, 3, torch.device("cpu")) + 1
        n = 9
        x = torch.randn(b, n, dim)
        with torch.no_grad():
            expected = blk(x, pos=pos).numpy()

        from spfsplatv2_tpu.models.vggt.layers import VGGTBlock
        from spfsplatv2_tpu.utils.ckpt_convert_vggt import _vggt_block

        params = _vggt_block({f"m.{k}": v for k, v in sd_numpy(blk).items()},
                             "m", qk_norm=True)
        model = VGGTBlock(
            num_heads=heads, qk_norm=True, init_values=0.01, rope_base=100.0,
            compute_dtype=jnp.float32,
        )
        got = model.apply(
            {"params": params}, jnp.asarray(x.numpy()),
            jnp.asarray(pos.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)

    def test_global_mask_matches_reference_formulation(self):
        # Reference builds a [S*P, S*P] additive mask by repeat_interleave
        # (aggregator.py:330-346); ours must match.
        from spfsplatv2_tpu.models.vggt.aggregator import global_view_mask

        s, p, num_target = 3, 4, 1
        m = torch.ones((s, s), dtype=torch.bool)
        for i in range(s - num_target):
            m[i, s - num_target:] = False
        m = torch.where(m, torch.tensor(0.0), torch.tensor(float("-inf")))
        m = m.repeat_interleave(p, dim=1)
        m = m.unsqueeze(1).repeat(1, p, 1).reshape(s * p, s * p)
        ours = np.asarray(global_view_mask(s, p, num_target))
        np.testing.assert_array_equal(np.asarray(m), ours)


class TestCameraHeadParity:
    def test_camera_head(self):
        from vggt.heads.camera_head import CameraHead as RefCameraHead

        torch.manual_seed(1)
        dim = 64
        head = RefCameraHead(
            dim_in=dim, trunk_depth=2, num_heads=4, mlp_ratio=4,
            init_values=0.01,
        )
        head.eval()
        b, s = 2, 3
        tokens = torch.randn(b, s, 5, dim)
        with torch.no_grad():
            expected = head([tokens])[-1].numpy()

        from spfsplatv2_tpu.models.vggt.camera_head import (
            CameraHead,
            CameraHeadConfig,
        )
        from spfsplatv2_tpu.utils.ckpt_convert_vggt import convert_camera_head

        params = convert_camera_head(
            {f"h.{k}": v for k, v in sd_numpy(head).items()}, "h",
            trunk_depth=2,
        )
        model = CameraHead(
            CameraHeadConfig(dim_in=dim, trunk_depth=2, num_heads=4)
        )
        got = model.apply(
            {"params": params}, jnp.asarray(tokens[:, :, 0].numpy())
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5)


class TestVGGTDPTParity:
    def test_point_head(self):
        from vggt.heads.dpt_head import DPTHead as RefDPTHead

        torch.manual_seed(2)
        dim_in = 32
        head = RefDPTHead(
            dim_in=dim_in, patch_size=14, output_dim=4,
            features=16, out_channels=[8, 12, 16, 16],
            intermediate_layer_idx=[0, 1, 2, 3], pos_embed=True,
        )
        head.eval()
        b, s, gh, gw = 1, 2, 2, 2
        n_special = 3
        tokens = [
            torch.randn(b, s, n_special + gh * gw, dim_in) for _ in range(4)
        ]
        images = torch.rand(b, s, 3, gh * 14, gw * 14)
        with torch.no_grad():
            pts, conf = head(tokens, images, n_special)
        expected_pts = pts.numpy()
        expected_conf = conf.numpy()

        from spfsplatv2_tpu.models.vggt.dpt_head import VGGTDPTHead
        from spfsplatv2_tpu.utils.ckpt_convert_vggt import convert_vggt_dpt_head

        params = convert_vggt_dpt_head(
            {f"h.{k}": v for k, v in sd_numpy(head).items()}, "h"
        )
        model = VGGTDPTHead(
            output_dim=4, features=16, out_channels=(8, 12, 16, 16),
            patch_size=14, gs_variant=False, hooks=(0, 1, 2, 3),
        )
        got_pts, got_conf = model.apply(
            {"params": params},
            [jnp.asarray(t.numpy()) for t in tokens],
            (gh, gw), n_special,
        )
        np.testing.assert_allclose(
            np.asarray(got_pts), expected_pts, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_conf), expected_conf, rtol=1e-4, atol=1e-4
        )
