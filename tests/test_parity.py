"""Numerical parity tests against the reference torch modules.

These load the reference implementation (read-only, at /root/reference) as
isolated torch modules, push IDENTICAL weights through utils/ckpt_convert,
and assert that our flax modules reproduce the torch outputs. This pins the
checkpoint-conversion fidelity (SURVEY.md hard part #3) without needing the
actual 1.3GB MASt3R checkpoint. Skipped wholesale when the reference tree
or torch is unavailable.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/model/encoder")

torch = pytest.importorskip("torch")
if not REF.exists():
    pytest.skip("reference tree not available", allow_module_level=True)

import jax
import jax.numpy as jnp


def _load_module(name: str, path: Path, package_dir: Path | None = None):
    """Load a reference file as a module; optionally as part of a package
    so its relative imports resolve."""
    if package_dir is not None:
        import types

        pkg_name = f"refpkg_{package_dir.name}"
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [str(package_dir)]
            sys.modules[pkg_name] = pkg
        full = f"{pkg_name}.{name}"
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_blocks():
    return _load_module(
        "blocks", REF / "backbone/croco/blocks.py", REF / "backbone/croco"
    )


@pytest.fixture(scope="module")
def ref_rope():
    return _load_module(
        "pos_embed", REF / "backbone/croco/pos_embed.py", REF / "backbone/croco"
    )


def state_dict_numpy(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestRoPEParity:
    def test_rope2d_matches_reference(self, ref_rope):
        torch.manual_seed(0)
        b, heads, n, d = 2, 3, 17, 32
        tokens = torch.randn(b, heads, n, d)
        pos = torch.randint(0, 24, (b, n, 2))

        ref = ref_rope.RoPE2D(freq=100.0)
        expected = ref(tokens, pos).numpy()

        from spfsplatv2_tpu.ops.rope import rope_2d

        got = np.asarray(
            rope_2d(jnp.asarray(tokens.numpy()), jnp.asarray(pos.numpy()), 100.0)
        )
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestBlockParity:
    def test_encoder_block(self, ref_blocks, ref_rope):
        torch.manual_seed(1)
        dim, heads, n, b = 64, 4, 25, 2
        rope = ref_rope.RoPE2D(freq=100.0)
        blk = ref_blocks.Block(dim, heads, mlp_ratio=4.0, qkv_bias=True, rope=rope)
        blk.eval()
        x = torch.randn(b, n, dim)
        pos = torch.randint(0, 10, (b, n, 2))
        with torch.no_grad():
            expected = blk(x, pos).numpy()

        from spfsplatv2_tpu.models.croco.layers import EncoderBlock
        from spfsplatv2_tpu.utils.ckpt_convert import convert_croco_block

        sd = {f"blk.{k}": v for k, v in state_dict_numpy(blk).items()}
        params = convert_croco_block(sd, "blk", cross=False)
        model = EncoderBlock(num_heads=heads, compute_dtype=jnp.float32)
        got = model.apply(
            {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(pos.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)

    def test_decoder_block(self, ref_blocks, ref_rope):
        torch.manual_seed(2)
        dim, heads, n, m, b = 48, 4, 9, 18, 2
        rope = ref_rope.RoPE2D(freq=100.0)
        blk = ref_blocks.DecoderBlock(
            dim, heads, mlp_ratio=4.0, qkv_bias=True, norm_mem=True, rope=rope
        )
        blk.eval()
        x = torch.randn(b, n, dim)
        y = torch.randn(b, m, dim)
        xpos = torch.randint(0, 6, (b, n, 2))
        ypos = torch.randint(0, 6, (b, m, 2))
        with torch.no_grad():
            expected = blk(x, y, xpos, ypos)[0].numpy()

        from spfsplatv2_tpu.models.croco.layers import DecoderBlock
        from spfsplatv2_tpu.utils.ckpt_convert import convert_croco_block

        sd = {f"blk.{k}": v for k, v in state_dict_numpy(blk).items()}
        params = convert_croco_block(sd, "blk", cross=True)
        model = DecoderBlock(num_heads=heads, compute_dtype=jnp.float32)
        got = model.apply(
            {"params": params},
            jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
            jnp.asarray(xpos.numpy()), jnp.asarray(ypos.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)

    def test_masked_multiview_cross_attention_equals_slicing(
        self, ref_blocks, ref_rope
    ):
        """Our single masked attention over (v*l) tokens must equal the
        reference's mask-v2 per-view slicing approach."""
        torch.manual_seed(3)
        dim, heads, l, b, v = 48, 4, 8, 1, 3
        rope = ref_rope.RoPE2D(freq=100.0)
        blk = ref_blocks.DecoderBlock(
            dim, heads, mlp_ratio=4.0, qkv_bias=True, norm_mem=True, rope=rope
        )
        blk.eval()
        x = torch.randn(b, v, l, dim)
        pos = torch.randint(0, 4, (b, v, l, 2))
        num_target = 1

        # Reference mask-v2: view 0 attends to view 1 (context); view 1
        # attends to view 0; target view 2 attends to views 0, 1.
        def ref_forward(i, allowed):
            mem = torch.cat([x[:, j] for j in allowed], dim=1)
            mpos = torch.cat([pos[:, j] for j in allowed], dim=1)
            with torch.no_grad():
                return blk(x[:, i], mem, pos[:, i], mpos)[0].numpy()

        expected = np.stack(
            [ref_forward(0, [1]), ref_forward(1, [0]), ref_forward(2, [0, 1])],
            axis=1,
        )

        from spfsplatv2_tpu.models.croco.backbone import (
            MultiViewDecoderBlock,
            build_cross_view_mask,
        )
        from spfsplatv2_tpu.utils.ckpt_convert import convert_croco_block

        sd = {f"blk.{k}": v_ for k, v_ in state_dict_numpy(blk).items()}
        params = convert_croco_block(sd, "blk", cross=True)
        model = MultiViewDecoderBlock(
            num_heads=heads, mlp_ratio=4.0, rope_base=100.0,
            compute_dtype=jnp.float32,
        )
        mask = build_cross_view_mask(v, num_target)
        got = model.apply(
            {"params": params},
            jnp.asarray(x.numpy()), jnp.asarray(pos.numpy()), mask,
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)

    def test_v1_unmasked_dual_decoder_equals_ctx_views_slicing(
        self, ref_blocks, ref_rope
    ):
        """The v1 (SPFSplat) dual decoder: view 0 through dec_blocks, the
        rest through dec_blocks2, every view cross-attending to ALL OTHER
        views (reference AsymmetricCroCoMulti._decoder's generate_ctx_views
        slicing, backbone_croco_multiview.py:166-207) must equal our
        diagonal-masked MultiViewDecoderBlock pair with lo/hi splits."""
        torch.manual_seed(5)
        dim, heads, l, b, v = 48, 4, 8, 1, 3
        rope = ref_rope.RoPE2D(freq=100.0)

        def make_blk():
            blk = ref_blocks.DecoderBlock(
                dim, heads, mlp_ratio=4.0, qkv_bias=True, norm_mem=True,
                rope=rope,
            )
            blk.eval()
            return blk

        blk1, blk2 = make_blk(), make_blk()
        x = torch.randn(b, v, l, dim)
        pos = torch.randint(0, 4, (b, v, l, 2))

        def ctx(i):
            others = [j for j in range(v) if j != i]
            return (
                torch.cat([x[:, j] for j in others], dim=1),
                torch.cat([pos[:, j] for j in others], dim=1),
            )

        with torch.no_grad():
            m0, p0 = ctx(0)
            f1 = blk1(x[:, 0], m0, pos[:, 0], p0)[0].numpy()
            f2 = []
            for i in range(1, v):
                mi, pi = ctx(i)
                f2.append(blk2(x[:, i], mi, pos[:, i], pi)[0].numpy())
        expected = np.stack([f1, *f2], axis=1)

        from spfsplatv2_tpu.models.croco.backbone import (
            MultiViewDecoderBlock,
            build_cross_view_mask,
        )
        from spfsplatv2_tpu.utils.ckpt_convert import convert_croco_block

        def jax_params(blk):
            sd = {f"blk.{k}": v_ for k, v_ in state_dict_numpy(blk).items()}
            return convert_croco_block(sd, "blk", cross=True)

        mask = build_cross_view_mask(v, 0)  # diagonal-only blocking
        xj = jnp.asarray(x.numpy())
        posj = jnp.asarray(pos.numpy())
        got0 = MultiViewDecoderBlock(
            num_heads=heads, mlp_ratio=4.0, rope_base=100.0, lo=0, hi=1,
            compute_dtype=jnp.float32,
        ).apply({"params": jax_params(blk1)}, xj, posj, mask)
        got_rest = MultiViewDecoderBlock(
            num_heads=heads, mlp_ratio=4.0, rope_base=100.0, lo=1, hi=None,
            compute_dtype=jnp.float32,
        ).apply({"params": jax_params(blk2)}, xj, posj, mask)
        got = jnp.concatenate([got0, got_rest], axis=1)
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)


class TestDPTParity:
    def test_dpt_regression_head(self):
        dpt_head_mod = _load_module("dpt_head", REF.parent / "encoder/heads/dpt_head.py", REF / "heads")

        class FakeNet:
            dec_depth = 12
            enc_embed_dim = 64
            dec_embed_dim = 48
            depth_mode = ("exp", -float("inf"), float("inf"))
            conf_mode = None

        torch.manual_seed(4)
        head = dpt_head_mod.create_dpt_head(FakeNet(), has_conf=False)
        head.eval()
        gh = gw = 4
        h = w = gh * 16
        feats = (
            [torch.randn(1, gh * gw, 64)]
            + [torch.randn(1, gh * gw, 48) for _ in range(12)]
        )
        with torch.no_grad():
            expected = head([f for f in feats], (h, w))["pts3d"].numpy()

        from spfsplatv2_tpu.models.heads.dpt import DPTHead
        from spfsplatv2_tpu.models.heads.postprocess import pts3d_postprocess
        from spfsplatv2_tpu.utils.ckpt_convert import convert_dpt_head

        sd = {f"h.{k}": v for k, v in state_dict_numpy(head).items()}
        params = convert_dpt_head(sd, "h", gs=False)
        model = DPTHead(out_channels=3)
        hooks = [0, 6, 9, 12]
        hooked = [jnp.asarray(feats[i].numpy()) for i in hooks]
        raw = model.apply({"params": params}, hooked, (gh, gw))
        got = np.asarray(pts3d_postprocess(raw, "exp"))
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_dpt_gs_head(self):
        gs_mod = _load_module("dpt_gs_head", REF / "heads/dpt_gs_head.py", REF / "heads")

        class FakeNet:
            dec_depth = 12
            enc_embed_dim = 64
            dec_embed_dim = 48
            depth_mode = None
            conf_mode = None

        torch.manual_seed(5)
        head = gs_mod.create_gs_dpt_head(FakeNet(), has_conf=False, out_nchan=10,
                                         postprocess_func=None)
        head.eval()
        gh = gw = 4
        h = w = gh * 16
        feats = (
            [torch.randn(1, gh * gw, 64)]
            + [torch.randn(1, gh * gw, 48) for _ in range(12)]
        )
        img = torch.randn(1, 3, h, w)
        with torch.no_grad():
            expected = head([f for f in feats], img, (h, w)).numpy()
        expected = np.transpose(expected, (0, 2, 3, 1))

        from spfsplatv2_tpu.models.heads.dpt import DPTGSHead
        from spfsplatv2_tpu.utils.ckpt_convert import convert_dpt_head

        sd = {f"h.{k}": v for k, v in state_dict_numpy(head).items()}
        params = convert_dpt_head(sd, "h", gs=True)
        model = DPTGSHead(out_channels=10)
        hooked = [jnp.asarray(feats[i].numpy()) for i in [0, 6, 9, 12]]
        got = model.apply(
            {"params": params}, hooked, (gh, gw),
            jnp.asarray(np.transpose(img.numpy(), (0, 2, 3, 1))),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


class TestPoseHeadParity:
    def test_pose_head(self):
        pose_mod = _load_module("pose_head", REF / "heads/pose_head.py", REF / "heads")

        class FakeNet:
            enc_embed_dim = 64
            dec_embed_dim = 48

        from dataclasses import dataclass

        @dataclass
        class Cfg:
            pose_init_t: bool = False
            use_homogeneous: bool = False
            concat_enc: bool = False

        torch.manual_seed(6)
        head = pose_mod.PoseHead(FakeNet(), Cfg())
        # Randomize fc layers (init sets them to zero/identity).
        torch.nn.init.normal_(head.fc_rot.weight, std=0.1)
        torch.nn.init.normal_(head.fc_t.weight, std=0.1)
        head.eval()
        tokens = torch.randn(2, 1, 48)
        with torch.no_grad():
            expected = head([tokens]).numpy()

        from spfsplatv2_tpu.models.heads.pose_head import PoseHead, PoseHeadConfig
        from spfsplatv2_tpu.utils.ckpt_convert import convert_pose_head

        sd = {f"h.{k}": v for k, v in state_dict_numpy(head).items()}
        params = convert_pose_head(sd, "h")
        model = PoseHead(PoseHeadConfig(init_t=False, use_homogeneous=False))
        got = model.apply({"params": params}, jnp.asarray(tokens.numpy()))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
