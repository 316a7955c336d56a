"""In-the-wild demo: two arbitrary photos -> Gaussians -> video + PLY.

TPU-native port of the reference demo (reference:
src/paper/validate_in_the_wild.py:1-544): loads two images, center-crops and
resizes to the model resolution, assumes unit-focal intrinsics
(process_image_input, validate_in_the_wild.py:68-93), runs the pose-free
encoder, exports a 3DGS PLY and an interpolated novel-view video.

Usage:
    python -m spfsplatv2_tpu.demo img1.jpg img2.jpg --checkpoint ckpt_dir \
        --output outputs/demo [--image-size 256]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_and_prepare(path: str, image_size: int) -> np.ndarray:
    from spfsplatv2_tpu.data.shims import rescale_image

    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    h, w = img.shape[:2]
    side = min(h, w)
    top, left = (h - side) // 2, (w - side) // 2
    img = img[top: top + side, left: left + side]
    return rescale_image(img, (image_size, image_size))


def run_demo(
    image_paths: list[str],
    checkpoint: str | None,
    output: str,
    image_size: int = 256,
    focal: float = 1.0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from spfsplatv2_tpu.evaluation.video import render_interpolation_video
    from spfsplatv2_tpu.models.encoder import SPFSplatV2Config, SPFSplatV2Encoder
    from spfsplatv2_tpu.utils.ply_export import export_ply

    out_dir = Path(output)
    out_dir.mkdir(parents=True, exist_ok=True)

    images = np.stack([load_and_prepare(p, image_size) for p in image_paths])
    v = images.shape[0]
    # Unit-focal normalized intrinsics, centered principal point.
    k = np.asarray(
        [[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1.0]], np.float32
    )
    intrinsics = np.tile(k, (v, 1, 1))

    encoder = SPFSplatV2Encoder(SPFSplatV2Config())
    ctx_img = jnp.asarray(images)[None]
    ctx_k = jnp.asarray(intrinsics)[None]
    if checkpoint:
        from spfsplatv2_tpu.training.loop import load_checkpoint

        restored = load_checkpoint(checkpoint)
        params = restored.get("params", restored)
        if "params" not in params:
            params = {"params": params}
    else:
        print("WARNING: no checkpoint given; using random initialization")
        params = encoder.init(jax.random.PRNGKey(0), ctx_img, ctx_k)

    out = encoder.apply(params, ctx_img, ctx_k)
    g = out["gaussians"]
    export_ply(
        np.asarray(g.means[0]), np.asarray(g.scales[0]),
        np.asarray(g.rotations[0]), np.asarray(g.harmonics[0]),
        np.asarray(g.opacities[0]), out_dir / "gaussians.ply",
    )

    context = {
        "image": images,
        "intrinsics": intrinsics,
        "near": np.full((v,), 0.5, np.float32),
        "far": np.full((v,), 100.0, np.float32),
    }
    render_interpolation_video(
        encoder, params, context, (image_size, image_size),
        output_path=out_dir / "interpolation",
    )
    print(f"wrote {out_dir}/gaussians.ply and {out_dir}/interpolation.gif")
    return {"poses": np.asarray(out["extrinsics_c"][0])}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("images", nargs="+")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--output", default="outputs/demo")
    parser.add_argument("--image-size", type=int, default=256)
    args = parser.parse_args(argv)
    run_demo(args.images, args.checkpoint, args.output, args.image_size)


if __name__ == "__main__":
    main()
