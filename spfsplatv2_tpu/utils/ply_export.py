"""Gaussian -> 3DGS-standard .ply export (no external plyfile dependency).

TPU-native port of the reference exporter
(reference: src/model/ply_export.py:77-146): recenters on the mean, rescales
so the 95th-percentile radius is 1, applies the reference's axis swizzle,
keeps only the DC SH band, and writes the binary-little-endian PLY layout
that standard 3DGS viewers expect.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from spfsplatv2_tpu.geometry.se3 import matrix_to_quaternion, quaternion_to_matrix

PROPERTIES = (
    ["x", "y", "z", "nx", "ny", "nz"]
    + [f"f_dc_{i}" for i in range(3)]
    + ["opacity"]
    + [f"scale_{i}" for i in range(3)]
    + [f"rot_{i}" for i in range(4)]
)


def export_ply(
    means: np.ndarray,       # (g, 3)
    scales: np.ndarray,      # (g, 3)
    rotations: np.ndarray,   # (g, 4) wxyz
    harmonics: np.ndarray,   # (g, 3, d_sh)
    opacities: np.ndarray,   # (g,)
    path: str | Path,
) -> None:
    import jax.numpy as jnp

    means = np.asarray(means, np.float32)
    scales = np.asarray(scales, np.float32)
    rotations = np.asarray(rotations, np.float32)
    harmonics = np.asarray(harmonics, np.float32)
    opacities = np.asarray(opacities, np.float32)

    # Shift centroid to origin, 95th-percentile radius -> 1.
    mean_center = means.mean(axis=0)
    means = means - mean_center
    scale_factor = np.quantile(np.linalg.norm(means, axis=-1), 0.95)
    scale_factor = max(float(scale_factor), 1e-8)
    means = means / scale_factor
    scales = scales / scale_factor

    # Reference axis swizzle: world rotation that flips for viewer convention.
    swizzle = np.asarray(
        [[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32
    )
    means = means @ swizzle.T
    rot_mats = np.asarray(quaternion_to_matrix(jnp.asarray(rotations)))
    rot_mats = swizzle[None] @ rot_mats
    rotations = np.asarray(matrix_to_quaternion(jnp.asarray(rot_mats)))

    g = means.shape[0]
    data = np.concatenate(
        [
            means,
            np.zeros((g, 3), np.float32),          # normals
            harmonics[:, :, 0],                    # DC band only
            # Inverse activations: 3DGS stores logit(opacity), log(scale).
            np.log(np.clip(opacities, 1e-6, 1 - 1e-6) /
                   (1 - np.clip(opacities, 1e-6, 1 - 1e-6)))[:, None],
            np.log(np.maximum(scales, 1e-10)),
            rotations,
        ],
        axis=-1,
    ).astype("<f4")

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {g}\n"
        + "".join(f"property float {p}\n" for p in PROPERTIES)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def load_ply(path: str | Path) -> dict:
    """Minimal reader for round-trip tests of our own exports."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(props))
    cols = {p: data[:, i] for i, p in enumerate(props)}
    return {
        "means": np.stack([cols["x"], cols["y"], cols["z"]], -1),
        "harmonics_dc": np.stack([cols[f"f_dc_{i}"] for i in range(3)], -1),
        "opacities": 1 / (1 + np.exp(-cols["opacity"])),
        "scales": np.exp(np.stack([cols[f"scale_{i}"] for i in range(3)], -1)),
        "rotations": np.stack([cols[f"rot_{i}"] for i in range(4)], -1),
    }
