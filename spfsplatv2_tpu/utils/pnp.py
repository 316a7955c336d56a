"""PnP-from-pointmap pose estimation (native C++ solver + cv2 fallback).

TPU-native replacement for the reference's OpenCV PnP baseline used by the
pose evaluator (reference: src/misc/cam_utils.py:162-253,
src/evaluation/pose_evaluator.py:89-103): given a predicted per-pixel
pointmap and opacities, recover the camera pose from 3D->pixel
correspondences via RANSAC + refinement.

Backends, in order of preference:
  1. `native/libpnp.so` — our C++ DLT-RANSAC + Gauss-Newton solver
     (auto-built from native/pnp.cc on first use),
  2. OpenCV `solvePnPRansac` (SQPNP) when cv2 is importable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    so = _NATIVE_DIR / "libpnp.so"
    if not so.exists() and (_NATIVE_DIR / "pnp.cc").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True,
            )
        except Exception:
            return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.pnp_ransac.restype = ctypes.c_int
    lib.pnp_ransac.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def pnp_ransac(
    pts3d: np.ndarray,
    pixels: np.ndarray,
    k_px: np.ndarray,
    iterations: int = 100,
    reprojection_error: float = 5.0,
    seed: int = 0,
    backend: str = "auto",
):
    """Solve w2c pose from (n, 3) world points and (n, 2) pixel coords.

    Returns (success, c2w (4, 4) float32).
    """
    pts3d = np.ascontiguousarray(pts3d, np.float64)
    pixels = np.ascontiguousarray(pixels, np.float64)
    n = pts3d.shape[0]
    if n < 6:
        return False, np.eye(4, dtype=np.float32)

    fx, fy = k_px[0, 0], k_px[1, 1]
    cx, cy = k_px[0, 2], k_px[1, 2]

    lib = _load_native() if backend in ("auto", "native") else None
    if lib is not None and backend != "cv2":
        uv = np.stack(
            [(pixels[:, 0] - cx) / fx, (pixels[:, 1] - cy) / fy], axis=-1
        )
        uv = np.ascontiguousarray(uv, np.float64)
        w2c = np.zeros((4, 4), np.float64)
        inliers = np.zeros((n,), np.uint8)
        # Normalized-coordinate threshold from the pixel threshold.
        thresh = reprojection_error / float((abs(fx) + abs(fy)) / 2)
        ok = lib.pnp_ransac(
            pts3d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            uv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, iterations, thresh, seed,
            w2c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            inliers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if ok:
            return True, np.linalg.inv(w2c).astype(np.float32)
        if backend == "native":
            return False, np.eye(4, dtype=np.float32)

    try:
        import cv2

        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            pts3d.astype(np.float32), pixels.astype(np.float32),
            k_px.astype(np.float32), None,
            iterationsCount=iterations, reprojectionError=reprojection_error,
            flags=cv2.SOLVEPNP_SQPNP,
        )
        if not ok:
            return False, np.eye(4, dtype=np.float32)
        rot = cv2.Rodrigues(rvec)[0]
        w2c = np.eye(4)
        w2c[:3, :3] = rot
        w2c[:3, 3] = tvec[:, 0]
        return True, np.linalg.inv(w2c).astype(np.float32)
    except Exception:
        return False, np.eye(4, dtype=np.float32)


def pnp_pose_from_pointmap(
    pts3d: np.ndarray,        # (h, w, 3)
    opacity: np.ndarray,      # (h, w)
    k_norm: np.ndarray,       # (3, 3) normalized intrinsics
    opacity_threshold: float = 0.3,
    backend: str = "auto",
) -> np.ndarray:
    """Reference get_pnp_pose surface: pointmap + opacity -> c2w (4, 4)."""
    h, w = opacity.shape
    k_px = k_norm.copy()
    k_px[0, :] *= w
    k_px[1, :] *= h
    ys, xs = np.mgrid[:h, :w]
    mask = opacity > opacity_threshold
    if mask.sum() < 6:
        return np.eye(4, dtype=np.float32)
    pts = pts3d[mask].reshape(-1, 3)
    pix = np.stack([xs[mask], ys[mask]], axis=-1).astype(np.float64)
    ok, c2w = pnp_ransac(pts, pix, k_px, backend=backend)
    return c2w if ok else np.eye(4, dtype=np.float32)
