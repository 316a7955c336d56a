"""Vector drawing on images: anti-aliased points/lines + camera frustums.

TPU-native equivalent of the reference figure-drawing library
(reference: src/visualization/drawing/{lines,points,rendering,cameras,
coordinate_conversion}.py, ~600 LoC): the reference rasterizes signed
distance fields per primitive on the GPU; here the same distance-field
formulation is vectorized numpy (these draw a handful of primitives on
figure-sized canvases — host-side is the right place, no device round
trips for matplotlib-scale work).

Conventions match the reference: `x_range`/`y_range` map world/plot
coordinates onto the image; colors are float RGB in [0, 1]; images are
(h, w, 3) float arrays (the reference uses (3, h, w) — we keep the repo's
NHWC convention).
"""

from __future__ import annotations

import numpy as np

__all__ = ["draw_points", "draw_lines", "draw_cameras"]


def _to_pixel_space(xy, shape, x_range, y_range):
    """Map plot coordinates to pixel coordinates (reference
    coordinate_conversion.py:12-44)."""
    h, w = shape
    xy = np.asarray(xy, np.float32)
    if x_range is None:
        return xy
    x0, x1 = x_range
    y0, y1 = y_range
    px = (xy[..., 0] - x0) / max(x1 - x0, 1e-12) * w
    py = (xy[..., 1] - y0) / max(y1 - y0, 1e-12) * h
    return np.stack([px, py], -1)


def _composite_sdf(image, alpha, color):
    """alpha (n, h, w), color (n, 3) -> over-composite onto image."""
    out = image.astype(np.float32).copy()
    for a, c in zip(alpha, color):
        out = out * (1.0 - a[..., None]) + c[None, None, :] * a[..., None]
    return out


def _pixel_grid(h, w):
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32) + 0.5,
        np.arange(w, dtype=np.float32) + 0.5,
        indexing="ij",
    )
    return xx, yy


def draw_points(
    image: np.ndarray,          # (h, w, 3) float
    points: np.ndarray,         # (n, 2) xy
    color=(1.0, 1.0, 1.0),
    radius: float = 1.0,
    inner_radius: float = 0.0,
    x_range=None,
    y_range=None,
) -> np.ndarray:
    """Anti-aliased discs (reference points.py:11-59)."""
    h, w, _ = image.shape
    points = _to_pixel_space(points, (h, w), x_range, y_range)
    points = points.reshape(-1, 2)
    color = np.broadcast_to(np.asarray(color, np.float32), (len(points), 3))
    xx, yy = _pixel_grid(h, w)
    d = np.hypot(
        xx[None] - points[:, 0, None, None], yy[None] - points[:, 1, None, None]
    )
    # 1px-wide smoothstep edge, ring support via inner_radius.
    alpha = np.clip(radius + 0.5 - d, 0.0, 1.0)
    if inner_radius > 0:
        alpha *= np.clip(d - inner_radius + 0.5, 0.0, 1.0)
    return _composite_sdf(image, alpha, color)


def draw_lines(
    image: np.ndarray,          # (h, w, 3) float
    start: np.ndarray,          # (n, 2) xy
    end: np.ndarray,            # (n, 2) xy
    color=(1.0, 1.0, 1.0),
    width: float = 1.0,
    x_range=None,
    y_range=None,
) -> np.ndarray:
    """Anti-aliased segments via point-to-segment distance fields
    (reference lines.py:12-83)."""
    h, w, _ = image.shape
    start = _to_pixel_space(start, (h, w), x_range, y_range).reshape(-1, 2)
    end = _to_pixel_space(end, (h, w), x_range, y_range).reshape(-1, 2)
    color = np.broadcast_to(np.asarray(color, np.float32), (len(start), 3))
    xx, yy = _pixel_grid(h, w)
    p = np.stack([xx, yy], -1)[None]              # (1, h, w, 2)
    a = start[:, None, None, :]                   # (n, 1, 1, 2)
    b = end[:, None, None, :]
    ab = b - a
    denom = np.maximum((ab * ab).sum(-1), 1e-12)
    t = np.clip(((p - a) * ab).sum(-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = np.linalg.norm(p - closest, axis=-1)      # (n, h, w)
    alpha = np.clip(0.5 * width + 0.5 - d, 0.0, 1.0)
    return _composite_sdf(image, alpha, color)


def _unproject_frustum_corners(extrinsics, intrinsics, depth):
    """World-space positions of the 4 image corners at `depth`
    (reference cameras.py:139-168)."""
    corners = np.asarray(
        [[0, 0], [1, 0], [1, 1], [0, 1]], np.float32
    )  # normalized image xy
    k_inv = np.linalg.inv(intrinsics)             # (b, 3, 3)
    homo = np.concatenate([corners, np.ones((4, 1), np.float32)], -1)
    rays = np.einsum("bij,cj->bci", k_inv, homo)  # (b, 4, 3)
    rays = rays / rays[..., 2:3]
    pts_cam = rays * depth                        # z = depth plane
    r = extrinsics[..., None, :3, :3]
    t = extrinsics[..., None, :3, 3]
    return np.einsum("bcij,bcj->bci", np.broadcast_to(r, (*pts_cam.shape, 3)),
                     pts_cam) + t


def draw_cameras(
    resolution: int,
    extrinsics: np.ndarray,     # (b, 4, 4) c2w
    intrinsics: np.ndarray,     # (b, 3, 3) normalized
    color: np.ndarray,          # (b, 3)
    frustum_scale: float = 0.05,
    margin: float = 0.1,
) -> np.ndarray:
    """Draw camera frustum wireframes projected onto the three axis-aligned
    planes (reference cameras.py:15-137).  Returns (3, res, res, 3)."""
    extrinsics = np.asarray(extrinsics, np.float32)
    intrinsics = np.asarray(intrinsics, np.float32)
    color = np.broadcast_to(
        np.asarray(color, np.float32), (extrinsics.shape[0], 3)
    )
    origins = extrinsics[:, :3, 3]

    minima = origins.min(0)
    maxima = origins.max(0)
    span = float(max((maxima - minima).max(), 1e-3))
    # Equal aspect AABB with margin (reference compute_equal_aabb_with_margin).
    center = 0.5 * (minima + maxima)
    half = span * (0.5 + margin)
    minima = center - half
    maxima = center + half

    depth = span * frustum_scale
    corners = _unproject_frustum_corners(extrinsics, intrinsics, depth)

    views = []
    for axis in range(3):
        ax_x = (axis + 1) % 3
        ax_y = (axis + 2) % 3

        def project(p, ax_x=ax_x, ax_y=ax_y):
            return np.stack([p[..., ax_x], p[..., ax_y]], -1)

        image = np.zeros((resolution, resolution, 3), np.float32)
        x_range = (minima[ax_x], maxima[ax_x])
        y_range = (minima[ax_y], maxima[ax_y])

        starts, ends, cols = [], [], []
        for b in range(extrinsics.shape[0]):
            c2 = project(corners[b])               # (4, 2)
            o2 = project(origins[b])               # (2,)
            # frustum plane edges
            starts.append(c2)
            ends.append(np.roll(c2, 1, axis=0))
            # origin -> corners
            starts.append(np.broadcast_to(o2, (4, 2)))
            ends.append(c2)
            cols.append(np.broadcast_to(color[b], (8, 3)))
        image = draw_lines(
            image,
            np.concatenate(starts), np.concatenate(ends),
            np.concatenate(cols), width=1.5,
            x_range=x_range, y_range=y_range,
        )
        views.append(image)
    return np.stack(views)
