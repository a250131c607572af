"""RGB-D preprocessing: depth filtering and masked back-projection.

Reference: `dataloader.py:50-71` (bilateral filter d=3, sigma 15, then
erosion with an 11x11 rect kernel) and `rgbd_to_pcd`
(`dataloader.py:107-127`, Open3D `create_from_rgbd_image` with
depth_trunc=1.0). The back-projection is a vectorized numpy unprojection —
there is no per-pixel loop and no Open3D dependency. OpenCV is used for the
filters when available, with exact-semantics numpy fallbacks otherwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from hortimapping_tpu.data.mesh import PointCloud

try:
    import cv2  # noqa: F401

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def bilateral_filter(depth: np.ndarray, d: int = 3, sigma_color: float = 15.0,
                     sigma_space: float = 15.0) -> np.ndarray:
    """cv2.bilateralFilter(depth, 3, 15, 15) (`dataloader.py:68`)."""
    depth = np.ascontiguousarray(depth, np.float32)
    if _HAVE_CV2:
        return cv2.bilateralFilter(depth, d, sigma_color, sigma_space)
    return _bilateral_numpy(depth, d, sigma_color, sigma_space)


def _bilateral_numpy(depth, d, sigma_color, sigma_space):
    r = d // 2
    H, W = depth.shape
    pad = np.pad(depth, r, mode="edge")
    num = np.zeros_like(depth, np.float64)
    den = np.zeros_like(depth, np.float64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = pad[r + dy : r + dy + H, r + dx : r + dx + W]
            w = np.exp(
                -(dy * dy + dx * dx) / (2.0 * sigma_space * sigma_space)
                - (shifted - depth) ** 2 / (2.0 * sigma_color * sigma_color)
            )
            num += w * shifted
            den += w
    return (num / den).astype(np.float32)


def erode(img: np.ndarray, erosion_size: int = 5) -> np.ndarray:
    """cv2.erode with a (2*size+1)^2 MORPH_RECT element (`dataloader.py:50-53,71`)."""
    if _HAVE_CV2:
        k = 2 * erosion_size + 1
        element = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k), (erosion_size, erosion_size))
        return cv2.erode(img, element)
    from scipy.ndimage import grey_erosion

    k = 2 * erosion_size + 1
    return grey_erosion(img, size=(k, k)).astype(img.dtype)


def preprocess_depth(depth: np.ndarray, erosion_size: int = 5) -> np.ndarray:
    """Bilateral filter + rect erosion, the challenge loader's depth path."""
    return erode(bilateral_filter(depth), erosion_size)


def backproject(
    depth: np.ndarray,                  # (H, W) metric depth
    K: np.ndarray,                      # (3, 3)
    pose: Optional[np.ndarray] = None,  # (4, 4) camera-to-world
    rgb: Optional[np.ndarray] = None,   # (H, W, 3) uint8
    mask: Optional[np.ndarray] = None,  # (H, W) bool/uint8, pixels to keep
    depth_trunc: float = 1.0,
) -> PointCloud:
    """Masked RGB-D back-projection to a world-frame point cloud.

    Matches Open3D `create_from_rgbd_image(depth * mask, depth_scale=1,
    depth_trunc=1.0)` + extrinsic transform (`dataloader.py:107-127`):
    pixels with depth <= 0, depth >= depth_trunc, or outside the mask are
    dropped.
    """
    H, W = depth.shape
    dm = depth.astype(np.float64)
    if mask is not None:
        dm = dm * (np.asarray(mask) != 0)
    keep = (dm > 0.0) & (dm < depth_trunc)
    v, u = np.nonzero(keep)
    z = dm[v, u]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1)
    if pose is not None:
        pts = pts @ np.asarray(pose)[:3, :3].T + np.asarray(pose)[:3, 3]
    colors = None
    if rgb is not None:
        colors = rgb[v, u].astype(np.float64) / 255.0
    return PointCloud(pts.astype(np.float32), colors)
