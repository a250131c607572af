"""Chamfer distance (reference: `/root/reference/metrics_3d/chamfer_distance.py`).

The reference's NN distances come from Open3D's C++ KD-tree
(`compute_point_cloud_distance`, `chamfer_distance.py:23-24`). Here nearest-
neighbor distance has two engines:

  * `nn_distances_tpu` — tiled brute-force pairwise-min on device. Distance
    evaluation is one big `|a|^2 + |b|^2 - 2 a.b` matmul per tile, so the
    MXU does the heavy lifting; `lax.map` over query tiles bounds memory at
    `tile * M`. Exact (not approximate), preferred up to ~10^10 pairs.
  * host scipy cKDTree (parallel query, `workers=-1`) above that — the
    reference's 1M-point mesh-vs-mesh case (`metric.py:40`) is ~10^12 pairs,
    O(N log M) on the tree vs hours of brute force. Falls back to the native
    C++ brute force only if scipy is unavailable.

`ChamferDistance.update/compute/reset` keep the reference's aggregate
semantics exactly: per-instance symmetric mean ((mean(d_gt->pt) +
mean(d_pt->gt)) / 2, `chamfer_distance.py:22-26`), empty predictions score
0 (`chamfer_distance.py:17-19`), `compute` = mean over instances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hortimapping_tpu import native
from hortimapping_tpu.metrics.metric import Metrics3D

# above this many pairwise distances, the host KD-tree wins over brute
# force. On TPU the crossover is high (flops ~ 8 * pairs; 1e10 pairs ~ 1e11
# flops ~ <1 s of MXU time); on the CPU backend the same matmuls run ~100x
# slower, so the tree takes over much earlier.
_BRUTE_FORCE_MAX_PAIRS_TPU = int(1e10)
_BRUTE_FORCE_MAX_PAIRS_CPU = int(1e8)
_TILE = 4096


def _brute_force_max_pairs() -> int:
    return (
        _BRUTE_FORCE_MAX_PAIRS_TPU
        if jax.default_backend() == "tpu"
        else _BRUTE_FORCE_MAX_PAIRS_CPU
    )


@partial(jax.jit, static_argnames=("tile",))
def _nn_min_dists(a: jnp.ndarray, b: jnp.ndarray, tile: int = _TILE) -> jnp.ndarray:
    """min_j ||a_i - b_j|| for every i; a is padded to a tile multiple.

    The |a|^2 + |b|^2 - 2 a.b expansion cancels catastrophically when the
    squared norms dwarf the true squared distances, so two guards keep it
    exact-in-f32: both clouds are recentered on b's centroid (a world-frame
    fruit at ~0.6 m with sub-mm NN distances loses EVERY significant bit
    otherwise — and the min_j then selects the most-negative noise, clamped
    to 0, reading ~0.4 mm where the truth is ~5 mm), and the matmul runs at
    Precision.HIGHEST because the TPU default is bf16 (8-bit mantissa:
    same cancellation at any offset). The expansion is then used only to
    SELECT the neighbor (argmin); the returned distance is recomputed as a
    direct ||a_i - b_j*|| difference, which is cancellation-free (and
    exactly 0 for identical points). Residual matmul noise can only flip
    the argmin between candidates whose true distances differ by less than
    that noise, so the selection error is bounded by it too."""
    n = a.shape[0]
    c = jnp.mean(b, axis=0)
    a = a - c
    b = b - c
    pad = (-n) % tile
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    b_sq = jnp.sum(b * b, axis=1)

    def one_tile(at):
        ab = jnp.dot(at, b.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(at * at, axis=1)[:, None] + b_sq[None, :] - 2.0 * ab
        j = jnp.argmin(d2, axis=1)
        diff = at - b[j]
        return jnp.sum(diff * diff, axis=1)

    d2 = jax.lax.map(one_tile, a_p.reshape(-1, tile, 3)).reshape(-1)
    return jnp.sqrt(d2[:n])


def nn_distances_tpu(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each point of `a`, distance to the nearest point of `b` (device)."""
    a = jnp.asarray(np.asarray(a, np.float32))
    b = jnp.asarray(np.asarray(b, np.float32))
    return np.asarray(_nn_min_dists(a, b))


def nn_distances_kdtree(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact NN distances via scipy cKDTree (all host cores)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(b, np.float64))
    d, _ = tree.query(np.asarray(a, np.float64), k=1, workers=-1)
    return np.asarray(d, np.float32)


def nn_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Engine-selecting NN distances (device brute force vs host KD-tree)."""
    if a.shape[0] * b.shape[0] <= _brute_force_max_pairs():
        return nn_distances_tpu(a, b)
    try:
        return nn_distances_kdtree(a, b)
    except ImportError:  # pragma: no cover - scipy is in the base image
        return native.nn_distances(np.asarray(a, np.float32), np.asarray(b, np.float32))


class ChamferDistance(Metrics3D):
    def __init__(self):
        self.cd_array = []

    def update(self, gt, pt) -> None:
        if self.prediction_is_empty(pt):
            self.cd_array.append(0)
            return
        gt_pts = self.convert_to_points(gt)
        pt_pts = self.convert_to_points(pt)
        d_pt_2_gt = nn_distances(pt_pts, gt_pts)
        d_gt_2_pt = nn_distances(gt_pts, pt_pts)
        self.cd_array.append((np.mean(d_gt_2_pt) + np.mean(d_pt_2_gt)) / 2)

    def reset(self) -> None:
        self.cd_array = []

    def compute(self) -> float:
        return sum(self.cd_array) / len(self.cd_array)
