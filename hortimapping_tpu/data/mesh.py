"""Lightweight host-side mesh / point-cloud containers.

The reference leans on Open3D's C++ geometry types throughout; this build
keeps host geometry as plain numpy arrays with a few jit-friendly helpers.
Only the operations the pipeline actually needs are provided (uniform area
sampling, AABB, crop, transform, voxel downsample) — heavy per-point math
runs on TPU (see ops/).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class PointCloud:
    points: np.ndarray                       # (N, 3) float
    colors: Optional[np.ndarray] = None      # (N, 3) float in [0, 1]

    def __len__(self) -> int:
        return self.points.shape[0]

    def select(self, idx) -> "PointCloud":
        return PointCloud(
            self.points[idx],
            self.colors[idx] if self.colors is not None else None,
        )

    def aabb(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.points.min(0), self.points.max(0)

    def crop(self, box_min, box_max) -> "PointCloud":
        m = np.all((self.points >= np.asarray(box_min)) & (self.points <= np.asarray(box_max)), axis=1)
        return self.select(m)

    def transform(self, T: np.ndarray) -> "PointCloud":
        p = self.points @ T[:3, :3].T + T[:3, 3]
        return PointCloud(p, self.colors)

    def voxel_down_sample(self, voxel_size: float) -> "PointCloud":
        """Average points per occupied voxel (Open3D `voxel_down_sample` semantics)."""
        keys = np.floor(self.points / voxel_size).astype(np.int64)
        _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
        acc = np.zeros((counts.shape[0], 3), np.float64)
        np.add.at(acc, inv, self.points)
        pts = (acc / counts[:, None]).astype(self.points.dtype)
        colors = None
        if self.colors is not None:
            cacc = np.zeros((counts.shape[0], 3), np.float64)
            np.add.at(cacc, inv, self.colors)
            colors = (cacc / counts[:, None]).astype(self.colors.dtype)
        return PointCloud(pts, colors)

    def __add__(self, other: "PointCloud") -> "PointCloud":
        pts = np.concatenate([self.points, other.points], 0)
        colors = None
        if self.colors is not None and other.colors is not None:
            colors = np.concatenate([self.colors, other.colors], 0)
        return PointCloud(pts, colors)


@dataclasses.dataclass
class TriangleMesh:
    vertices: np.ndarray                     # (V, 3) float
    faces: np.ndarray                        # (F, 3) int
    vertex_colors: Optional[np.ndarray] = None

    def transform(self, T: np.ndarray) -> "TriangleMesh":
        v = self.vertices @ T[:3, :3].T + T[:3, 3]
        return TriangleMesh(v, self.faces, self.vertex_colors)

    def triangle_areas(self) -> np.ndarray:
        v = self.vertices
        a, b, c = v[self.faces[:, 0]], v[self.faces[:, 1]], v[self.faces[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)

    def surface_area(self) -> float:
        return float(self.triangle_areas().sum())

    def vertex_normals(self) -> np.ndarray:
        v, f = self.vertices, self.faces
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        vn = np.zeros_like(v)
        for k in range(3):
            np.add.at(vn, f[:, k], fn)
        norm = np.linalg.norm(vn, axis=1, keepdims=True)
        return vn / np.where(norm == 0, 1.0, norm)

    def sample_points_uniformly(self, n: int, seed: int = 0) -> PointCloud:
        """Area-weighted uniform surface sampling (Open3D
        `sample_points_uniformly` semantics; ref usage `utils.py:402`,
        `metric.py:40`)."""
        areas = self.triangle_areas()
        total = areas.sum()
        if total <= 0 or self.faces.shape[0] == 0:
            return PointCloud(np.zeros((0, 3), self.vertices.dtype))
        rng = np.random.default_rng(seed)
        tri = rng.choice(self.faces.shape[0], size=n, p=areas / total)
        u = rng.random(n)
        v_ = rng.random(n)
        flip = u + v_ > 1.0
        u[flip], v_[flip] = 1.0 - u[flip], 1.0 - v_[flip]
        f = self.faces[tri]
        a, b, c = self.vertices[f[:, 0]], self.vertices[f[:, 1]], self.vertices[f[:, 2]]
        pts = a + u[:, None] * (b - a) + v_[:, None] * (c - a)
        colors = None
        if self.vertex_colors is not None:
            ca, cb, cc = (self.vertex_colors[f[:, 0]], self.vertex_colors[f[:, 1]],
                          self.vertex_colors[f[:, 2]])
            colors = ca + u[:, None] * (cb - ca) + v_[:, None] * (cc - ca)
        return PointCloud(pts.astype(np.float32), colors)

    def paint_uniform_color(self, color) -> "TriangleMesh":
        c = np.tile(np.asarray(color, np.float64)[None, :], (self.vertices.shape[0], 1))
        return TriangleMesh(self.vertices, self.faces, c)
