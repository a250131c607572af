"""Native (C++) runtime kernels, loaded via ctypes with numpy fallbacks.

Builds `libhorti_native.so` from `src/horti_native.cpp` with g++ on first
use (cached next to the source, rebuilt when the source is newer). Every
entry point has a pure-numpy fallback so the package works even without a
toolchain — the native path is just faster.

Provides host-side equivalents of what the reference pulled from
skimage/Open3D C++:
  marching_tetrahedra  — iso-surface extraction (ref: `utils.py:565-588`)
  marching_cubes       — classic cube-cell MC, asymptotic-decider ambiguity
                         handling (ref meshes with skimage MC, `utils.py:576`)
  dbscan               — largest-cluster filtering (ref: `utils.py:407-417`)
  nn_distances         — point-cloud NN distances (ref: `metrics_3d/*`)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "horti_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libhorti_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.horti_marching_tetrahedra.restype = ctypes.c_int
            lib.horti_marching_tetrahedra.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.horti_marching_cubes.restype = ctypes.c_int
            lib.horti_marching_cubes.argtypes = lib.horti_marching_tetrahedra.argtypes
            lib.horti_free.argtypes = [ctypes.c_void_p]
            lib.horti_dbscan.restype = ctypes.c_int
            lib.horti_dbscan.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.horti_nn_distances.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def have_native() -> bool:
    return _load() is not None


def _iso_surface_native(fn, grid, iso, spacing):
    nx, ny, nz = grid.shape
    pv = ctypes.POINTER(ctypes.c_float)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = fn(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(iso), ctypes.c_float(spacing),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf), ctypes.byref(nf),
    )
    if rc != 0:
        raise MemoryError("iso-surface allocation failed")
    try:
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(pf, shape=(nf.value, 3)).copy() if nf.value else np.zeros((0, 3), np.int32)
    finally:
        lib = _load()
        lib.horti_free(pv)
        lib.horti_free(pf)
    return verts, faces


def marching_tetrahedra(
    grid: np.ndarray, iso: float = 0.0, spacing: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a (nx, ny, nz) scalar field.

    Returns (verts (V, 3) float32 in index*spacing coordinates,
    faces (F, 3) int32). Watertight by construction (consistent 6-tet cube
    decomposition, welded vertices).
    """
    grid = np.ascontiguousarray(grid, np.float32)
    lib = _load()
    if lib is None:
        return _marching_tetrahedra_numpy(grid, iso, spacing)
    return _iso_surface_native(lib.horti_marching_tetrahedra, grid, iso, spacing)


def marching_cubes(
    grid: np.ndarray, iso: float = 0.0, spacing: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Classic cube-cell marching cubes (the reference meshes with skimage's
    MC, `wild_completion/utils.py:576-578`).

    Table-free construction: welded vertex per crossing cube edge (identical
    interpolation to :func:`marching_tetrahedra`, so vertex positions are the
    classic MC ones), marching-squares pairing on each face with the bilinear
    asymptotic decider on ambiguous faces, per-cube polygon loops fan-
    triangulated with outward-consistent winding (normals toward +SDF).
    """
    grid = np.ascontiguousarray(grid, np.float32)
    lib = _load()
    if lib is None:
        return _marching_cubes_numpy(grid, iso, spacing)
    return _iso_surface_native(lib.horti_marching_cubes, grid, iso, spacing)


def dbscan(points: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    """DBSCAN labels (-1 = noise). Open3D `cluster_dbscan` semantics."""
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    lib = _load()
    if lib is None:
        return _dbscan_scipy(points, eps, min_points)
    labels = np.empty(n, np.int32)
    lib.horti_dbscan(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(eps), min_points,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels


def nn_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each point of `a`, distance to nearest point of `b` (host path)."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    # scipy's cKDTree beats brute force beyond small sizes
    if a.shape[0] * b.shape[0] > 1_000_000 or _load() is None:
        from scipy.spatial import cKDTree

        return cKDTree(b).query(a, k=1)[0].astype(np.float32)
    out = np.empty(a.shape[0], np.float32)
    _load().horti_nn_distances(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


# ---------------------------------------------------------------------------
# numpy fallbacks
# ---------------------------------------------------------------------------

_CORNER = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]]
)
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
     [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]]
)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])


def _marching_tetrahedra_numpy(grid, iso, spacing):
    """Slow but exact mirror of the C++ kernel (python loop over crossing tets)."""
    nx, ny, nz = grid.shape
    weld = {}
    verts = []
    faces = []

    def gid(i, j, k):
        return (i * ny + j) * nz + k

    def coord(g):
        return np.array([g // (ny * nz), (g // nz) % ny, g % nz], float)

    def edge_vertex(ga, gb):
        key = (ga, gb) if ga < gb else (gb, ga)
        if key in weld:
            return weld[key]
        va = grid.flat[ga]
        vb = grid.flat[gb]
        t = np.clip((iso - va) / (vb - va), 0.0, 1.0)
        p = (coord(ga) + t * (coord(gb) - coord(ga))) * spacing
        idx = len(verts)
        verts.append(p)
        weld[key] = idx
        return idx

    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                cg = [gid(i + c[0], j + c[1], k + c[2]) for c in _CORNER]
                cv = [grid.flat[g] for g in cg]
                for T in _TETS:
                    inside = sum(1 << c for c in range(4) if cv[T[c]] < iso)
                    if inside in (0, 15):
                        continue
                    ev, ep = [], []
                    for a, b in _TET_EDGES:
                        if ((inside >> a) & 1) != ((inside >> b) & 1):
                            ev.append(edge_vertex(cg[T[a]], cg[T[b]]))
                            ep.append((a, b))
                    if len(ev) == 3:
                        faces.append(ev)
                    else:
                        share = lambda x, y: bool(set(ep[x]) & set(ep[y]))
                        op = 1 if not share(0, 1) else (2 if not share(0, 2) else 3)
                        adj = [e for e in (1, 2, 3) if e != op]
                        faces.append([ev[0], ev[adj[0]], ev[op]])
                        faces.append([ev[0], ev[op], ev[adj[1]]])
    v = np.asarray(verts, np.float32).reshape(-1, 3)
    f = np.asarray(faces, np.int32).reshape(-1, 3)
    return v, f


# cube edges / faces for the classic-MC mirror (same tables as the C++)
_CEDGE = np.array(
    [[0, 1], [2, 3], [4, 5], [6, 7],
     [0, 2], [1, 3], [4, 6], [5, 7],
     [0, 4], [1, 5], [2, 6], [3, 7]]
)
_FACES = np.array(
    [[0, 2, 6, 4], [1, 3, 7, 5],
     [0, 1, 5, 4], [2, 3, 7, 6],
     [0, 1, 3, 2], [4, 5, 7, 6]]
)
_FACE_EDGE = np.array(
    [[{tuple(sorted(e)): i for i, e in enumerate(map(tuple, _CEDGE))}[
        tuple(sorted((f[s], f[(s + 1) % 4])))] for s in range(4)]
     for f in _FACES]
)


def _marching_cubes_numpy(grid, iso, spacing):
    """Exact python mirror of the C++ classic-MC kernel (and its test oracle)."""
    nx, ny, nz = grid.shape
    weld = {}
    verts = []
    faces = []

    def gid(i, j, k):
        return (i * ny + j) * nz + k

    def coord(g):
        return np.array([g // (ny * nz), (g // nz) % ny, g % nz], float)

    def edge_vertex(ga, gb):
        key = (ga, gb) if ga < gb else (gb, ga)
        if key in weld:
            return weld[key]
        va, vb = grid.flat[ga], grid.flat[gb]
        t = np.clip((iso - va) / (vb - va), 0.0, 1.0)
        p = (coord(ga) + t * (coord(gb) - coord(ga))) * spacing
        idx = len(verts)
        verts.append(p)
        weld[key] = idx
        return idx

    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                cg = [gid(i + c[0], j + c[1], k + c[2]) for c in _CORNER]
                cv = [grid.flat[g] for g in cg]
                inside = [v < iso for v in cv]
                if not any(inside) or all(inside):
                    continue
                evert = [
                    edge_vertex(cg[a], cg[b]) if inside[a] != inside[b] else -1
                    for a, b in _CEDGE
                ]
                adj = {e: [] for e in range(12) if evert[e] >= 0}
                on_amb_face = [False] * 12
                for f in range(6):
                    q = _FACES[f]
                    xs = [s for s in range(4)
                          if inside[q[s]] != inside[q[(s + 1) % 4]]]
                    if len(xs) == 2:
                        pairs = [(xs[0], xs[1])]
                    elif len(xs) == 4:
                        for s in range(4):
                            on_amb_face[_FACE_EDGE[f][s]] = True
                        v0, v1, v2, v3 = (cv[c] for c in q)
                        denom = v0 + v2 - v1 - v3
                        saddle_inside = (
                            denom != 0.0 and (v0 * v2 - v1 * v3) / denom < iso)
                        pairs = ([(0, 1), (2, 3)]
                                 if saddle_inside == inside[q[0]]
                                 else [(3, 0), (1, 2)])
                    else:
                        continue
                    for sa, sb in pairs:
                        ea, eb = _FACE_EDGE[f][sa], _FACE_EDGE[f][sb]
                        adj[ea].append(eb)
                        adj[eb].append(ea)
                used = set()
                for e0 in range(12):
                    if evert[e0] < 0 or e0 in used or len(adj.get(e0, ())) != 2:
                        continue
                    loop, prev, cur = [], -1, e0
                    while True:
                        loop.append(cur)
                        used.add(cur)
                        nxt = adj[cur][1] if adj[cur][0] == prev else adj[cur][0]
                        prev, cur = cur, nxt
                        if cur == e0 or cur in used or len(loop) >= 12:
                            break
                    if len(loop) < 3:
                        continue
                    pts = np.array([verts[evert[e]] for e in loop])
                    nrm = np.zeros(3)
                    for m in range(len(loop)):
                        pa, pb = pts[m], pts[(m + 1) % len(loop)]
                        nrm += [(pa[1] - pb[1]) * (pa[2] + pb[2]),
                                (pa[2] - pb[2]) * (pa[0] + pb[0]),
                                (pa[0] - pb[0]) * (pa[1] + pb[1])]
                    out_dir = np.zeros(3)
                    for e in loop:
                        a, b = _CEDGE[e]
                        if inside[b]:
                            a, b = b, a
                        out_dir += _CORNER[b] - _CORNER[a]
                    flip = float(nrm @ out_dir) < 0.0
                    n = len(loop)
                    # fan apex must avoid ambiguous (4-crossing) faces — see
                    # the C++ kernel comment; centroid fallback otherwise
                    apex = 0 if n == 3 else next(
                        (m for m in range(n) if not on_amb_face[loop[m]]), -1)
                    if apex >= 0:
                        for m in range(1, n - 1):
                            ia = (apex + (m + 1 if flip else m)) % n
                            ib = (apex + (m if flip else m + 1)) % n
                            faces.append([evert[loop[apex]],
                                          evert[loop[ia]], evert[loop[ib]]])
                    else:
                        cidx = len(verts)
                        verts.append(pts.mean(axis=0))
                        for m in range(n):
                            ia = (m + 1) % n if flip else m
                            ib = m if flip else (m + 1) % n
                            faces.append([cidx, evert[loop[ia]],
                                          evert[loop[ib]]])
    v = np.asarray(verts, np.float32).reshape(-1, 3)
    f = np.asarray(faces, np.int32).reshape(-1, 3)
    return v, f


def _dbscan_scipy(points, eps, min_points):
    from scipy.spatial import cKDTree

    n = points.shape[0]
    tree = cKDTree(points)
    neigh = tree.query_ball_point(points, eps)
    labels = np.full(n, -1, np.int32)
    visited = np.zeros(n, bool)
    cluster = -1
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        if len(neigh[i]) < min_points:
            continue
        cluster += 1
        labels[i] = cluster
        queue = list(neigh[i])
        while queue:
            j = queue.pop()
            if labels[j] == -1:
                labels[j] = cluster
            if visited[j]:
                continue
            visited[j] = True
            labels[j] = cluster
            if len(neigh[j]) >= min_points:
                queue.extend(neigh[j])
    return labels
