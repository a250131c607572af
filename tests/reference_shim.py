"""Import the ACTUAL reference implementation from /root/reference on CPU.

The reference hard-wires `.cuda()` calls (`loss.py:33,55,83,...`,
`utils.py:162,204,...`) and imports libraries absent from this environment
(open3d, skimage, addict, plyfile). This shim stubs the missing modules and
no-ops `.cuda()` so the genuine reference functions — not clean-room mirrors
— run on CPU torch for differential testing (SURVEY.md §7: "recorded-fixture
differential test against PyTorch at every intermediate").

Only numeric functions are exercised, on fixtures we construct ourselves.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"
_installed = False


def _stub_module(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_open3d_geometry(o3d: types.ModuleType) -> None:
    """Numpy-backed Open3D stubs for the APIs `/root/reference/dataloader.py`
    calls, faithful to the documented Open3D semantics (implemented FROM the
    Open3D docs, deliberately NOT from `hortimapping_tpu/data/rgbd.py`, so
    the loader differential test is not circular):

    - `RGBDImage.create_from_color_and_depth(color, depth, depth_scale,
      depth_trunc, convert_rgb_to_intensity)`: depth is converted to float,
      divided by `depth_scale`, and values >= `depth_trunc` are set to 0
      (invalid).
    - `PointCloud.create_from_rgbd_image(rgbd, intrinsic, extrinsic)`: for
      every pixel (u, v) with depth d > 0, z = d, x = (u - cx) * z / fx,
      y = (v - cy) * z / fy in the camera frame (row-major pixel scan), the
      cloud is transformed by extrinsic^-1 (extrinsic maps world->camera),
      and uint8 colors are scaled to [0, 1].
    - `io.read_point_cloud`: minimal PLY vertex reader (binary little-endian
      or ascii, x/y/z [+ red/green/blue]) written from the PLY spec.
    """
    if getattr(o3d, "_horti_geometry_installed", False):  # pragma: no cover
        return
    o3d._horti_geometry_installed = True

    class _PointCloud:
        def __init__(self, points=None, colors=None):
            self.points = np.zeros((0, 3), np.float64) if points is None else points
            self.colors = np.zeros((0, 3), np.float64) if colors is None else colors

        def __iadd__(self, other):
            self.points = np.concatenate([np.asarray(self.points),
                                          np.asarray(other.points)], axis=0)
            self.colors = np.concatenate([np.asarray(self.colors),
                                          np.asarray(other.colors)], axis=0)
            return self

        def __add__(self, other):
            out = _PointCloud(np.asarray(self.points), np.asarray(self.colors))
            out += other
            return out

        @staticmethod
        def create_from_rgbd_image(rgbd, intrinsic, extrinsic=None):
            depth = np.asarray(rgbd.depth, np.float64)
            color = np.asarray(rgbd.color)
            fx, fy = intrinsic.fx, intrinsic.fy
            cx, cy = intrinsic.cx, intrinsic.cy
            v, u = np.nonzero(depth > 0.0)   # row-major scan order
            z = depth[v, u]
            pts_cam = np.stack([(u - cx) * z / fx, (v - cy) * z / fy, z], -1)
            if extrinsic is not None:
                T_cam_to_world = np.linalg.inv(np.asarray(extrinsic, np.float64))
                pts = pts_cam @ T_cam_to_world[:3, :3].T + T_cam_to_world[:3, 3]
            else:
                pts = pts_cam
            cols = color[v, u].astype(np.float64)
            if color.dtype == np.uint8:
                cols = cols / 255.0
            return _PointCloud(pts, cols)

    class _Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

        def __array__(self, dtype=None):
            return np.asarray(self.arr, dtype)

    class _RGBDImage:
        def __init__(self, color, depth):
            self.color, self.depth = color, depth

        @staticmethod
        def create_from_color_and_depth(color, depth, depth_scale=1000.0,
                                        depth_trunc=3.0,
                                        convert_rgb_to_intensity=True):
            d = np.asarray(depth, np.float64) / float(depth_scale)
            d = np.where(d >= depth_trunc, 0.0, d)
            c = np.asarray(color)
            if convert_rgb_to_intensity:
                c = (c.astype(np.float64) / 255.0).mean(axis=-1)
            return _RGBDImage(c, d)

    class _PinholeCameraIntrinsic:
        def set_intrinsics(self, width, height, fx, fy, cx, cy):
            self.width, self.height = width, height
            self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy

    def _read_point_cloud(path):
        with open(path, "rb") as f:
            assert f.readline().strip() == b"ply", path
            fmt, count, props = None, 0, []
            while True:
                line = f.readline().decode("ascii").strip()
                if line.startswith("format"):
                    fmt = line.split()[1]
                elif line.startswith("element vertex"):
                    count = int(line.split()[2])
                elif line.startswith("element"):
                    raise NotImplementedError(f"non-vertex element: {line}")
                elif line.startswith("property"):
                    props.append((line.split()[1], line.split()[2]))
                elif line == "end_header":
                    break
            dt_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                      "float64": "<f8", "uchar": "u1", "uint8": "u1"}
            if fmt == "ascii":
                rows = np.loadtxt(f, max_rows=count, ndmin=2)
                rec = {name: rows[:, i] for i, (_, name) in enumerate(props)}
            else:
                assert fmt == "binary_little_endian", fmt
                dtype = np.dtype([(name, dt_map[t]) for t, name in props])
                rec_arr = np.frombuffer(f.read(count * dtype.itemsize), dtype)
                rec = {name: rec_arr[name] for _, name in props}
            pts = np.stack([rec["x"], rec["y"], rec["z"]], -1).astype(np.float64)
            cols = np.zeros((0, 3), np.float64)
            if "red" in rec:
                cols = np.stack([rec["red"], rec["green"], rec["blue"]], -1)
                cols = cols.astype(np.float64) / 255.0
            return _PointCloud(pts, cols)

    geom = _stub_module(
        "open3d.geometry", PointCloud=_PointCloud, Image=_Image,
        RGBDImage=_RGBDImage,
    )
    cam = _stub_module(
        "open3d.camera", PinholeCameraIntrinsic=_PinholeCameraIntrinsic)
    io = _stub_module("open3d.io", read_point_cloud=_read_point_cloud)
    o3d.geometry, o3d.camera, o3d.io = geom, cam, io


def install() -> None:
    """Stub missing deps, add the reference to sys.path, no-op .cuda()."""
    global _installed
    if _installed:
        return

    class _AttrDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub_module("addict", Dict=_AttrDict)
    _stub_module("plyfile")
    o3d = _stub_module("open3d")
    _install_open3d_geometry(o3d)
    sk = _stub_module("skimage")
    sk.measure = _stub_module("skimage.measure")

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # the reference cannot run CPU-only as written (SURVEY.md §1 note);
    # identity .cuda() keeps every tensor on the host
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
    torch.cuda.synchronize = lambda *a, **k: None  # get_time(), utils.py:614-619
    _installed = True


def import_reference():
    """Returns (loss, utils, optimizer) — the real reference modules."""
    install()
    import wild_completion.loss as ref_loss
    import wild_completion.optimizer as ref_optimizer
    import wild_completion.utils as ref_utils

    return ref_loss, ref_utils, ref_optimizer


def make_reference_decoder(spec, seed: int = 0):
    """Instantiate the REAL reference Decoder class with random weight-norm
    weights matching `spec` (`deepsdf/networks/deep_sdf_decoder.py:10-110`),
    plus the state dict to convert for the JAX side.
    """
    install()
    from deepsdf.networks.deep_sdf_decoder import Decoder  # /root/reference
    from tests.torch_ref import make_torch_state_dict

    dec = Decoder(
        latent_size=spec.code_length,
        dims=list(spec.dims),
        dropout=list(range(len(spec.dims))),
        dropout_prob=0.2,
        norm_layers=list(range(len(spec.dims))),
        latent_in=list(spec.latent_in),
        weight_norm=True,
        xyz_in_all=False,
        use_tanh=False,
        latent_dropout=False,
    )
    state = make_torch_state_dict(spec, seed=seed, weight_norm=True)
    # the reference weight-norms only `norm_layers` (the hidden layers); the
    # final linear is plain (`deep_sdf_decoder.py:49-56`) — fold it
    last = spec.num_linear - 1
    v = state.pop(f"lin{last}.weight_v")
    g = state.pop(f"lin{last}.weight_g")
    state[f"lin{last}.weight"] = g * v / v.norm(dim=1, keepdim=True)
    dec.load_state_dict(state)
    dec.eval()
    return dec, state


def torch_decoder_from_params(params, spec):
    """The REAL reference Decoder class loaded with our folded JAX params
    (inverse of `models/workspace.convert_torch_checkpoint`: weights
    transposed back to torch's [out, in], no weight norm)."""
    install()
    from deepsdf.networks.deep_sdf_decoder import Decoder

    dec = Decoder(
        latent_size=spec.code_length,
        dims=list(spec.dims),
        dropout=None,
        dropout_prob=0.0,
        norm_layers=(),
        latent_in=list(spec.latent_in),
        weight_norm=False,
        xyz_in_all=False,
        use_tanh=False,
        latent_dropout=False,
    )
    state = {}
    for l in range(spec.num_linear):
        state[f"lin{l}.weight"] = torch.from_numpy(
            np.asarray(params[f"lin{l}"]["w"], np.float32).T.copy())
        state[f"lin{l}.bias"] = torch.from_numpy(
            np.asarray(params[f"lin{l}"]["b"], np.float32).copy())
    dec.load_state_dict(state)
    dec.eval()
    return dec


def torch_render_data(render_data: dict) -> dict:
    """numpy dict-of-lists render data (`data/rays.get_render_data`) ->
    the torch layout the reference Optimizer consumes (`utils.py:96-106`)."""
    out = dict(render_data)
    for k in ("T_wc", "rays_fg", "rays_bg", "depth_fg", "depth_bg"):
        out[k] = [torch.from_numpy(np.asarray(a, np.float32)) for a in render_data[k]]
    return out


def reference_cfg(cfg, device: str = "cpu") -> dict:
    """Reference YAML-schema config dict from a JointOptConfig
    (the raw-dict shape `Optimizer.__init__` reads, `optimizer.py:17-53`)."""
    return {
        "device": device,
        "opt": {
            "scale_on": cfg.scale_on,
            "robust_iter": cfg.robust_iter,
            "lm": {
                "lm_on": cfg.lm_on,
                "lm_eye": cfg.lm_eye,
                "lm_lambda_0": cfg.lm_lambda_0,
                "s_damp": cfg.s_damp,
            },
            "recon": {
                "n_pts": cfg.recon_n_pts,
                "cluster_dist_m": cfg.recon_cluster_dist_m,
                "robust_th_m": cfg.recon_robust_th_m,
            },
            "render": {
                "n_fg_pix": cfg.n_fg_pix,
                "n_bg_pix": cfg.n_bg_pix,
                "n_bg_pad": cfg.n_bg_pad,
                "n_frame": cfg.n_frame,
                "n_sample_on_ray": cfg.n_sample_on_ray,
                "log_sdf_occ": cfg.log_sdf_occ,
                "occ_cutoff_m": cfg.occ_cutoff_m,
                "occlusion_on": cfg.occlusion_on,
                "robust_th_m": cfg.render_robust_th_m,
            },
            "weight": {
                "w_recon": cfg.w_recon,
                "w_depth": cfg.w_depth,
                "w_mask": cfg.w_mask,
                "w_codereg": cfg.w_codereg,
            },
            "converge": {
                "max_iter": cfg.max_iter,
                "epsilon_g": cfg.epsilon_g,
                "epsilon_c": cfg.epsilon_c,
                "epsilon_t": cfg.epsilon_t,
                "epsilon_r": cfg.epsilon_r,
                "epsilon_s": cfg.epsilon_s,
            },
        },
        "vis": {"vis_pause_s": 0.0, "log_on": False},
    }


def render_data_from_obs(obs, n_fg: int) -> dict:
    """Reference `render_data` dict (`utils.py:96-106` keys) from a
    FruitObservations pytree. Requires all-valid rays/frames (no padding)."""
    obs_np = {k: np.asarray(v) for k, v in obs._asdict().items()}
    assert bool(obs_np["ray_valid"].all()) and bool(obs_np["frame_valid"].all())
    F = obs_np["T_wc"].shape[0]
    t = lambda a: torch.from_numpy(np.array(a, dtype=np.float32))
    return {
        "T_wc": [t(obs_np["T_wc"][f]) for f in range(F)],
        "rays_fg": [t(obs_np["rays"][f, :n_fg]) for f in range(F)],
        "rays_bg": [t(obs_np["rays"][f, n_fg:]) for f in range(F)],
        "depth_fg": [t(obs_np["depth_obs"][f, :n_fg]) for f in range(F)],
        "depth_bg": [t(obs_np["depth_obs"][f, n_fg:]) for f in range(F)],
    }
