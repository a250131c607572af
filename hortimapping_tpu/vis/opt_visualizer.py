"""Optional interactive optimization visualizer.

Reference: `/root/reference/wild_completion/opt_visualizer.py` — an Open3D
`VisualizerWithKeyCallback` window showing the input scan, GT scan, evolving
completed mesh, pose frame, and an iteration counter, with SPACE/N/V/M/F/G/
C/Q key bindings (`opt_visualizer.py:243-251`).

Visualization is explicitly host-side and optional in this framework
(`vis_on: false` is the first-class performance path — the published 0.6 s
reference number itself is measured without vis, SURVEY §3.5). When Open3D
is unavailable the same interface is served by `StubVisualizer`, which is a
no-op, so every driver can call vis methods unconditionally.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

__all__ = ["color_table", "text_3d", "StubVisualizer", "OptVisualizer", "make_visualizer"]

# 10 instance colors (reference `color_table`, opt_visualizer.py:21-31)
color_table = [
    [230.0 / 255.0, 0.0, 0.0],          # red
    [60.0 / 255.0, 180.0 / 255.0, 75.0 / 255.0],   # green
    [0.0, 0.0, 255.0 / 255.0],          # blue
    [255.0 / 255.0, 0, 255.0 / 255.0],  # magenta
    [255.0 / 255.0, 165.0 / 255.0, 0.0],# orange
    [128.0 / 255.0, 0, 128.0 / 255.0],  # purple
    [0.0, 255.0 / 255.0, 255.0 / 255.0],# cyan
    [210.0 / 255.0, 245.0 / 255.0, 60.0 / 255.0],  # lime
    [250.0 / 255.0, 190.0 / 255.0, 190.0 / 255.0], # pink
    [0.0, 128.0 / 255.0, 128.0 / 255.0],# teal
]


def text_3d(text: str, pos, direction=None, degree: float = 90.0,
            font: Optional[str] = None, font_size: int = 20,
            density: int = 2):
    """Render a text sprite as a colored point cloud in 3-D space
    (reference `text_3d`, `opt_visualizer.py:33-74`) — used for the
    iteration counter overlay. Returns a host `PointCloud`; the Open3D
    visualizer converts it like any scan."""
    from PIL import Image, ImageDraw, ImageFont

    from hortimapping_tpu.data.mesh import PointCloud

    try:
        f = ImageFont.truetype(font, font_size) if font else ImageFont.load_default()
    except OSError:
        f = ImageFont.load_default()
    bbox = ImageDraw.Draw(Image.new("L", (1, 1))).textbbox((0, 0), text, font=f)
    w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
    img = Image.new("L", (max(w, 1), max(h, 1)), 0)
    ImageDraw.Draw(img).text((-bbox[0], -bbox[1]), text, fill=255, font=f)
    arr = np.asarray(img)
    ys, xs = np.nonzero(arr > 128)
    if xs.size == 0:
        return PointCloud(np.zeros((0, 3), np.float32))
    scale = 1e-3 / density
    pts = np.stack([xs * scale, -ys * scale, np.zeros_like(xs, float)], axis=-1)
    # orient: rotate about x by `degree`, then align z with `direction`
    rad = np.deg2rad(degree)
    Rx = np.array([[1, 0, 0], [0, np.cos(rad), -np.sin(rad)], [0, np.sin(rad), np.cos(rad)]])
    pts = pts @ Rx.T
    if direction is not None:
        d = np.asarray(direction, float)
        d = d / np.linalg.norm(d)
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(z, d)
        c = float(z @ d)
        if np.linalg.norm(v) > 1e-9:
            vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
            R = np.eye(3) + vx + vx @ vx / (1.0 + c)
            pts = pts @ R.T
    pts = pts + np.asarray(pos, float)
    return PointCloud(pts.astype(np.float32),
                      np.tile([[1.0, 1.0, 1.0]], (pts.shape[0], 1)))


def _have_open3d() -> bool:
    try:
        import open3d  # noqa: F401

        return True
    except ImportError:
        return False


class StubVisualizer:
    """No-op visualizer with the full driver-facing interface
    (reference `StubVisualizer`, `opt_visualizer.py:77-83`)."""

    def __init__(self, frame_axis_len: float = 0.1, pause_time_s: float = 1e-2):
        self.frame_axis_len = frame_axis_len
        self.pause_time_s = pause_time_s
        self.skip_flag = False

    def update(self, scan, pose, mesh=None) -> None:
        pass

    def update_mesh(self, mesh) -> None:
        pass

    def update_mesh_pose(self, cano_mesh, transform, iteration: int) -> None:
        pass

    def add_scan(self, scan) -> None:
        pass

    def add_gt_scan(self, gt_scan) -> None:
        pass

    def update_view(self) -> None:
        pass

    def pause_view(self) -> None:
        pass

    def clean_vis(self) -> None:
        pass

    def stop(self) -> bool:
        """Blocks until keypress in the real visualizer; returns the skip
        flag (`opt_visualizer.py:211-220`)."""
        return self.skip_flag

    def destroy_window(self) -> None:
        pass


class OptVisualizer(StubVisualizer):
    """Open3D-backed interactive visualizer. Import-guarded: constructing it
    without open3d raises with a clear message; use `make_visualizer` to
    fall back to the stub automatically.

    Key map (parity with the reference's printed help, `opt_visualizer.py:235`):
    [SPACE] pause/start, [N] skip this fruit, [V] switch back to the default
    viewpoint, [M] toggle the completed mesh, [F] toggle the pose coordinate
    frame, [G] toggle the ground-truth scan, [C] toggle the mesh in the
    canonical frame, [ESC/Q] exit.
    """

    def __init__(self, frame_axis_len: float = 0.1, pause_time_s: float = 1e-2):
        super().__init__(frame_axis_len, pause_time_s)
        if not _have_open3d():
            raise ImportError(
                "open3d is required for OptVisualizer; set vis_on: false or "
                "install open3d (StubVisualizer keeps the pipeline fully "
                "functional without it)"
            )
        import open3d as o3d

        self._o3d = o3d
        self.block_vis = True
        self.play_crun = False
        self.reset_bounding_box = True
        self.scan = o3d.geometry.PointCloud()
        self.gt_scan = o3d.geometry.PointCloud()
        self.mesh = o3d.geometry.TriangleMesh()
        self.cano_mesh = o3d.geometry.TriangleMesh()
        self.frame = o3d.geometry.TriangleMesh()
        self.txt = o3d.geometry.PointCloud()
        # display toggles (reference opt_visualizer.py:112-121)
        self.render_mesh = True
        self.render_frame = True
        self.render_gt = True
        self.vis_cano = False
        self.global_view = False
        # canonical-mesh / iteration-counter anchor (set by add_scan,
        # reference opt_visualizer.py:171-175)
        self.cano_tran = np.zeros(3)
        self.txt_tran = np.zeros(3)
        self.vis = o3d.visualization.VisualizerWithKeyCallback()
        self._register_key_callbacks()
        self.vis.create_window(window_name=self.__class__.__name__)
        self.vis.get_render_option().light_on = True
        self.vis.get_render_option().mesh_show_back_face = True
        self.view_control = self.vis.get_view_control()
        self.camera_params = self.view_control.convert_to_pinhole_camera_parameters()
        print(100 * "*")
        print(
            f"{self.__class__.__name__} initialized. Press [SPACE] to "
            "pause/start, [N] to skip, [V] to switch back to the default "
            "viewpoint, [M] to toggle the completed mesh, [F] to toggle the "
            "pose coordinate frame, [G] to toggle the ground truth mesh if "
            "available, [C] to toggle the mesh visualization in the "
            "canonical frame, [ESC / Q] to exit."
        )

    # -- geometry updates ---------------------------------------------------

    def _to_o3d_pcd(self, scan):
        o3d = self._o3d
        if isinstance(scan, o3d.geometry.PointCloud):
            return scan
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(np.asarray(scan.points, np.float64))
        if getattr(scan, "colors", None) is not None:
            pcd.colors = o3d.utility.Vector3dVector(np.asarray(scan.colors, np.float64))
        return pcd

    def _to_o3d_mesh(self, mesh):
        o3d = self._o3d
        if isinstance(mesh, o3d.geometry.TriangleMesh):
            return mesh
        m = o3d.geometry.TriangleMesh(
            o3d.utility.Vector3dVector(np.asarray(mesh.vertices, np.float64)),
            o3d.utility.Vector3iVector(np.asarray(mesh.faces, np.int32)),
        )
        if getattr(mesh, "vertex_colors", None) is not None:
            m.vertex_colors = o3d.utility.Vector3dVector(np.asarray(mesh.vertex_colors))
        m.compute_vertex_normals()
        return m

    def add_scan(self, scan) -> None:
        pcd = self._to_o3d_pcd(scan)
        self.scan.points = pcd.points
        self.scan.colors = pcd.colors
        self.vis.add_geometry(self.scan, self.reset_bounding_box)
        # canonical-mesh anchor beside the scan + iteration-counter anchor
        # (reference opt_visualizer.py:171-182)
        self.cano_tran = np.asarray(
            self.scan.get_axis_aligned_bounding_box().get_center()
        ).copy()
        self.cano_tran[0] += 2 * self.frame_axis_len
        self.txt_tran = np.copy(self.cano_tran)
        self.txt_tran[0] -= 3.5 * self.frame_axis_len
        self._set_txt(0)
        self.update_view()

    def add_gt_scan(self, gt_scan) -> None:
        pcd = self._to_o3d_pcd(gt_scan)
        self.gt_scan.points = pcd.points
        self.gt_scan.colors = pcd.colors
        self.vis.add_geometry(self.gt_scan, self.reset_bounding_box)
        self.update_view()

    def update_mesh(self, mesh) -> None:
        m = self._to_o3d_mesh(mesh)
        self.mesh.vertices = m.vertices
        self.mesh.triangles = m.triangles
        self.mesh.vertex_colors = m.vertex_colors
        self.mesh.compute_vertex_normals()
        self.vis.update_geometry(self.mesh)
        self.update_view()

    def _set_txt(self, iteration: int) -> None:
        """Iteration-counter overlay (reference opt_visualizer.py:349-351)."""
        self.vis.remove_geometry(self.txt, False)
        sprite = self._to_o3d_pcd(text_3d(str(iteration), self.txt_tran))
        self.txt = sprite
        self.vis.add_geometry(self.txt, False)

    def update_mesh_pose(self, cano_mesh, transform, iteration: int) -> None:
        """Show the completed mesh posed by `transform`, the pose frame, the
        optional canonical-frame copy and the iteration counter (reference
        `update_mesh_pose`/`_update_mesh_cano`, `opt_visualizer.py:155-165,
        330-355`)."""
        o3d = self._o3d
        m = self._to_o3d_mesh(cano_mesh)
        T = np.asarray(transform, np.float64)

        self.vis.remove_geometry(self.mesh, self.reset_bounding_box)
        self.vis.remove_geometry(self.cano_mesh, False)
        if self.render_mesh:
            self.mesh = o3d.geometry.TriangleMesh(m).transform(T)
            self.mesh.compute_vertex_normals()
            self.vis.add_geometry(self.mesh, self.reset_bounding_box)
            if self.vis_cano:
                self.cano_mesh = o3d.geometry.TriangleMesh(m).translate(self.cano_tran)
                self.cano_mesh.compute_vertex_normals()
                self.vis.add_geometry(self.cano_mesh, False)

        self.vis.remove_geometry(self.frame, False)
        if self.render_frame:
            self.frame = o3d.geometry.TriangleMesh.create_coordinate_frame(
                self.frame_axis_len
            ).transform(T)
            self.vis.add_geometry(self.frame, False)

        self._set_txt(iteration)
        if self.reset_bounding_box:
            self.vis.reset_view_point(True)
            self.reset_bounding_box = False
        self.update_view()
        self.pause_view()

    # -- window control -----------------------------------------------------

    def update_view(self) -> None:
        self.vis.poll_events()
        self.vis.update_renderer()

    def pause_view(self) -> None:
        import time

        time.sleep(self.pause_time_s)

    def clean_vis(self) -> None:
        self.skip_flag = False
        self.vis.clear_geometries()
        self.scan = self._o3d.geometry.PointCloud()
        self.gt_scan = self._o3d.geometry.PointCloud()
        self.mesh = self._o3d.geometry.TriangleMesh()
        self.cano_mesh = self._o3d.geometry.TriangleMesh()
        self.frame = self._o3d.geometry.TriangleMesh()
        self.txt = self._o3d.geometry.PointCloud()
        self.reset_bounding_box = True

    def stop(self) -> bool:
        """Block until SPACE (continue) or N (skip); returns the skip flag,
        which persists until `clean_vis` (`opt_visualizer.py:211-220,134-135`)."""
        self.block_vis = True
        while self.block_vis:
            self.update_view()
        return self.skip_flag

    def destroy_window(self) -> None:
        self.vis.destroy_window()

    # -- key bindings (opt_visualizer.py:243-251) ---------------------------

    def _register_key_callback(self, keys: List, callback: Callable) -> None:
        for key in keys:
            self.vis.register_key_callback(
                key if isinstance(key, int) else ord(key), callback
            )

    def _register_key_callbacks(self) -> None:
        # 256 = GLFW_KEY_ESCAPE (the reference binds it as ord("Ā"),
        # opt_visualizer.py:244 — ord("\x1b") = 27 would never fire)
        self._register_key_callback(["Q", 256], self._quit)
        self._register_key_callback([" "], self._start_stop)
        self._register_key_callback(["V"], self._toggle_view)
        self._register_key_callback(["F"], self._toggle_frame)
        self._register_key_callback(["M"], self._toggle_mesh)
        self._register_key_callback(["C"], self._toggle_cano)
        self._register_key_callback(["N"], self._skip)
        self._register_key_callback(["G"], self._toggle_gt)

    def _start_stop(self, vis) -> None:
        self.play_crun = not self.play_crun
        self.block_vis = False

    def _skip(self, vis) -> None:
        self.skip_flag = True
        self.block_vis = False

    def _toggle_view(self, vis) -> None:
        """Save/restore the camera viewpoint (reference
        `_toggle_view`, opt_visualizer.py:358-365)."""
        self.global_view = not self.global_view
        vis.update_renderer()
        vis.reset_view_point(True)
        current = self.view_control.convert_to_pinhole_camera_parameters()
        if self.camera_params is not None and not self.global_view:
            self.view_control.convert_from_pinhole_camera_parameters(self.camera_params)
        self.camera_params = current

    def _toggle_frame(self, vis) -> None:
        self.render_frame = not self.render_frame
        if self.render_frame:
            vis.add_geometry(self.frame, False)  # re-show immediately, even
            # when no further update_mesh_pose call follows (stop() wait)
        else:
            vis.remove_geometry(self.frame, False)

    def _toggle_mesh(self, vis) -> None:
        self.render_mesh = not self.render_mesh
        if self.render_mesh:
            vis.add_geometry(self.mesh, False)
            if self.vis_cano:
                vis.add_geometry(self.cano_mesh, False)
        else:
            vis.remove_geometry(self.mesh, False)
            vis.remove_geometry(self.cano_mesh, False)

    def _toggle_cano(self, vis) -> None:
        self.vis_cano = not self.vis_cano
        if self.vis_cano and self.render_mesh:
            vis.add_geometry(self.cano_mesh, False)
        elif not self.vis_cano:
            vis.remove_geometry(self.cano_mesh, False)

    def _toggle_gt(self, vis) -> None:
        self.render_gt = not self.render_gt
        if self.render_gt:
            vis.add_geometry(self.gt_scan, False)
        else:
            vis.remove_geometry(self.gt_scan, False)

    def _quit(self, vis) -> None:
        import sys

        vis.destroy_window()
        sys.exit(0)


def set_view(vis, zoom: float = 0.6, front=(0.0, 0.0, -1.0),
             lookat=(0.0, 0.0, 0.5), up=(0.0, -1.0, 0.0)) -> None:
    """Set the Open3D view-control camera (reference `set_view`,
    `wild_completion/utils.py:482-497`). No-op on a StubVisualizer."""
    ctl = getattr(getattr(vis, "vis", None), "get_view_control", None)
    if ctl is None:
        return
    vc = ctl()
    vc.set_zoom(zoom)
    vc.set_front(list(front))
    vc.set_lookat(list(lookat))
    vc.set_up(list(up))


def make_visualizer(vis_on: bool, frame_axis_len: float = 0.1,
                    pause_time_s: float = 1e-2) -> StubVisualizer:
    """`vis_on and open3d available` -> OptVisualizer, else StubVisualizer."""
    if vis_on and _have_open3d():
        return OptVisualizer(frame_axis_len, pause_time_s)
    return StubVisualizer(frame_axis_len, pause_time_s)
