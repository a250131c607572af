"""Synthetic fruit world: trained ellipsoid DeepSDF decoder + scene generator.

The reference ships pretrained decoder weights that are absent from this
mount (`/root/reference/.MISSING_LARGE_BLOBS`), so the framework provides a
self-contained synthetic category: a DeepSDF decoder trained on an analytic
family of ellipsoids whose radii are parameterized by the latent code. This
gives every end-to-end path (joint optimization, meshing, metrics, bench) a
real geometry with known ground truth — completion and pose errors are
measurable exactly.

Latent model: radii = base_radius * exp(P @ code) for a fixed random
projection P (3 x C, small singular values), so code = 0 is a sphere of
`base_radius` and codes within +-1 deform it by ~+-20%.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hortimapping_tpu.models.decoder import DecoderSpec, Params, decoder_apply, init_decoder_params
from hortimapping_tpu.optim.state import FruitObservations


@dataclasses.dataclass(frozen=True)
class SyntheticCategory:
    spec: DecoderSpec
    base_radius: float = 0.05
    proj_scale: float = 0.2

    def projection(self) -> np.ndarray:
        rng = np.random.default_rng(1234)
        P = rng.normal(size=(3, self.spec.code_length)) / np.sqrt(self.spec.code_length)
        return (P * self.proj_scale).astype(np.float32)


def ellipsoid_radii(code: jnp.ndarray, proj: jnp.ndarray, base_radius: float) -> jnp.ndarray:
    return base_radius * jnp.exp(proj @ code)


def ellipsoid_sdf(x: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    """Good-quality approximate ellipsoid SDF: k0(k0-1)/k1.

    x: (..., 3). Exact on spheres, small relative error for mild aspect
    ratios — plenty for a training target.
    """
    k0 = jnp.linalg.norm(x / radii, axis=-1)
    k1 = jnp.linalg.norm(x / (radii * radii), axis=-1)
    k1 = jnp.where(k1 == 0.0, 1.0, k1)
    return jnp.where(k0 == 0.0, -jnp.min(radii), k0 * (k0 - 1.0) / k1)


def train_synthetic_decoder(
    cat: SyntheticCategory,
    key: jax.Array,
    steps: int = 1500,
    batch: int = 4096,
    lr: float = 1e-3,
    sample_extent: float = 2.5,
) -> Tuple[Params, np.ndarray]:
    """Fit the decoder MLP to the analytic ellipsoid family.

    Returns (params, projection). Query points are drawn within
    `sample_extent * base_radius` of the origin, denser near the surface.
    """
    import optax

    spec = cat.spec
    proj = jnp.asarray(cat.projection())
    params = init_decoder_params(spec, key)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, min(200, steps // 10), steps, lr * 1e-2)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    extent = sample_extent * cat.base_radius

    def step(params, opt_state, k):
        kc, kx, ks = jax.random.split(k, 3)
        codes = jax.random.normal(kc, (batch, spec.code_length)) * 0.5
        # half uniform in the box, half near the surface
        x_uni = jax.random.uniform(kx, (batch, 3), minval=-extent, maxval=extent)
        radii = jax.vmap(lambda c: ellipsoid_radii(c, proj, cat.base_radius))(codes)
        dirs = jax.random.normal(ks, (batch, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        noise = jax.random.normal(jax.random.fold_in(ks, 1), (batch, 1)) * 0.01
        x_surf = dirs * radii * (1.0 + noise)
        x = jnp.where((jnp.arange(batch) % 2 == 0)[:, None], x_uni, x_surf)

        target = jax.vmap(ellipsoid_sdf)(x, radii)
        target = jnp.clip(target, -spec.clamping_distance, spec.clamping_distance)

        def loss_fn(p):
            inp = jnp.concatenate([codes, x], axis=-1)
            pred = decoder_apply(p, spec, inp)[..., 0]
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def train(params, opt_state):
        def body(s, carry):
            p, o = carry
            p, o, _ = step(p, o, jax.random.fold_in(key, s))
            return (p, o)

        return jax.lax.fori_loop(0, steps, body, (params, opt_state))

    params, _ = train(params, opt_state)
    return params, np.asarray(proj)


def _ellipsoid_sdf_np(x: np.ndarray, radii: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of `ellipsoid_sdf` — scene generation is host-side
    cold path, and per-step device dispatch over a remote TPU link costs
    more than the whole computation."""
    k0 = np.linalg.norm(x / radii, axis=-1)
    k1 = np.linalg.norm(x / (radii * radii), axis=-1)
    k1 = np.where(k1 == 0.0, 1.0, k1)
    return np.where(k0 == 0.0, -np.min(radii), k0 * (k0 - 1.0) / k1)


def sphere_trace(
    origin: np.ndarray,       # (3,) world
    dirs: np.ndarray,         # (N, 3) unit, world
    T_ow: np.ndarray,         # (4, 4) world -> object (Sim(3), scale s)
    radii: np.ndarray,        # (3,)
    t0: float = 0.05,
    iters: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """March rays against the analytic ellipsoid. Returns (t_hit, hit_mask)."""
    R, t = T_ow[:3, :3], T_ow[:3, 3]
    s = np.linalg.det(R) ** (1.0 / 3.0)  # object-units per world-unit
    tt = np.full(dirs.shape[0], t0)
    for _ in range(iters):
        x_w = origin + tt[:, None] * dirs
        x_o = x_w @ R.T + t
        d_o = _ellipsoid_sdf_np(x_o, radii)
        tt = tt + d_o / s  # convert object-frame distance to world units
    x_w = origin + tt[:, None] * dirs
    x_o = x_w @ R.T + t
    d_final = np.abs(_ellipsoid_sdf_np(x_o, radii))
    hit = (d_final < 1e-4 * max(1.0, 1.0 / s)) & (tt > 0) & (tt < 10.0)
    return tt, hit


def make_scene(
    cat: SyntheticCategory,
    code_gt: np.ndarray,
    T_wo_gt: np.ndarray,          # (4, 4) object -> world (Sim(3))
    n_frames: int,
    n_fg: int,
    n_bg: int,
    n_points: int,
    seed: int = 0,
    cam_distance: float = 0.35,
    bg_depth: float = 1.5,
    partial_view: bool = True,
) -> Tuple[FruitObservations, np.ndarray]:
    """Build FruitObservations for one synthetic fruit.

    Cameras orbit the object on a circle of `cam_distance`, looking at its
    center; fg rays hit the analytic surface (depth from sphere tracing), bg
    rays miss and get a far background depth. Surface points are sampled on
    the (optionally half-) visible surface in world frame.
    Returns (observations, surface_points_full) — the latter is the complete
    GT surface for metric evaluation.
    """
    rng = np.random.default_rng(seed)
    proj = cat.projection()
    radii = cat.base_radius * np.exp(proj @ np.asarray(code_gt))
    T_ow_gt = np.linalg.inv(T_wo_gt)
    center_w = T_wo_gt[:3, 3]
    R_total = n_fg + n_bg

    T_wc, rays_all, ray_valid, depth_obs, frame_valid = [], [], [], [], []
    for f in range(n_frames):
        ang = 2 * np.pi * f / max(n_frames, 1) + 0.3
        cam_pos = center_w + cam_distance * np.array(
            [np.cos(ang), 0.25 * np.sin(2 * ang), np.sin(ang)]
        )
        # camera looks at object center: build R_wc with +z toward center
        zc = center_w - cam_pos
        zc = zc / np.linalg.norm(zc)
        up = np.array([0.0, 1.0, 0.0])
        xc = np.cross(up, zc)
        xc = xc / np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = xc, yc, zc, cam_pos

        # fg candidate rays: aimed at jittered surface points
        dirs_o = rng.normal(size=(n_fg * 3, 3))
        dirs_o /= np.linalg.norm(dirs_o, axis=-1, keepdims=True)
        surf_w = (dirs_o * radii) @ T_wo_gt[:3, :3].T + T_wo_gt[:3, 3]
        d_w = surf_w - cam_pos
        d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
        t_hit, hit = sphere_trace(cam_pos, d_w, T_ow_gt, radii)
        d_w, t_hit = d_w[hit][:n_fg], t_hit[hit][:n_fg]
        n_fg_actual = d_w.shape[0]

        # bg rays: wider jitter around the center direction, keep misses
        off = rng.normal(size=(n_bg * 4, 3)) * 0.35
        d_bg = (center_w - cam_pos)[None, :] / cam_distance + off
        d_bg /= np.linalg.norm(d_bg, axis=-1, keepdims=True)
        _, hit_bg = sphere_trace(cam_pos, d_bg, T_ow_gt, radii)
        d_bg = d_bg[~hit_bg][:n_bg]
        n_bg_actual = d_bg.shape[0]

        # cam-frame rays with z=1 normalization (pinhole convention of
        # get_rays, reference utils.py:23-37)
        R_cw = T[:3, :3].T
        rays_f = np.zeros((R_total, 3), np.float32)
        valid_f = np.zeros(R_total, bool)
        depth_f = np.zeros(R_total, np.float32)

        rc = (d_w @ R_cw.T) if n_fg_actual else np.zeros((0, 3))
        if n_fg_actual:
            zs = rc[:, 2:3]
            rays_f[:n_fg_actual] = rc / zs
            depth_f[:n_fg_actual] = t_hit * zs[:, 0]  # z-depth, matches depth images
            valid_f[:n_fg_actual] = True
        rb = (d_bg @ R_cw.T) if n_bg_actual else np.zeros((0, 3))
        if n_bg_actual:
            zs = rb[:, 2:3]
            rays_f[n_fg : n_fg + n_bg_actual] = rb / zs
            depth_f[n_fg : n_fg + n_bg_actual] = bg_depth
            valid_f[n_fg : n_fg + n_bg_actual] = True

        T_wc.append(T.astype(np.float32))
        rays_all.append(rays_f)
        ray_valid.append(valid_f)
        depth_obs.append(depth_f)
        frame_valid.append(True)

    # measured surface points (world): partial coverage like a real scan
    dirs_o = rng.normal(size=(n_points * 2, 3))
    dirs_o /= np.linalg.norm(dirs_o, axis=-1, keepdims=True)
    if partial_view:
        dirs_o = dirs_o[dirs_o[:, 2] < 0.3][:n_points]
    else:
        dirs_o = dirs_o[:n_points]
    n_actual = dirs_o.shape[0]
    pts_o = dirs_o * radii
    pts_w = pts_o @ T_wo_gt[:3, :3].T + T_wo_gt[:3, 3]
    points_w = np.zeros((n_points, 3), np.float32)
    points_w[:n_actual] = pts_w
    point_valid = np.arange(n_points) < n_actual

    # full GT surface for metrics
    dirs_full = np.random.default_rng(seed + 1).normal(size=(4096, 3))
    dirs_full /= np.linalg.norm(dirs_full, axis=-1, keepdims=True)
    full_w = (dirs_full * radii) @ T_wo_gt[:3, :3].T + T_wo_gt[:3, 3]

    # host numpy (not jnp): see data/rays.render_data_to_observations —
    # request buffers must stay host-side until the one batched jit upload
    obs = FruitObservations(
        T_wc=np.stack(T_wc).astype(np.float32),
        rays=np.stack(rays_all),
        ray_valid=np.stack(ray_valid),
        depth_obs=np.stack(depth_obs),
        frame_valid=np.asarray(frame_valid),
        points_w=points_w,
        point_valid=point_valid,
    )
    return obs, full_w.astype(np.float32)
