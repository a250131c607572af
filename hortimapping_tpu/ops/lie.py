"""Lie-group machinery for SE(3) and Sim(3), jit-safe and batched.

Re-design of the reference Lie utilities
(`/root/reference/wild_completion/utils.py:197-386`). Conventions match the
reference exactly: tangent vectors are ordered (translation, rotation[, log
scale]) with a LEFT perturbation model, so the pose update is
``T <- exp(delta) @ T``.

TPU-first notes:
  * Small-angle branches are `jnp.where` selections over safe denominators
    (no data-dependent Python branching), so everything traces once and vmaps
    over fruit batches.
  * The small-angle limits are the true Taylor limits. The reference returns
    J = I at theta <= 1e-8 (`utils.py:241-243`).
  * Sim(3) has TWO variants. The reference sets c = 0 whenever s <= 1e-8
    inside the theta > eps branch (`utils.py:314`) — not just at the branch
    point: EVERY negative log-scale increment drops the c*I term of the
    translation Jacobian (true value c ~= 1), so the reference's "exponential"
    is not the Sim(3) exponential for s < 0. Since roughly half of all LM
    scale steps are negative, this measurably shapes the published method's
    optimizer trajectories. `exp_sim3_ref` replicates it bit-for-bit (used by
    the LM update for trajectory parity with the reference,
    tests/test_reference_parity.py); `exp_sim3` is the mathematically exact
    map (used everywhere a true exponential is meant).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Batched hat operator: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


_V_SERIES_TERMS = 20


def _v_matrix_series(X: jnp.ndarray) -> jnp.ndarray:
    """V = integral_0^1 e^(sigma X) dsigma = sum_n X^n / (n+1)!.

    Branch-free and numerically stable in f32 for any realistic tangent
    (||X|| <~ 5): closed forms for V suffer catastrophic cancellation near
    the small-angle/small-scale branch points, a plain matrix series does
    not. 20 terms reach f32 roundoff (5^20/21! ~ 2e-6, terms decay fast).
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape)
    V = eye
    term = eye
    for n in range(1, _V_SERIES_TERMS):
        term = (term @ X) / (n + 1.0)
        V = V + term
    return V


def exp_se3(x: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3). x = (v[3], w[3]) -> 4x4 transform.

    Reference: `utils.py:220-254`. Rotation by Rodrigues (the B coefficient
    uses 2 sin^2(t/2)/t^2 which has no cancellation); translation via the
    series V matrix.
    """
    v, w = x[..., :3], x[..., 3:6]
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta < _EPS
    theta_safe = jnp.where(small, 1.0, theta)
    t2 = theta_safe * theta_safe
    A = jnp.where(small, 1.0, jnp.sin(theta) / theta_safe)
    half_sin = jnp.sin(theta / 2.0)
    B = jnp.where(small, 0.5, 2.0 * half_sin * half_sin / t2)

    W = skew(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=x.dtype)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    t = (_v_matrix_series(W) @ v[..., None])[..., 0]

    T = jnp.zeros(x.shape[:-1] + (4, 4), x.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def exp_sim3(x: jnp.ndarray) -> jnp.ndarray:
    """Exponential map sim(3) -> Sim(3). x = (v[3], w[3], s) -> 4x4 transform
    with rotation block scaled by e^s.

    Reference: `utils.py:279-324` (same W/theta formulation; the translation
    Jacobian uses the closed form of Strasdat's Sim(3) V matrix).
    """
    v, w, s = x[..., :3], x[..., 3:6], x[..., 6]
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta < _EPS
    theta_safe = jnp.where(small, 1.0, theta)
    t2 = theta_safe * theta_safe
    e_s = jnp.exp(s)

    A = jnp.where(small, 1.0, jnp.sin(theta) / theta_safe)
    half_sin = jnp.sin(theta / 2.0)
    B = jnp.where(small, 0.5, 2.0 * half_sin * half_sin / t2)
    W = skew(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=x.dtype)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2

    # Sim(3) V matrix: integral of e^(sigma (W + s I)); series is exact and
    # branch-free where the closed form (Strasdat's k0/k1/k2) cancels badly
    # in f32 near theta -> 0 and s -> 0.
    X = W + s[..., None, None] * eye
    t = (_v_matrix_series(X) @ v[..., None])[..., 0]

    T = jnp.zeros(x.shape[:-1] + (4, 4), x.dtype)
    T = T.at[..., :3, :3].set(e_s[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def exp_sim3_ref(x: jnp.ndarray) -> jnp.ndarray:
    """Reference-compatible sim(3) "exponential" (`utils.py:279-324`).

    Replicates the reference closed form INCLUDING its quirk: inside the
    theta > eps branch, c = 0 for every s <= 1e-8 (`utils.py:314`) instead of
    the true limit (e^s - 1)/s -> 1, so translation updates shrink whenever
    the scale increment is negative. The c division keeps the reference's
    operation order ((e^s - 1)/s, catastrophic cancellation and all) so f32
    rounding matches torch. Used by the LM manifold update
    (`optim/lm.py`) so trajectories and iteration counts track the reference;
    use `exp_sim3` when the true exponential is intended.
    """
    v, w, s = x[..., :3], x[..., 3:6], x[..., 6]
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta <= _EPS
    theta_safe = jnp.where(small, 1.0, theta)
    t2 = theta_safe * theta_safe
    e_s = jnp.exp(s)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)

    W = skew(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=x.dtype)
    A = jnp.where(small, 0.0, sin_t / theta_safe)          # utils.py:311
    B = jnp.where(small, 0.0, (1.0 - cos_t) / t2)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2

    s_safe = jnp.where(s == 0.0, 1.0, s)
    c_div = (e_s - 1.0) / s_safe                           # torch's op order
    c_small = jnp.where(s == 0.0, 1.0, c_div)              # utils.py:302-309
    c_big = jnp.where(s <= _EPS, 0.0, c_div)               # utils.py:314 quirk
    denom = s * s + t2
    a = e_s * sin_t
    b = e_s * cos_t
    k1 = (a * s + (1.0 - b) * theta) / denom               # utils.py:316
    k2 = c_big - ((b - 1.0) * s + a * theta) / denom       # utils.py:317
    j_big = (
        c_big[..., None, None] * eye
        + (k1 / theta_safe)[..., None, None] * W
        + (k2 / t2)[..., None, None] * W2
    )
    j_small = c_small[..., None, None] * eye
    j = jnp.where(small[..., None, None], j_small, j_big)
    t = (j @ v[..., None])[..., 0]

    T = jnp.zeros(x.shape[:-1] + (4, 4), x.dtype)
    T = T.at[..., :3, :3].set(e_s[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def points_to_pose_jacobian_se3(points: jnp.ndarray) -> jnp.ndarray:
    """d(T x)/d(delta) at delta=0 for left-perturbed SE(3): [I | -x^].

    points: (..., 3) -> (..., 3, 6). Reference: `utils.py:197-217`.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), points.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -skew(points)], axis=-1)


def points_to_pose_jacobian_sim3(points: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) version: [I | -x^ | x]. points: (..., 3) -> (..., 3, 7).

    Reference: `utils.py:257-276`.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), points.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -skew(points), points[..., None]], axis=-1)


def sim3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a Sim(3) matrix [[sR, t], [0, 1]].

    (sR)^{-1} = R^T / s = (sR)^T / s^2 with s^2 = |first row of sR|^2 —
    three dot products instead of a 4x4 LU factorization (TPU LU on tiny
    matrices serializes badly; the reference calls `torch.inverse` per frame,
    `optimizer.py:105`)."""
    A = T[..., :3, :3]
    t = T[..., :3, 3]
    s2 = jnp.sum(A[..., 0, :] * A[..., 0, :], axis=-1)[..., None, None]
    A_inv = jnp.swapaxes(A, -1, -2) / s2
    t_inv = -jnp.einsum("...ij,...j->...i", A_inv, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(A_inv)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def rotation_matrix_to_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (rad) from a 3x3 rotation: acos((tr - 1)/2).

    Reference: `utils.py:360-369` (no axis, angle only). Trace argument is
    clipped to the valid acos domain for numerical safety.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def axis_angle_to_rotation_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula; identity at zero rotation. Reference: `utils.py:371-378`."""
    angle = jnp.linalg.norm(axis_angle, axis=-1)
    small = angle < _EPS
    axis = axis_angle / jnp.where(small, 1.0, angle)[..., None]
    S = skew(axis)
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    R = (
        eye
        + jnp.sin(angle)[..., None, None] * S
        + (1.0 - jnp.cos(angle))[..., None, None] * (S @ S)
    )
    return jnp.where(small[..., None, None], eye, R)
