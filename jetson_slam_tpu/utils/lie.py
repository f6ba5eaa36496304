"""SO(3) / SE(3) / Sim(3) tangent-space operations in JAX.

TPU-native replacement for the reference's g2o se3quat / sim3 types
(reference: Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}, used via
src/Converter.cpp and src/Optimizer.cpp).  Everything is written as pure
functions on (R, t[, s]) tuples so the optimizers can `vmap`/`jit` over
batches of poses.

Conventions:
- Rotations are 3x3 matrices, float32/float64 agnostic.
- `exp_so3` uses the Rodrigues formula with small-angle Taylor guards so it
  is safe under `jax.grad` and inside `lax.while_loop`.
- SE(3) tangent ordering is [rho (translation), phi (rotation)] to match the
  usual g2o::SE3Quat convention exp([upsilon, omega]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x with Taylor guard."""
    x2 = x * x
    small = jnp.abs(x) < 1e-4
    return jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(jnp.where(small, 1.0, x)) / jnp.where(small, 1.0, x))


def _cosc(x):
    """(1 - cos(x)) / x^2 with Taylor guard."""
    x2 = x * x
    small = jnp.abs(x) < 1e-4
    return jnp.where(
        small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(jnp.where(small, 1.0, x))) / jnp.where(small, 1.0, x2)
    )


def _theta_coeffs(phi):
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) as functions of
    theta^2, written so `jax.jacfwd` through phi = 0 stays NaN-free (the
    Taylor branch is polynomial in theta^2; the exact branch sees a clamped
    theta, the double-where trick)."""
    t2 = jnp.sum(phi * phi, axis=-1)
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (safe_t2 * t))
    return A, B, C


def exp_so3(phi):
    """Rodrigues: (..., 3) -> (..., 3, 3).  Differentiable at phi = 0."""
    A, B, _ = _theta_coeffs(phi)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R):
    """(..., 3, 3) -> (..., 3).  Safe for angles in [0, pi), and
    differentiable at the identity (atan2 + squared-norm guards instead of
    arccos, whose slope is infinite at trace == 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin2 = jnp.sum(w * w, axis=-1)
    sin_theta = jnp.sqrt(sin2 + 1e-24)  # regularized: finite grad at w = 0
    theta = jnp.arctan2(sin_theta, cos_theta)
    # phi = theta * axis = w * theta / sin(theta)
    s = _sinc(theta)[..., None]
    phi = w / jnp.maximum(s, _EPS)
    # Near pi, fall back to diagonal extraction.
    near_pi = (theta > 3.0)[..., None]
    # R = I + 2*cos? use: R + I has columns 2*(axis axis^T + cos... ) — use
    # axis^2_i = (R_ii + 1) / 2 for theta == pi.
    axis_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # sign disambiguation from off-diagonals
    sign_y = jnp.where(R[..., 0, 1] + R[..., 1, 0] >= 0, 1.0, -1.0)
    sign_z = jnp.where(R[..., 0, 2] + R[..., 2, 0] >= 0, 1.0, -1.0)
    axis = axis_abs * jnp.stack([jnp.ones_like(sign_y), sign_y, sign_z], axis=-1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    phi_pi = axis * theta[..., None]
    return jnp.where(near_pi, phi_pi, phi)


def left_jacobian_so3(phi):
    """SO(3) left Jacobian J_l(phi): (..., 3) -> (..., 3, 3).
    Differentiable at phi = 0."""
    _, B, C = _theta_coeffs(phi)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def exp_se3(xi):
    """se(3) exp.  xi = [rho(3), phi(3)] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = exp_so3(phi)
    J = left_jacobian_so3(phi)
    t = (J @ rho[..., None])[..., 0]
    return R, t


def log_se3(R, t):
    phi = log_so3(R)
    J = left_jacobian_so3(phi)
    rho = jnp.linalg.solve(J, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, p):
    """Apply transform to points p (..., 3)."""
    return (R @ p[..., None])[..., 0] + t


def se3_matrix(R, t):
    """(R, t) -> 4x4 homogeneous matrix."""
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def se3_retract(R, t, xi):
    """Left-multiplicative update: exp(xi) * (R, t) — g2o SE3 vertex convention."""
    dR, dt = exp_se3(xi)
    return se3_compose(dR, dt, R, t)


# ---------------------------------------------------------------------------
# Sim(3) — used by loop closing (reference: src/Sim3Solver.cpp, Optimizer.cpp
# OptimizeEssentialGraph / OptimizeSim3 with g2o::Sim3).
# S = (s, R, t);  S * p = s * R p + t.
# ---------------------------------------------------------------------------

def sim3_apply(s, R, t, p):
    return s[..., None] * (R @ p[..., None])[..., 0] + t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """Sa * Sb."""
    return sa * sb, Ra @ Rb, sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return inv_s, Rt, -inv_s[..., None] * (Rt @ t[..., None])[..., 0]


def exp_sim3(xi):
    """sim(3) exp, xi = [rho(3), phi(3), sigma(1)] -> (s, R, t).

    Uses the closed-form W matrix (Ethan Eade's notes / Strasdat's thesis).
    AD-safe at xi = 0 (squared-norm guards, double-where pattern).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = exp_so3(phi)
    W = _sim3_W(sigma, phi)
    t = (W @ rho[..., None])[..., 0]
    return s, R, t


def _sim3_W(sigma, phi):
    """W matrix of the Sim(3) exponential; differentiable at (0, 0)."""
    dtype = phi.dtype
    X = hat(phi)
    X2 = X @ X
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), X.shape)
    s = jnp.exp(sigma)
    sig = sigma
    sig2 = sig * sig

    t2 = jnp.sum(phi * phi, axis=-1)
    small_th = t2 < 1e-10
    safe_t2 = jnp.where(small_th, 1.0, t2)
    th = jnp.sqrt(safe_t2)

    small_sig = jnp.abs(sig) < 1e-5
    safe_sig = jnp.where(small_sig, 1.0, sig)
    safe_sig2 = jnp.where(small_sig, 1.0, sig2)

    # C = (e^sigma - 1) / sigma
    C = jnp.where(small_sig, 1.0 + sig / 2.0 + sig2 / 6.0, (s - 1.0) / safe_sig)

    # sigma ~ 0 branch (pure SO3 left-Jacobian coefficients)
    A_s = jnp.where(small_th, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / safe_t2)
    B_s = jnp.where(small_th, 1.0 / 6.0 - t2 / 120.0,
                    (th - jnp.sin(th)) / (safe_t2 * th))
    # general sigma branch
    a = s * jnp.sin(th)
    b = s * jnp.cos(th)
    denom = jnp.where(small_th, 1.0, t2 + sig2)
    A_g = jnp.where(
        small_th,
        ((sig - 1.0) * s + 1.0) / safe_sig2,
        (a * sig + (1.0 - b) * th) / (th * denom),
    )
    B_g = jnp.where(
        small_th,
        (s * (0.5 * sig2 - sig + 1.0) - 1.0) / (safe_sig2 * safe_sig),
        (C - ((b - 1.0) * sig + a * th) / denom) / safe_t2,
    )
    A = jnp.where(small_sig, A_s, A_g)
    B = jnp.where(small_sig, B_s, B_g)
    return C[..., None, None] * I + A[..., None, None] * X + B[..., None, None] * X2


def log_sim3(s, R, t):
    sigma = jnp.log(s)
    phi = log_so3(R)
    W = _sim3_W(sigma, phi)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def project_so3_np(R):
    """Nearest rotation matrix (Frobenius) via SVD, det-corrected. NumPy.

    Host-side hygiene for pose writebacks: chained float32 exp/compose
    updates accumulate off-SO(3) skew over hundreds of 3x3 multiplies per
    sequence, which both corrupts trace-based angle metrics and skews
    reprojection geometry.
    """
    import numpy as _np
    U, _, Vt = _np.linalg.svd(_np.asarray(R, _np.float64))
    D = _np.eye(3)
    D[2, 2] = _np.sign(_np.linalg.det(U @ Vt))
    return (U @ D @ Vt).astype(_np.float32)
