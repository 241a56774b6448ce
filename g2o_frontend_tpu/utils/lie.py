"""Lie-group utilities for SE(2)/SE(3), vmap-friendly and jit-safe.

Provides the same charts as the reference `basemath` layer so that estimates
and information matrices are numerically comparable:

- SE3 "quaternion chart": 6-vector ``[tx ty tz qx qy qz]`` with
  ``qw = sqrt(1 - |q_xyz|^2)`` (reference: ``basemath/bm_se3.h:8-51``,
  v2t/t2v/quat2mat/mat2quat).
- SE2 chart: 3-vector ``[x y theta]`` (reference: ``basemath/bm_se2.h``).
- Additionally the canonical se(3) exp/log twist chart used by our own
  solvers (the reference has no need for it; we use it for manifold updates
  where the quaternion chart's qw>=0 restriction is inconvenient).

All functions operate on single elements with trailing shapes ``(3,)``,
``(3,3)``, ``(4,4)``... and are written to be `jax.vmap`-ed over leading axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------


def se2_v2t(v):
    """[x, y, theta] -> 3x3 homogeneous transform."""
    x, y, th = v[0], v[1], v[2]
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.array([[c, -s, x], [s, c, y], [0.0, 0.0, 1.0]], dtype=v.dtype)


def se2_t2v(T):
    """3x3 homogeneous transform -> [x, y, theta]."""
    return jnp.array([T[0, 2], T[1, 2], jnp.arctan2(T[1, 0], T[0, 0])], dtype=T.dtype)


def se2_compose(a, b):
    """Compose two SE2 chart vectors: a ⊕ b (apply b in a's frame)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.array(
        [
            a[0] + c * b[0] - s * b[1],
            a[1] + s * b[0] + c * b[1],
            wrap_angle(a[2] + b[2]),
        ],
        dtype=a.dtype,
    )


def se2_inverse(a):
    """Inverse of an SE2 chart vector."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.array(
        [-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]), -a[2]], dtype=a.dtype
    )


def se2_relative(a, b):
    """a^{-1} ∘ b as a chart vector (the SE2 edge prediction)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return jnp.array(
        [c * dx + s * dy, -s * dx + c * dy, wrap_angle(b[2] - a[2])], dtype=a.dtype
    )


def se2_apply(a, p):
    """Apply SE2 chart vector to 2D point(s); p shape (..., 2)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    x = c * p[..., 0] - s * p[..., 1] + a[0]
    y = s * p[..., 0] + c * p[..., 1] + a[1]
    return jnp.stack([x, y], axis=-1)


def wrap_angle(th):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(th), jnp.cos(th))


# ---------------------------------------------------------------------------
# SE(3) — quaternion chart (reference parity)
# ---------------------------------------------------------------------------


def quat2mat(q_xyz):
    """Imaginary quaternion part -> rotation matrix.

    ``qw = sqrt(max(0, 1 - |q|^2))`` as in the reference
    (``basemath/bm_se3.h:8-20``); valid for |q| <= 1, i.e. rotations < 180deg.
    """
    qx, qy, qz = q_xyz[0], q_xyz[1], q_xyz[2]
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 - (qx * qx + qy * qy + qz * qz)))
    return jnp.array(
        [
            [
                qw * qw + qx * qx - qy * qy - qz * qz,
                2 * (qx * qy - qw * qz),
                2 * (qx * qz + qw * qy),
            ],
            [
                2 * (qx * qy + qz * qw),
                qw * qw - qx * qx + qy * qy - qz * qz,
                2 * (qy * qz - qx * qw),
            ],
            [
                2 * (qx * qz - qy * qw),
                2 * (qy * qz + qx * qw),
                qw * qw - qx * qx - qy * qy + qz * qz,
            ],
        ],
        dtype=q_xyz.dtype,
    )


def mat2quat_full(R):
    """Rotation matrix -> full unit quaternion [qw, qx, qy, qz], qw >= 0.

    Branchless Shepperd's method: build all four candidate quaternions and
    select the one with the largest pivot, so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions, one per pivot choice.
    qw_ = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01])
    qx_ = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20])
    qy_ = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21])
    qz_ = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22])
    cands = jnp.stack([qw_, qx_, qy_, qz_], axis=1)  # (4 pivots, 4 comps)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22]
    )
    best = jnp.argmax(pivots)
    q = cands[best]
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[0] < 0, -q, q)


def mat2quat(R):
    """Rotation matrix -> imaginary quaternion part with qw >= 0.

    Matches reference ``mat2quat`` (``bm_se3.h:23-33``): returns (qx,qy,qz)
    of the normalized quaternion, sign-flipped so that qw >= 0.
    """
    return mat2quat_full(R)[1:]


def se3_v2t(v):
    """6-vector [t, q_xyz] -> 4x4 homogeneous transform (``bm_se3.h:35-42``)."""
    T = jnp.eye(4, dtype=v.dtype)
    T = T.at[:3, :3].set(quat2mat(v[3:6]))
    T = T.at[:3, 3].set(v[0:3])
    return T


def se3_t2v(T):
    """4x4 homogeneous transform -> 6-vector [t, q_xyz] (``bm_se3.h:44-51``)."""
    return jnp.concatenate([T[:3, 3], mat2quat(T[:3, :3])])


def se3_compose(A, B):
    return A @ B


def se3_inverse(T):
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def skew(v):
    """3-vector -> skew-symmetric matrix (canonical, NOT the reference's 2x
    variant — the reference bakes the quaternion-chart factor 2 into its
    ``skew`` (``bm_se3.h:53-65``); we keep that factor in the Jacobians)."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array(
        [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]], dtype=v.dtype
    )


# ---------------------------------------------------------------------------
# SE(3) — exp/log twist chart (solver-internal)
# ---------------------------------------------------------------------------


def so3_exp(w):
    """Axis-angle 3-vector -> rotation matrix (Rodrigues), small-angle safe."""
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-32)
    W = skew(w)
    # sin(x)/x and (1-cos(x))/x^2 with series fallbacks near zero.
    # branch thresholds are f32-calibrated: (1 - cos th) cancels
    # catastrophically in f32 up to th ~ 3e-3 (cos rounds to 1.0), so the
    # series branch must cover th <= 1e-2 (series truncation there is
    # ~1e-11 relative — far below f32 eps)
    a = jnp.where(th2 > 1e-4, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    b = jnp.where(th2 > 1e-4, (1.0 - jnp.cos(th)) / (th2 + 1e-32), 0.5 - th2 / 24.0)
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def so3_log(R):
    """Rotation matrix -> axis-angle 3-vector, safe near 0 and pi."""
    tr = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    # th from atan2(|vee|, cos): the arccos form loses ~sqrt(eps) accuracy
    # near th = 0 (f32: 6% relative at th = 1e-3); atan2 is conditioned
    # everywhere except th ~ pi, which the near_pi branch owns
    v = 0.5 * jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = jnp.linalg.norm(v)
    th = jnp.arctan2(s, tr)
    sin_th = jnp.sin(th)
    generic = v * jnp.where(sin_th > 1e-6, th / jnp.maximum(sin_th, 1e-32), 1.0)
    # Near pi: use diagonal to recover axis magnitude.
    diag = jnp.clip((jnp.diag(R) - tr) / jnp.maximum(1.0 - tr, 1e-12), 0.0, None)
    axis = jnp.sqrt(diag)
    axis = axis * jnp.sign(
        jnp.array(
            [
                jnp.where(v[0] != 0, v[0], 1.0),
                jnp.where(v[1] != 0, v[1], 1.0),
                jnp.where(v[2] != 0, v[2], 1.0),
            ]
        )
    )
    near_pi = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12) * th
    return jnp.where(th > 3.0, near_pi, generic)


def se3_exp(xi):
    """Twist [v, w] -> 4x4 transform."""
    v, w = xi[:3], xi[3:]
    R = so3_exp(w)
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-32)
    W = skew(w)
    # f32-calibrated branch (see so3_exp): cover th <= 1e-2 with the series
    b = jnp.where(th2 > 1e-4, (1.0 - jnp.cos(th)) / (th2 + 1e-32), 0.5 - th2 / 24.0)
    c = jnp.where(
        th2 > 1e-4, (th - jnp.sin(th)) / (th2 * th + 1e-32), 1.0 / 6.0 - th2 / 120.0
    )
    V = jnp.eye(3, dtype=xi.dtype) + b * W + c * (W @ W)
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ v)
    return T


def se3_log(T):
    """4x4 transform -> twist [v, w]."""
    w = so3_log(T[:3, :3])
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-32)
    W = skew(w)
    # V^{-1} = I - W/2 + (1/th^2)(1 - th sin/(2(1-cos))) W^2
    # f32-calibrated branch: with the 1e-8 threshold, (1 - cos th) rounds
    # to 0 for th in [1e-4, 3e-3] and the guarded division EXPLODES to Inf
    # (measured: one gradient step on the SE3 simulator -> chi2 = Inf);
    # the series 1/12 + th^2/720 is exact to ~1e-13 at th = 1e-2
    cot_term = jnp.where(
        th2 > 1e-4,
        (1.0 - th * jnp.sin(th) / (2.0 * jnp.maximum(1.0 - jnp.cos(th), 1e-32)))
        / (th2 + 1e-32),
        1.0 / 12.0 + th2 / 720.0,
    )
    Vinv = jnp.eye(3, dtype=T.dtype) - 0.5 * W + cot_term * (W @ W)
    return jnp.concatenate([Vinv @ T[:3, 3], w])


# ---------------------------------------------------------------------------
# Quaternion helpers (wxyz layout)
# ---------------------------------------------------------------------------


def quat_mul(a, b):
    """Hamilton product of [w,x,y,z] quaternions."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        dtype=a.dtype,
    )


def quat_rotate(q, p):
    """Rotate 3-vector(s) p by unit quaternion q=[w,x,y,z]; p shape (...,3)."""
    w, xyz = q[0], q[1:]
    t = 2.0 * jnp.cross(jnp.broadcast_to(xyz, p.shape), p)
    return p + w * t + jnp.cross(jnp.broadcast_to(xyz, t.shape), t)


def quat_normalize(q):
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    return jnp.where(q[0] < 0, -q, q)
