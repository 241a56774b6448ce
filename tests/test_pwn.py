"""PWN core tests: converter + aligner on synthetic known-transform scenes.

Mirrors the reference's validation style (synthetic transforms with planted
ground truth, ``ransac/ransac_test.cpp:84-205``; octave oracle `PWNTest.m`):
render depth images of an analytic scene from two known viewpoints, convert,
align, compare to ground truth.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_frontend_tpu.ops.eigh3x3 import eigh3x3, eigvals3x3
from g2o_frontend_tpu.ops.integral_image import integral_image, window_sums
from g2o_frontend_tpu.pwn.aligner import AlignerConfig, align
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn.projector import PinholeProjector

rng = np.random.default_rng(7)

H, W = 120, 160
PROJ = PinholeProjector(rows=H, cols=W, fx=130.0, fy=130.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                        min_distance=0.1, max_distance=10.0)

# A "room corner": three planes n.x = d with distinct normals, all inside
# the camera frustum (half-FOV ~31 deg horizontal, ~25 deg vertical).
PLANES = [
    (np.array([0.0, 0.0, -1.0]), -2.5),   # back wall z = 2.5
    (np.array([-1.0, 0.0, 0.0]), -1.2),   # right wall x = 1.2
    (np.array([0.0, -1.0, 0.0]), -0.9),   # floor y = 0.9
]


def render_depth(T_wc, proj=PROJ):
    """Ray-cast the plane scene from camera pose T_wc (camera->world)."""
    vs, us = np.meshgrid(np.arange(proj.rows), np.arange(proj.cols), indexing="ij")
    dirs = np.stack(
        [(us - proj.cx) / proj.fx, (vs - proj.cy) / proj.fy, np.ones_like(us, float)],
        -1,
    )
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    dirs_w = dirs @ R.T
    depth = np.full((proj.rows, proj.cols), np.inf)
    for n, d in PLANES:
        denom = dirs_w @ n
        num = d - t @ n
        z = np.where(np.abs(denom) > 1e-9, num / denom, np.inf)
        z = np.where(z > 0.05, z, np.inf)
        depth = np.minimum(depth, z)
    depth[~np.isfinite(depth)] = 0.0
    return jnp.asarray(depth, jnp.float32)


CFG = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12,
                      world_radius=0.15)


class TestEigh3x3:
    def test_matches_numpy(self):
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)
        lam, V = eigh3x3(jnp.asarray(A))
        lam_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(lam), lam_np, rtol=2e-4, atol=2e-4)
        # eigenvector property: A v = lam v
        for k in range(3):
            Av = np.einsum("bij,bj->bi", A, np.asarray(V)[..., k])
            lv = np.asarray(lam)[:, k, None] * np.asarray(V)[..., k]
            np.testing.assert_allclose(Av, lv, atol=5e-3)

    def test_diagonal(self):
        A = jnp.diag(jnp.array([3.0, 1.0, 2.0]))[None]
        lam = eigvals3x3(A)
        np.testing.assert_allclose(np.asarray(lam)[0], [1.0, 2.0, 3.0], atol=1e-5)


class TestIntegralImage:
    def test_window_sum_matches_bruteforce(self):
        x = jnp.asarray(rng.normal(size=(10, 12, 2)), jnp.float32)
        I = integral_image(x)
        S = np.asarray(window_sums(I, 2))
        xn = np.asarray(x)
        for i in (0, 3, 9):
            for j in (0, 5, 11):
                want = xn[max(0, i - 2) : i + 3, max(0, j - 2) : j + 3].sum((0, 1))
                np.testing.assert_allclose(S[i, j], want, rtol=1e-4, atol=1e-4)


class TestConverter:
    def test_plane_normals(self):
        depth = render_depth(np.eye(4))
        cloud = depth_to_cloud(depth, PROJ, CFG)
        nrm = np.asarray(cloud.normals)
        val = np.asarray(cloud.valid)
        assert val.sum() > 0.9 * H * W
        # center pixel looks at the back wall: normal ~ (0,0,-1)
        c = nrm[H // 2, W // 2]
        np.testing.assert_allclose(c, [0, 0, -1], atol=0.05)
        # curvature near zero on the wall interior
        assert float(cloud.curvature[H // 2, W // 2]) < 0.01
        # omega_p strongest along the normal direction
        om = np.asarray(cloud.omega_p[H // 2, W // 2])
        v = np.array([0.0, 0.0, 1.0])
        along = v @ om @ v
        across = np.array([1.0, 0, 0]) @ om @ np.array([1.0, 0, 0])
        assert along > 50 * across

    def test_unproject_project_roundtrip(self):
        depth = render_depth(np.eye(4))
        pts, valid = PROJ.unproject(depth)
        d2, idx = PROJ.project(pts, valid)
        d2 = np.asarray(d2)
        dn = np.asarray(depth)
        mask = np.asarray(valid) & (d2 > 0)
        assert mask.mean() > 0.9
        np.testing.assert_allclose(d2[mask], dn[mask], rtol=1e-4)


class TestAligner:
    @pytest.mark.parametrize(
        "tvec,rotdeg",
        [
            ((0.05, -0.03, 0.08), 0.0),
            ((0.0, 0.0, 0.0), 4.0),
            ((0.06, 0.04, -0.05), 3.0),
        ],
    )
    def test_recovers_known_transform(self, tvec, rotdeg):
        from g2o_frontend_tpu.utils import lie

        # camera A at identity; camera B displaced by T_gt (B pose in A frame)
        th = np.deg2rad(rotdeg)
        axis = np.array([0.3, 1.0, 0.2])
        axis /= np.linalg.norm(axis)
        w = axis * th
        T_gt = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([tvec, w]), jnp.float32)))

        depth_ref = render_depth(np.eye(4))
        depth_cur = render_depth(T_gt)  # current camera pose in world/ref frame
        ref = depth_to_cloud(depth_ref, PROJ, CFG)
        cur = depth_to_cloud(depth_cur, PROJ, CFG)

        res = align(ref, cur, PROJ, config=AlignerConfig(outer_iterations=10))
        T_est = np.asarray(res.T)
        # align returns T mapping current-frame points to reference-frame: T_gt
        err = np.linalg.inv(T_gt) @ T_est
        t_err = np.linalg.norm(err[:3, 3])
        r_err = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
        assert t_err < 0.01, (t_err, T_est, T_gt)
        assert r_err < np.deg2rad(0.5), r_err
        assert int(res.inliers) > 3000
        assert bool(res.valid)

    def test_se3_prior_pulls_solution(self):
        """Priors enter the GN system as in ``aligner.cpp:96-108``: a
        zero-information prior is a no-op; an overwhelming relative prior at
        a wrong transform drags the estimate toward it."""
        from g2o_frontend_tpu.pwn.aligner import SE3Prior, absolute_prior
        from g2o_frontend_tpu.utils import lie

        xi = np.array([0.05, -0.03, 0.08, 0.0, 0.0, 0.0], np.float32)
        T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        ref = depth_to_cloud(render_depth(np.eye(4)), PROJ, CFG)
        cur = depth_to_cloud(render_depth(T_gt), PROJ, CFG)
        cfg = AlignerConfig(outer_iterations=10)

        base = np.asarray(align(ref, cur, PROJ, config=cfg).T)

        # zero information -> identical result
        p0 = SE3Prior(jnp.eye(4, dtype=jnp.float32), jnp.zeros((6, 6), jnp.float32))
        same = np.asarray(align(ref, cur, PROJ, config=cfg, priors=p0).T)
        np.testing.assert_allclose(same, base, atol=1e-5)

        # overwhelming prior at a wrong transform dominates the data term.
        # error = t2v(invT @ M) = 0 at invT = M^-1, i.e. T = M.
        T_wrong = np.asarray(
            lie.se3_exp(jnp.asarray([0.3, 0.1, -0.2, 0.02, 0.0, 0.0], jnp.float32))
        )
        p1 = SE3Prior(jnp.asarray(T_wrong), 1e12 * jnp.eye(6, dtype=jnp.float32))
        pulled = np.asarray(align(ref, cur, PROJ, config=cfg, priors=p1).T)
        np.testing.assert_allclose(pulled, T_wrong, atol=5e-3)

        # absolute prior reduces to the relative form with the remapped mean
        ap = absolute_prior(jnp.asarray(T_wrong), jnp.asarray(T_wrong @ T_wrong),
                            1e12 * jnp.eye(6, dtype=jnp.float32))
        pulled2 = np.asarray(align(ref, cur, PROJ, config=cfg, priors=ap).T)
        np.testing.assert_allclose(pulled2, T_wrong, atol=5e-3)

        # batched priors: two moderate priors at the same mean == accumulating
        pb = SE3Prior(
            jnp.stack([jnp.asarray(T_wrong)] * 2),
            jnp.stack([1e6 * jnp.eye(6, dtype=jnp.float32)] * 2),
        )
        batched = np.asarray(align(ref, cur, PROJ, config=cfg, priors=pb).T)
        assert np.isfinite(batched).all()

    def test_identity_alignment(self):
        depth = render_depth(np.eye(4))
        ref = depth_to_cloud(depth, PROJ, CFG)
        res = align(ref, ref, PROJ, config=AlignerConfig(outer_iterations=3))
        T = np.asarray(res.T)
        np.testing.assert_allclose(T, np.eye(4), atol=1e-3)
        assert bool(res.valid)


def test_make_thumbnails():
    """pwn_matcher_base.h:48-53: scaled depth + normal-RGB renders."""
    from g2o_frontend_tpu.slam.pwn_matcher import make_thumbnails

    depth = render_depth(np.eye(4))
    cloud = depth_to_cloud(depth, PROJ, CFG)
    d_th, n_rgb = make_thumbnails(cloud, PROJ, scale=4)
    assert d_th.shape == (PROJ.rows // 4, PROJ.cols // 4)
    assert n_rgb.shape == (PROJ.rows // 4, PROJ.cols // 4, 3)
    assert n_rgb.dtype == jnp.uint8
    d = np.asarray(d_th)
    assert (d > 0).mean() > 0.5
    rgb = np.asarray(n_rgb)
    assert rgb[d > 0].std() > 1.0  # normal-coded colors vary across planes
