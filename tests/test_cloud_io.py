"""`.pwn` cloud format round-trip + alignment from loaded clouds."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from g2o_frontend_tpu.pwn.cloud_io import cloud_from_pwn, load_pwn, save_pwn
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn.projector import PinholeProjector
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth

PROJ = default_projector(H=48, W=64)
CFG = ConverterConfig(min_image_radius=2, max_image_radius=5, min_points=8)


def _cloud():
    return depth_to_cloud(
        jnp.asarray(render_planes_depth(np.eye(4), PROJ)), PROJ, CFG)


def test_binary_roundtrip():
    cloud = _cloud()
    T = np.eye(4); T[:3, 3] = [0.1, -0.2, 0.3]
    with tempfile.NamedTemporaryFile(suffix=".pwn", delete=False) as fh:
        path = fh.name
    save_pwn(path, cloud, T=T, binary=True)
    d = load_pwn(path)
    valid = np.asarray(cloud.valid).reshape(-1)
    pts = np.asarray(cloud.p).reshape(3, -1).T[valid]
    np.testing.assert_allclose(d["points"], pts, rtol=1e-6)
    np.testing.assert_allclose(
        d["normals"], np.asarray(cloud.n).reshape(3, -1).T[valid], rtol=1e-5)
    np.testing.assert_allclose(
        d["eigenvalues"], np.asarray(cloud.ev).reshape(3, -1).T[valid],
        rtol=1e-5)
    np.testing.assert_allclose(d["T"], T, atol=1e-6)
    # record layout is the reference's 128 bytes/point
    n = len(d["points"])
    header = open(path, "rb").readline()
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        fh.readline(); fh.readline()
        off = fh.tell()
    assert size - off == 128 * n
    os.unlink(path)


def test_ascii_roundtrip_and_step():
    cloud = _cloud()
    with tempfile.NamedTemporaryFile(suffix=".pwn", delete=False) as fh:
        path = fh.name
    save_pwn(path, cloud, binary=False, step=3)
    d = load_pwn(path)
    valid = np.asarray(cloud.valid).reshape(-1)
    pts = np.asarray(cloud.p).reshape(3, -1).T[valid][::3]
    assert len(d["points"]) == len(pts)
    np.testing.assert_allclose(d["points"], pts, rtol=1e-4, atol=1e-5)
    os.unlink(path)


def test_cloud_from_pwn_rebuilds_omegas():
    cloud = _cloud()
    with tempfile.NamedTemporaryFile(suffix=".pwn", delete=False) as fh:
        path = fh.name
    save_pwn(path, cloud, binary=True)
    c2 = cloud_from_pwn(path, CFG)
    assert c2.p.shape[0] == 3 and c2.p.shape[1] == 1
    # omegas are PSD and strongest along the normal for flat points
    valid = np.asarray(cloud.valid).reshape(-1)
    curv = np.asarray(cloud.curv).reshape(-1)[valid]
    flat_idx = int(np.argmin(curv))
    om = np.asarray(c2.omega_p[0, flat_idx])
    nrm = np.asarray(c2.n[:, 0, flat_idx])
    if np.linalg.norm(nrm) > 0:
        along = nrm @ om @ nrm
        t = np.array([nrm[1], -nrm[0], 0.0])
        if np.linalg.norm(t) > 1e-3:
            t /= np.linalg.norm(t)
            across = t @ om @ t
            assert along > 10 * across
    os.unlink(path)
