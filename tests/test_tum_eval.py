"""TUM IO + ATE/RPE evaluation tests."""
import os
import zlib
import struct

import numpy as np
import pytest

from g2o_frontend_tpu.io import tum
from g2o_frontend_tpu.utils import evaluation


def _write_png16(path, img_u16):
    """Minimal 16-bit grayscale PNG writer (filter 0 rows)."""
    h, w = img_u16.shape
    raw = b""
    for row in img_u16:
        raw += b"\x00" + row.astype(">u2").tobytes()
    comp = zlib.compress(raw)

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return c + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", comp))
        fh.write(chunk(b"IEND", b""))


class TestTumIO:
    def test_png16_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 30000, (24, 32)).astype(np.uint16)
        p = tmp_path / "d.png"
        _write_png16(str(p), img)
        depth = tum.load_depth_png(str(p))
        np.testing.assert_allclose(depth, img.astype(np.float32) / 5000.0, atol=1e-6)

    def test_trajectory_roundtrip(self, tmp_path):
        ts = np.array([1.0, 2.0, 3.0])
        poses = np.random.default_rng(1).normal(size=(3, 7))
        p = tmp_path / "traj.txt"
        tum.write_trajectory(str(p), ts, poses)
        ts2, poses2 = tum.read_trajectory(str(p))
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        np.testing.assert_allclose(poses2, poses, atol=1e-5)

    def test_associate(self):
        a = [0.0, 1.0, 2.0]
        b = [0.01, 0.99, 5.0]
        pairs = tum.associate(a, b, max_difference=0.02)
        assert pairs == [(0, 0), (1, 1)]


class TestATE:
    def test_ate_zero_for_rigidly_moved_trajectory(self):
        rng = np.random.default_rng(2)
        ts = np.arange(50, dtype=float)
        gt = np.zeros((50, 7))
        gt[:, :3] = rng.normal(size=(50, 3)).cumsum(0)
        gt[:, 6] = 1.0
        # estimated = gt rigidly transformed (ATE with alignment -> ~0)
        th = 0.7
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        est = gt.copy()
        est[:, :3] = gt[:, :3] @ R.T + np.array([5.0, -3.0, 2.0])
        res = evaluation.ate(ts, est, ts, gt)
        assert res["pairs"] == 50
        assert res["rmse"] < 1e-3, res

    def test_ate_detects_drift(self):
        ts = np.arange(30, dtype=float)
        gt = np.zeros((30, 7))
        gt[:, 0] = np.arange(30)
        gt[:, 6] = 1.0
        est = gt.copy()
        # quadratic lateral drift: NOT removable by rigid alignment (a
        # linear drift on a straight path is just a rotation)
        est[:, 1] += np.linspace(0, 1.0, 30) ** 2 * 3.0
        res = evaluation.ate(ts, est, ts, gt)
        assert res["rmse"] > 0.1

    def test_rpe(self):
        ts = np.arange(10, dtype=float)
        gt = np.zeros((10, 7))
        gt[:, 0] = np.arange(10)
        gt[:, 6] = 1.0
        res = evaluation.rpe(ts, gt, ts, gt)
        assert res["rmse"] < 1e-9

    def test_ate_xy(self):
        gt = np.random.default_rng(3).normal(size=(20, 2))
        th = 0.4
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        est = gt @ R.T + [1.0, 2.0]
        res = evaluation.ate_xy(est, gt)
        assert res["rmse"] < 1e-4
