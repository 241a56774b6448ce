"""boss log tools CLI + depth calibration tests."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.apps.boss_tools import main as boss_main
from g2o_frontend_tpu.io import boss
from g2o_frontend_tpu.pwn.calibration import DepthCalibration
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth


def _write_log(path):
    with boss.Serializer(str(path)) as s:
        for k in range(6):
            s.write({"#class": "Msg", "topic": "/a", "timestamp": float(k)})
            s.write({"#class": "Msg", "topic": "/b", "timestamp": float(k) + 0.01})


class TestBossTools:
    def test_inspect(self, tmp_path, capsys):
        p = tmp_path / "log.boss"
        _write_log(p)
        assert boss_main(["inspect", str(p)]) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["objects"] == 12

    def test_sync(self, tmp_path, capsys):
        p = tmp_path / "log.boss"
        out_p = tmp_path / "synced.boss"
        _write_log(p)
        assert (
            boss_main(
                ["sync", str(p), "-o", str(out_p), "-t", "/a", "-t", "/b",
                 "--dt", "0.05"]
            )
            == 0
        )
        out = json.loads(capsys.readouterr().out.strip())
        assert out["frames"] == 6
        objs = boss.Deserializer(str(out_p)).read_all()
        assert len(objs) == 6

    def test_playback(self, tmp_path, capsys):
        p = tmp_path / "log.boss"
        _write_log(p)
        assert boss_main(["playback", str(p), "--rate", "0"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 12
        ts = [json.loads(l)["t"] for l in lines]
        assert ts == sorted(ts)


class TestDepthCalibration:
    def test_recovers_known_bias_with_known_plane(self):
        proj = default_projector(H=96, W=128)
        calib = DepthCalibration(proj)
        # biased sensor viewing the KNOWN back wall z=2.5 (n=(0,0,1), d=2.5)
        bias = 1.0 / 1.05
        T = np.eye(4)
        true_depth = np.asarray(render_planes_depth(T, proj))
        # keep only the back-wall pixels to match the known plane
        wall = np.abs(true_depth * 1.0 - 2.5 / np.maximum(1e-9, 1.0)) < 10  # all
        measured = true_depth * bias
        frac = calib.add_frame(measured, plane=(np.array([0.0, 0.0, 1.0]), 2.5))
        assert frac > 0.1
        cimg = calib.calibration_image
        observed = calib._count > 0
        assert np.abs(np.median(cimg[observed]) - 1.05) < 0.01
        corrected = np.asarray(calib.apply(measured))
        sel = observed & (true_depth > 0.1)
        err = np.abs(corrected - true_depth)[sel]
        assert np.median(err / true_depth[sel]) < 0.01

    def test_self_fit_removes_relative_distortion(self):
        proj = default_projector(H=96, W=128)
        calib = DepthCalibration(proj)
        # spatially-varying distortion: left half reads 3% short
        T = np.eye(4)
        true_depth = np.asarray(render_planes_depth(T, proj))
        distort = np.ones_like(true_depth)
        distort[:, : proj.cols // 2] = 0.97
        calib.add_frame(true_depth * distort)
        cimg = calib.calibration_image
        obs = calib._count > 0
        left = cimg[:, : proj.cols // 2][obs[:, : proj.cols // 2]]
        right = cimg[:, proj.cols // 2 :][obs[:, proj.cols // 2 :]]
        if len(left) > 100 and len(right) > 100:
            # left multiplier must exceed right (corrects the short reads)
            assert np.median(left) > np.median(right)

    def test_save_load(self, tmp_path):
        proj = default_projector(H=48, W=64)
        calib = DepthCalibration(proj)
        calib._ratio_sum[:] = 2.1
        calib._count[:] = 2
        p = tmp_path / "calib.npz"
        calib.save(str(p))
        c2 = DepthCalibration.load(str(p), proj)
        np.testing.assert_allclose(c2.calibration_image, 1.05, atol=1e-6)
