"""boss serialization + config pipeline tests.

Round-trip pattern follows the reference's own samples
(``boss_apps/boss_sample.cpp:41``); the parity test reads the ACTUAL
reference pipeline config shipped in-tree."""
import os
from dataclasses import dataclass

import numpy as np
import pytest

from g2o_frontend_tpu.io import boss

REF_CONF = "/root/reference/g2o_frontend/pwn_tracker2/conf/pwn_slam_catacombs_gui.conf"


@boss.register
@dataclass
class _Inner:
    value: float = 0.0


@boss.register
@dataclass
class _Outer:
    name: str = ""
    child: object = None
    gains: object = None


class TestRoundTrip:
    def test_pointer_resolution(self, tmp_path):
        inner = _Inner(value=3.5)
        outer = _Outer(name="root", child=inner, gains=np.array([1.0, 2.0, 3.0]))
        p = tmp_path / "log.boss"
        with boss.Serializer(str(p)) as s:
            s.write(outer)
        objs = boss.Deserializer(str(p)).read_all()
        o = next(x for x in objs if isinstance(x, _Outer))
        assert isinstance(o.child, _Inner)
        assert o.child.value == 3.5
        np.testing.assert_allclose(np.asarray(o.gains), [1.0, 2.0, 3.0])

    def test_large_array_goes_to_blob(self, tmp_path):
        big = np.arange(1000, dtype=np.float32)
        outer = _Outer(name="blobby", gains=big)
        p = tmp_path / "log.boss"
        with boss.Serializer(str(p)) as s:
            s.write(outer)
        objs = boss.Deserializer(str(p)).read_all()
        o = next(x for x in objs if isinstance(x, _Outer))
        assert isinstance(o.gains, boss.BlobRef)
        np.testing.assert_allclose(o.gains.get(), big)

    def test_unknown_class_kept_as_dict(self, tmp_path):
        p = tmp_path / "log.boss"
        p.write_text('"TotallyUnknown" { "#id" : 0, "x" : 5 }\n')
        objs = boss.Deserializer(str(p)).read_all()
        assert objs[0]["#class"] == "TotallyUnknown"
        assert objs[0]["x"] == 5

    def test_malformed_line_raises(self, tmp_path):
        p = tmp_path / "bad.boss"
        p.write_text("not a boss line\n")
        with pytest.raises(ValueError):
            boss.Deserializer(str(p)).read_all()


@pytest.mark.skipif(not os.path.isfile(REF_CONF), reason="reference conf missing")
class TestReferenceConfParity:
    """The shipped reference pipeline config must wire OUR components."""

    def test_load_catacombs_pipeline(self):
        from g2o_frontend_tpu.pwn.pipeline import load_pipeline

        pipe = load_pipeline(REF_CONF)
        # values straight from the conf file lines
        assert pipe.aligner_config.outer_iterations == 10
        assert pipe.aligner_config.inner_iterations == 1
        assert pipe.aligner_config.inlier_max_chi2 == 9000
        assert pipe.aligner_config.inlier_distance_threshold == 3
        assert pipe.aligner_config.inlier_normal_angular_threshold == 0.95
        assert pipe.scale == 4
        assert pipe.projector.fx == 525
        assert pipe.projector.cx == 319.5
        assert pipe.converter_config.world_radius == 0.1
        assert pipe.converter_config.min_image_radius == 3
        assert pipe.converter_config.max_image_radius == 6
        assert pipe.converter_config.min_points == 10
        # image dims: conf declares 640 rows x 480 cols (swapped); the
        # camera center (319.5, 239.5) disambiguates to 480x640
        assert (pipe.projector.rows, pipe.projector.cols) == (480, 640)
        s = pipe.scaled_projector()
        assert (s.rows, s.cols) == (120, 160)
        assert s.fx == 525 / 4

    def test_named_objects_exposed(self):
        from g2o_frontend_tpu.pwn.pipeline import load_pipeline

        pipe = load_pipeline(REF_CONF)
        names = pipe.extras["by_name"]
        assert "myTracker" in names or "mySLAMPipeline" in names
