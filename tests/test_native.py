"""Native C++ parser: parity with the Python parser on bundled datasets."""
import os
import time

import numpy as np
import pytest

from g2o_frontend_tpu.io.g2o import read_g2o
from g2o_frontend_tpu.native import load_library

DATA = "/root/reference/datasets/2D"

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native toolchain unavailable"
)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="datasets missing")
class TestNativeParity:
    @pytest.mark.parametrize(
        "fname",
        ["graphSE2.g2o", "world-2000-full.g2o.gz", "victoriaPark-noassoc.g2o.gz"],
    )
    def test_matches_python_parser(self, fname):
        path = os.path.join(DATA, fname)
        a = read_g2o(path, native=True)
        b = read_g2o(path, native=False)
        np.testing.assert_array_equal(a.se2_ids, b.se2_ids)
        np.testing.assert_allclose(a.se2_poses, b.se2_poses, rtol=1e-12)
        np.testing.assert_array_equal(a.edge_se2_ij, b.edge_se2_ij)
        np.testing.assert_allclose(a.edge_se2_meas, b.edge_se2_meas, rtol=1e-12)
        np.testing.assert_allclose(a.edge_se2_info, b.edge_se2_info, rtol=1e-12)
        np.testing.assert_array_equal(a.xy_ids, b.xy_ids)
        np.testing.assert_allclose(a.edge_se2xy_info, b.edge_se2xy_info, rtol=1e-12)
        np.testing.assert_array_equal(a.fixed_ids, b.fixed_ids)
        np.testing.assert_allclose(a.features, b.features, rtol=1e-12)
        assert len(a.laser_scans) == len(b.laser_scans)
        if a.laser_scans:
            np.testing.assert_allclose(
                a.laser_scans[0].ranges, b.laser_scans[0].ranges, rtol=1e-6
            )
            assert a.laser_scans[0].vertex_id == b.laser_scans[0].vertex_id
            np.testing.assert_allclose(
                a.laser_scans[-1].offset, b.laser_scans[-1].offset, atol=1e-9
            )

    def test_native_is_faster(self):
        path = os.path.join(DATA, "victoriaPark-full.g2o.gz")
        t0 = time.perf_counter()
        read_g2o(path, native=True)
        t_nat = time.perf_counter() - t0
        t0 = time.perf_counter()
        read_g2o(path, native=False)
        t_py = time.perf_counter() - t0
        assert t_nat < t_py, (t_nat, t_py)


def test_native_parses_line_records():
    """Native tokenizer covers the g2o_line_addons records (ABI v2)."""
    import numpy as np

    from g2o_frontend_tpu.io.g2o import read_g2o

    path = "/root/reference/datasets/2D/martina/newtest_segway1_no_bag/aligned_unmerged.g2o"
    if not os.path.isfile(path):
        import pytest

        pytest.skip("dataset missing")
    a = read_g2o(path, native=True)
    b = read_g2o(path, native=False)
    assert len(a.line2d_ids) == 166
    np.testing.assert_allclose(a.line2d_params, b.line2d_params)
    np.testing.assert_array_equal(a.line2d_endpoints, b.line2d_endpoints)
    np.testing.assert_allclose(a.extreme_points, b.extreme_points)
    np.testing.assert_allclose(a.edge_se2line_info, b.edge_se2line_info)
    np.testing.assert_allclose(a.edge_linexy_meas, b.edge_linexy_meas)
