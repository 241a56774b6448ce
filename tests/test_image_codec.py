"""Image codec + image-BLOB round trips (ImageBLOB wire compat,
``boss_map/image_sensor.cpp:17-101``)."""
import numpy as np
import pytest

from g2o_frontend_tpu.io import image_codec as ic
from g2o_frontend_tpu.io.boss import BlobRef, Deserializer, Serializer

rng = np.random.default_rng(0)


@pytest.mark.parametrize("dtype,maxv", [(np.uint8, 255), (np.uint16, 65535)])
def test_pgm_roundtrip(dtype, maxv):
    img = rng.integers(0, maxv + 1, (37, 53)).astype(dtype)
    out = ic.decode_pgm(ic.encode_pgm(img))
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, img)


def test_ppm_roundtrip():
    img = rng.integers(0, 256, (21, 34, 3)).astype(np.uint8)
    np.testing.assert_array_equal(ic.decode_ppm(ic.encode_ppm(img)), img)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_gray_roundtrip(dtype):
    maxv = np.iinfo(dtype).max
    img = rng.integers(0, int(maxv) + 1, (45, 62)).astype(dtype)
    out = ic.decode_png_gray(ic.encode_png_gray(img))
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, img)


def test_png_16bit_matches_tum_reader(tmp_path):
    """Our PNG writer must be readable by the TUM depth loader."""
    from g2o_frontend_tpu.io.tum import load_depth_png

    depth_u16 = rng.integers(0, 30000, (33, 41)).astype(np.uint16)
    p = tmp_path / "d.png"
    p.write_bytes(ic.encode_png_gray(depth_u16))
    meters = load_depth_png(str(p), depth_scale=1.0 / 5000.0)
    # f32 scale-multiply vs divide differ in the last ulp
    np.testing.assert_allclose(
        meters, depth_u16.astype(np.float32) / 5000.0, rtol=1e-6
    )


def test_boss_image_blob_roundtrip(tmp_path):
    """A boss log carrying pgm + pbm image BLOBs round-trips into arrays."""
    from dataclasses import dataclass, field

    from g2o_frontend_tpu.io.boss import register

    @register(name="test_rgbd_frame")
    @dataclass
    class RGBDFrame:
        topic: str = ""
        depth: object = None
        rgb: object = None

    depth = rng.integers(0, 40000, (24, 32)).astype(np.uint16)
    rgb = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    frame = RGBDFrame(
        topic="/camera",
        depth=BlobRef.from_array(depth),
        rgb=BlobRef.from_array(rgb),
    )
    path = str(tmp_path / "log.boss")
    ser = Serializer(path)
    ser.write(frame)
    ser.close()

    objs = list(Deserializer(path).read_all())
    got = [o for o in objs if isinstance(o, RGBDFrame)][0]
    assert got.depth.path.endswith(".pgm")
    assert got.rgb.path.endswith(".pbm")
    np.testing.assert_array_equal(got.depth.get(), depth)
    np.testing.assert_array_equal(got.rgb.get(), rgb)
