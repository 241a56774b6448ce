"""Profiling utilities: device_time sanity + cumulative timer."""
import jax.numpy as jnp
import numpy as np

from g2o_frontend_tpu.utils.profiling import CumulativeTimer, device_time


def test_device_time_scales_with_work():
    a_small = jnp.ones((64, 64), jnp.float32)
    a_big = jnp.ones((512, 512), jnp.float32)

    def work(x):
        return x @ x

    t_small = device_time(work, [a_small], n=40)
    t_big = device_time(work, [a_big], n=40)
    # 512^3 / 64^3 = 512x the flops; demand at least a 3x time ratio
    # (tiny matmuls are overhead-bound, so the bound is loose)
    assert t_big > 0
    assert t_big > 3 * max(t_small, 0.0)


def test_cumulative_timer():
    t = CumulativeTimer()
    for _ in range(3):
        with t():
            sum(range(1000))
    assert t.num_calls == 3
    assert t.cum_time > 0
    assert np.isclose(t.mean, t.cum_time / 3)
