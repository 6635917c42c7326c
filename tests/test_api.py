"""Public API contract tests: output shapes exactly as the reference's Python
smoke test asserts (/root/reference/test/test.py:59-87)."""
import numpy as np
import pytest

import hermespy_rt_tpu as hrt
from tests.utils import ref_scene_path


def test_reference_shape_contract():
    num_rx, num_tx, num_paths, num_bounces = 2, 3, 100, 3
    rng = np.random.default_rng(0)
    rx = rng.uniform(-1, 1, (num_rx, 3))
    tx = rng.uniform(-1, 1, (num_tx, 3)) + np.array([0, 0, 2.0])
    z_rx, z_tx = np.zeros((num_rx, 3)), np.zeros((num_tx, 3))
    los, scatter = hrt.compute_paths(
        hrt.box_scene(), rx, tx, z_rx, z_tx, 3.0,
        num_rx, num_tx, num_paths, num_bounces, backend="jnp")

    assert los.num_rays == 1
    assert ((num_rx, num_tx, 1, 3) == los.directions_rx.shape
            == los.directions_tx.shape)
    assert ((num_rx, num_tx, 1) == los.a_te.shape == los.a_tm.shape
            == los.tau.shape == los.freq_shift.shape)

    assert scatter.num_rays == num_bounces * num_paths
    assert ((num_rx, num_tx, scatter.num_rays, 3)
            == scatter.directions_rx.shape == scatter.directions_tx.shape)
    assert ((num_rx, num_tx, scatter.num_rays) == scatter.a_te.shape
            == scatter.a_tm.shape == scatter.tau.shape
            == scatter.freq_shift.shape)
    assert np.asarray(scatter.a_te).dtype == np.complex64
    assert np.asarray(scatter.tau).dtype == np.float32


def test_accepts_float64_inputs_and_path():
    # the reference pybind forcecasts float64 -> float32 (test.py passes f64)
    p = ref_scene_path("simple_reflector.hrt")
    los, scatter = hrt.compute_paths(
        p,
        np.array([[0., 0., .15]]), np.array([[0., 0., .151]]),
        np.zeros((1, 3)), np.zeros((1, 3)), 3.0, 1, 1, 500, 2, backend="jnp")
    assert float(np.abs(np.asarray(los.a_te))[0, 0, 0]) == 1.0


def test_row_count_validation():
    with pytest.raises(ValueError):
        hrt.compute_paths(hrt.box_scene(), np.zeros((2, 3)), np.zeros((1, 3)),
                          np.zeros((2, 3)), np.zeros((1, 3)), 3.0,
                          1, 1, 10, 1)


def test_config_validation():
    with pytest.raises(ValueError):
        hrt.TracerConfig(parity="bogus")
    with pytest.raises(ValueError):
        hrt.TracerConfig(num_paths=0)
    with pytest.raises(ValueError):
        hrt.TracerConfig(backend="cuda")


def test_trace_returns_rays_info():
    res = hrt.trace(hrt.box_scene(), [[1., 1., 1.]], [[-1., -1., 2.]],
                    config=hrt.TracerConfig(num_paths=64, num_bounces=2,
                                            backend="jnp"))
    ri = res.rays_scatter
    assert ri.origins.shape == (1, 3, 64, 3)
    assert ri.active.shape == (1, 3, 64)
    assert bool(np.asarray(ri.active)[0, 0].all())
