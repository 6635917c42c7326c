"""Multi-device SPMD tests on the 8-way virtual CPU mesh (SURVEY.md §4:
portable single-process simulation of a pod slice)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.parallel import default_mesh, trace_paths_sharded
from hermespy_rt_tpu.scene import flatten_scene, box_scene, random_soup_scene
from hermespy_rt_tpu.tracer import trace_paths

CFG = TracerConfig(num_paths=512, num_bounces=2, backend="jnp",
                   keep_rays=True)
RX = np.array([[1.0, 2.0, 1.5]], np.float32)
TX = np.array([[-2.0, -1.0, 2.5]], np.float32)
Z = np.zeros((1, 3), np.float32)


@pytest.fixture(scope="module")
def tris():
    return flatten_scene(box_scene())


@pytest.fixture(scope="module")
def baseline(tris):
    return trace_paths(tris, default_materials(), RX, TX, Z, Z, 3.0, CFG)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(tris, baseline, mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    mesh = default_mesh(*mesh_shape)
    res = trace_paths_sharded(tris, default_materials(), RX, TX, Z, Z, 3.0,
                              CFG, mesh=mesh)
    for field in ("a_te", "a_tm", "tau", "freq_shift", "directions_rx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(baseline.scatter, field)),
            np.asarray(getattr(res.scatter, field)), err_msg=field)
    np.testing.assert_array_equal(np.asarray(baseline.los.a_te),
                                  np.asarray(res.los.a_te))
    np.testing.assert_array_equal(
        np.asarray(baseline.rays_scatter.active),
        np.asarray(res.rays_scatter.active))


def test_sharded_gradients_match(tris):
    """Material gradients psum across ray shards must equal the single-device
    gradients (the all-reduce correctness check)."""
    cfg = TracerConfig(num_paths=256, num_bounces=2, backend="jnp",
                       keep_rays=False)
    mats = default_materials()

    def loss_single(m):
        r = trace_paths(tris, m, RX, TX, Z, Z, 3.0, cfg)
        return jnp.sum(jnp.abs(r.scatter.a_te) ** 2) * 1e9

    def loss_sharded(m):
        r = trace_paths_sharded(tris, m, RX, TX, Z, Z, 3.0, cfg,
                                mesh=default_mesh(8, 1))
        return jnp.sum(jnp.abs(r.scatter.a_te) ** 2) * 1e9

    g1 = jax.grad(loss_single)(mats)
    g2 = jax.grad(loss_sharded)(mats)
    for f in ("a", "c", "s", "s1_alpha"):
        np.testing.assert_allclose(np.asarray(getattr(g1, f)),
                                   np.asarray(getattr(g2, f)),
                                   rtol=1e-5, atol=1e-12, err_msg=f)


def test_tri_sharded_gradients_match():
    """Triangle-sharded mode: gradients w.r.t. materials through the masked
    psum payload fetch must match the replicated path."""
    tris = flatten_scene(random_soup_scene(300, seed=2), pad_to=128)
    cfg = TracerConfig(num_paths=256, num_bounces=2, backend="jnp",
                       keep_rays=False)
    mats = default_materials()
    rx = np.array([[5.0, 5.0, 5.0]], np.float32)
    tx = np.array([[-5.0, -5.0, 5.0]], np.float32)

    def loss_single(m):
        r = trace_paths(tris, m, rx, tx, Z, Z, 3.0, cfg)
        return jnp.sum(jnp.abs(r.scatter.a_te) ** 2) * 1e9

    def loss_sharded(m):
        r = trace_paths_sharded(tris, m, rx, tx, Z, Z, 3.0, cfg,
                                mesh=default_mesh(2, 4))
        return jnp.sum(jnp.abs(r.scatter.a_te) ** 2) * 1e9

    np.testing.assert_allclose(float(loss_single(mats)),
                               float(loss_sharded(mats)), rtol=1e-6)
    g1 = jax.grad(loss_single)(mats)
    g2 = jax.grad(loss_sharded)(mats)
    for f in ("a", "c", "s"):
        np.testing.assert_allclose(np.asarray(getattr(g1, f)),
                                   np.asarray(getattr(g2, f)),
                                   rtol=1e-4, atol=1e-12, err_msg=f)


def test_multi_tx_sharded(tris):
    cfg = TracerConfig(num_paths=256, num_bounces=2, backend="jnp")
    tx = np.array([[-2.0, -1.0, 2.5], [2.0, 1.0, 1.5]], np.float32)
    rx = np.array([[1.0, 2.0, 1.5], [0.0, 0.0, 3.0]], np.float32)
    z2 = np.zeros((2, 3), np.float32)
    base = trace_paths(tris, default_materials(), rx, tx, z2, z2, 3.0, cfg)
    res = trace_paths_sharded(tris, default_materials(), rx, tx, z2, z2, 3.0,
                              cfg, mesh=default_mesh(8, 1))
    np.testing.assert_array_equal(np.asarray(base.scatter.a_te),
                                  np.asarray(res.scatter.a_te))


def test_mesh_validation(tris):
    with pytest.raises(ValueError):
        default_mesh(16, 1)  # more shards than devices
    cfg = TracerConfig(num_paths=100, num_bounces=1, backend="jnp")
    with pytest.raises(ValueError):
        # 100 rays not divisible over 8 shards
        trace_paths_sharded(tris, default_materials(), RX, TX, Z, Z, 3.0,
                            cfg, mesh=default_mesh(8, 1))
