"""Visit-list walk kernel (interpret mode on CPU): must be bit-identical to
the brute/culled kernels in every precision mode, tile size, and query shape
— the walk changes *which tiles are evaluated and in what order*, never the
result (tie-breaks are preserved by the (t, idx) lexicographic running min)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.scene import (flatten_scene, load_hrt,
                                   random_soup_scene)

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"


def _rays(n, rng, extent=40.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_same(a, b):
    ta, ia = map(np.asarray, a)
    tb, ib = map(np.asarray, b)
    same_t = (ta == tb) | (np.isinf(ta) & np.isinf(tb))
    assert same_t.all(), f"{(~same_t).sum()} t mismatches"
    assert (ia == ib).all(), f"{(ia != ib).sum()} idx mismatches"


@pytest.mark.parametrize("walk", ["resident", "dma"])
@pytest.mark.parametrize("precision", ["highest", "exact1"])
@pytest.mark.parametrize("block_tris", [32, 128])
def test_walk_bit_exact_canyon(rng, precision, block_tris, walk):
    tris = flatten_scene(load_hrt(CANYON))
    o, d = _rays(1024, rng)
    excl = jnp.asarray(rng.integers(-1, 234, 1024), jnp.int32)
    ref = pallas_intersect(o, d, tris, block_rays=256, block_tris=block_tris,
                           interpret=True, precision=precision, exclude=excl)
    got = pallas_intersect(o, d, tris, block_rays=256, block_tris=block_tris,
                           interpret=True, precision=precision, exclude=excl,
                           walk=walk)
    _assert_same(ref, got)


@pytest.mark.parametrize("walk", ["resident", "dma"])
def test_walk_bit_exact_morton_soup(rng, walk):
    tris = flatten_scene(random_soup_scene(900, seed=3, extent=50.0),
                         sort_triangles=True)
    o, d = _rays(512, rng, extent=60.0)
    ref = pallas_intersect(o, d, tris, block_rays=256, block_tris=128,
                           interpret=True, precision="highest")
    got = pallas_intersect(o, d, tris, block_rays=256, block_tris=128,
                           interpret=True, precision="highest", walk=walk)
    _assert_same(ref, got)


@pytest.mark.parametrize("walk", ["resident", "dma"])
def test_walk_t_max_and_dead_rays(rng, walk):
    tris = flatten_scene(load_hrt(CANYON))
    R = 777  # ragged
    o, d = _rays(R, rng)
    tm = jnp.where(jnp.arange(R) % 3 == 0, -1.0,
                   jnp.where(jnp.arange(R) % 3 == 1, 1.0, 1e9)
                   ).astype(jnp.float32)
    ref = pallas_intersect(o, d, tris, block_rays=256, block_tris=64,
                           interpret=True, precision="highest", t_max=tm,
                           cull=True)
    got = pallas_intersect(o, d, tris, block_rays=256, block_tris=64,
                           interpret=True, precision="highest", t_max=tm,
                           walk=walk)
    _assert_same(ref, got)
    # dead rays (t_max < 0) report as misses
    t, idx = got
    dead = np.asarray(tm) < 0
    assert np.isinf(np.asarray(t)[dead]).all()
    assert (np.asarray(idx)[dead] == -1).all()


def test_tracer_walk_matches_default():
    """End-to-end: walk kernel through the tracer reproduces the default
    pallas path bit-for-bit on the canyon parity workload."""
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.tracer import trace_paths

    tris = flatten_scene(load_hrt(CANYON))
    mats = default_materials()
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    base = TracerConfig(num_paths=512, num_bounces=3, backend="pallas",
                        keep_rays=False)
    res0 = trace_paths(tris, mats, rx, tx, z, z, jnp.float32(3.0), base)
    res1 = trace_paths(tris, mats, rx, tx, z, z, jnp.float32(3.0),
                       TracerConfig(num_paths=512, num_bounces=3,
                                    backend="pallas", keep_rays=False,
                                    walk=True, block_tris=64))
    np.testing.assert_array_equal(np.asarray(res0.scatter.a_te),
                                  np.asarray(res1.scatter.a_te))
    np.testing.assert_array_equal(np.asarray(res0.scatter.tau),
                                  np.asarray(res1.scatter.tau))
    np.testing.assert_array_equal(np.asarray(res0.los.a_te),
                                  np.asarray(res1.los.a_te))


@pytest.mark.parametrize("group", [2, 8])
@pytest.mark.parametrize("walk", ["resident", "dma"])
def test_walk_grouped_prepass_bit_exact(rng, group, walk):
    """Hierarchical (coarse-group) prepass: visit entries name GROUPS of
    consecutive fine tiles; members re-test in-kernel.  Results must stay
    bit-identical to the brute kernel for any group size."""
    tris = flatten_scene(random_soup_scene(700, seed=11, extent=45.0),
                         sort_triangles=True)
    o, d = _rays(640, rng, extent=55.0)
    tm = jnp.where(jnp.arange(640) % 5 == 0, -1.0, 1e9).astype(jnp.float32)
    ref = pallas_intersect(o, d, tris, block_rays=256, block_tris=32,
                           interpret=True, precision="highest", t_max=tm)
    got = pallas_intersect(o, d, tris, block_rays=256, block_tris=32,
                           interpret=True, precision="highest", t_max=tm,
                           walk=walk, walk_group=group)
    _assert_same(ref, got)
