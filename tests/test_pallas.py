"""Pallas intersection kernel tests (interpret mode on CPU): must agree with
the jnp reference implementation on hit decisions and distances."""
import numpy as np
import jax.numpy as jnp
import pytest

from hermespy_rt_tpu.ops.intersect import intersect_jnp
from hermespy_rt_tpu.ops.intersect_pallas import make_pallas_intersect
from hermespy_rt_tpu.scene import (box_scene, flatten_scene,
                                   random_soup_scene, simple_reflector_scene)
from tests.utils import assert_flips_explained


def _compare(soa, o, d):
    """Kernel-vs-jnp agreement under the flip taxonomy: every disagreeing
    ray must be a provable epsilon-edge/tie case (tests/utils.py)."""
    t1, i1 = intersect_jnp(jnp.asarray(o), jnp.asarray(d), soa)
    fn = make_pallas_intersect(soa, interpret=True)
    t2, i2 = fn(jnp.asarray(o), jnp.asarray(d))
    t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
    assert_flips_explained(soa, o, d, t1, i1, t2, i2, label="kernel-vs-jnp")
    m = (i1 == i2) & (i1 >= 0)
    np.testing.assert_allclose(t2[m], t1[m], rtol=2e-5)


def test_kernel_matches_jnp_soup(rng):
    soa = flatten_scene(random_soup_scene(300, seed=7), pad_to=128)
    R = 2048
    o = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(soa, o, d)


def test_kernel_matches_jnp_box(rng):
    soa = flatten_scene(box_scene(), pad_to=128)
    R = 1024
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(0.5, 4.5, R)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(soa, o, d)


def test_kernel_ragged_sizes():
    # R not a multiple of the tile, T small
    soa = flatten_scene(simple_reflector_scene(), pad_to=128)
    rng = np.random.default_rng(3)
    o = rng.uniform(-0.4, 0.4, (777, 3)).astype(np.float32)
    o[:, 2] = 1.0
    d = np.tile(np.array([0, 0, -1.0], np.float32), (777, 1))
    fn = make_pallas_intersect(soa, interpret=True)
    t, idx = fn(jnp.asarray(o), jnp.asarray(d))
    assert t.shape == (777,)
    assert np.all(np.asarray(idx) >= 0)
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-6)


def test_kernel_miss_semantics():
    soa = flatten_scene(box_scene(), pad_to=128)
    o = np.tile(np.array([0, 0, 10.0], np.float32), (256, 1))
    d = np.tile(np.array([0, 0, 1.0], np.float32), (256, 1))
    fn = make_pallas_intersect(soa, interpret=True)
    t, idx = fn(jnp.asarray(o), jnp.asarray(d))
    assert np.all(np.asarray(idx) == -1)
    assert not np.any(np.isfinite(np.asarray(t)))


def test_kernel_multi_tri_tiles(rng):
    # force several triangle tiles to exercise the running-min accumulator
    soa = flatten_scene(random_soup_scene(1000, seed=11), pad_to=128)
    R = 512
    o = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t1, i1 = intersect_jnp(jnp.asarray(o), jnp.asarray(d), soa)
    fn = make_pallas_intersect(soa, block_tris=128, interpret=True)
    t2, i2 = fn(jnp.asarray(o), jnp.asarray(d))
    t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
    assert_flips_explained(soa, o, d, t1, i1, t2, i2,
                           label="multi-tile kernel-vs-jnp")


def test_culled_kernel_matches_plain(rng):
    """AABB tile culling must not change any hit decision."""
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    soa = flatten_scene(random_soup_scene(700, seed=13), pad_to=128)
    R = 1024
    o = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0, i0 = pallas_intersect(o, d, soa, interpret=True, cull=False,
                              block_tris=128)
    t1, i1 = pallas_intersect(o, d, soa, interpret=True, cull=True,
                              block_tris=128)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_t_max_range_query(rng):
    """Range-limited queries: hits beyond t_max report as misses, in both the
    plain (post-filter) and culled (in-kernel) paths."""
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    soa = flatten_scene(random_soup_scene(700, seed=17), pad_to=128)
    R = 512
    o = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_full, i_full = pallas_intersect(o, d, soa, interpret=True, cull=False)
    for cull in (False, True):
        t_lim, i_lim = pallas_intersect(o, d, soa, interpret=True, cull=cull,
                                        block_tris=128, t_max=20.0)
        want_hit = np.asarray(i_full >= 0) & (np.asarray(t_full) <= 20.0)
        assert np.array_equal(np.asarray(i_lim) >= 0, want_hit), f"cull={cull}"
        m = want_hit
        np.testing.assert_array_equal(np.asarray(i_lim)[m],
                                      np.asarray(i_full)[m])
    # per-ray t_max array
    tm = jnp.full((R,), 15.0, jnp.float32)
    t_arr, i_arr = pallas_intersect(o, d, soa, interpret=True, cull=True,
                                    block_tris=128, t_max=tm)
    want = np.asarray(i_full >= 0) & (np.asarray(t_full) <= 15.0)
    assert np.array_equal(np.asarray(i_arr) >= 0, want)


def test_precision_highest_available():
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    soa = flatten_scene(box_scene(), pad_to=128)
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = pallas_intersect(o, d, soa, interpret=True, precision="highest")
    assert int(idx[0]) >= 0


def test_tracer_with_pallas_backend_matches_jnp():
    import hermespy_rt_tpu as hrt
    rx = [[0, 0, 0.15]]
    tx = [[0, 0, 0.151]]
    z = np.zeros((1, 3))
    los_j, scat_j = hrt.compute_paths(hrt.simple_reflector_scene(), rx, tx,
                                      z, z, 3.0, 1, 1, 512, 2, backend="jnp")
    los_p, scat_p = hrt.compute_paths(hrt.simple_reflector_scene(), rx, tx,
                                      z, z, 3.0, 1, 1, 512, 2,
                                      backend="pallas")
    np.testing.assert_allclose(np.asarray(los_j.a_te), np.asarray(los_p.a_te),
                               rtol=1e-6)
    a_j, a_p = np.asarray(scat_j.a_te), np.asarray(scat_p.a_te)
    agree = ((np.abs(a_j) > 0) == (np.abs(a_p) > 0)).mean()
    assert agree > 0.995
    m = (np.abs(a_j) > 0) & (np.abs(a_p) > 0)
    np.testing.assert_allclose(a_j[m], a_p[m], rtol=1e-4,
                               atol=np.abs(a_j[m]).max() * 1e-5)


def test_tracer_pallas_gradients_finite():
    import jax
    import hermespy_rt_tpu as hrt
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.tracer import trace_paths
    tris = flatten_scene(simple_reflector_scene())
    cfg = TracerConfig(num_paths=128, num_bounces=2, backend="pallas",
                       keep_rays=False)
    rx = np.array([[0.1, 0, 0.3]], np.float32)
    tx = np.array([[0, 0.1, 0.5]], np.float32)
    z = np.zeros((1, 3), np.float32)

    def loss(mats):
        res = trace_paths(tris, mats, rx, tx, z, z, 3.0, cfg)
        return jnp.sum(jnp.abs(res.scatter.a_te) ** 2) * 1e6

    g = jax.grad(loss)(default_materials())
    assert np.isfinite(np.asarray(g.a)).all()
    assert abs(float(np.asarray(g.a)[1])) > 0

def test_exact1_matches_highest(rng):
    """The one-pass K-limb-expanded mode must reproduce exact-f32 decisions
    (up to genuine near-tie edges) and f32-grade distances."""
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    soa = flatten_scene(random_soup_scene(700, seed=23, extent=90.0,
                                          tri_size=8.0), pad_to=128)
    R = 4096
    o = rng.uniform(-80, 80, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0, i0 = map(np.asarray,
                 pallas_intersect(o, d, soa, interpret=True,
                                  precision="highest"))
    t1, i1 = map(np.asarray,
                 pallas_intersect(o, d, soa, interpret=True,
                                  precision="exact1"))
    # no hit<->miss transitions; any index flip must be a provable
    # epsilon-edge/tie case (flip taxonomy, tests/utils.py)
    assert np.array_equal(np.isfinite(t0), np.isfinite(t1))
    assert_flips_explained(soa, np.asarray(o), np.asarray(d), t0, i0, t1, i1,
                           label="exact1-vs-highest")
    m = (i0 == i1) & (i0 >= 0)
    # relative to local scale, with an absolute floor ~2^-24 * scene extent
    # for near-zero t
    np.testing.assert_allclose(t1[m], t0[m], rtol=3e-4, atol=1e-4)


def test_exact1_culled_and_range(rng):
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    soa = flatten_scene(random_soup_scene(700, seed=29), pad_to=128)
    R = 512
    o = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t0, i0 = pallas_intersect(o, d, soa, interpret=True, precision="exact1",
                              cull=False, block_tris=128)
    t1, i1 = pallas_intersect(o, d, soa, interpret=True, precision="exact1",
                              cull=True, block_tris=128)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    tm = jnp.full((R,), 15.0, jnp.float32)
    t2, i2 = pallas_intersect(o, d, soa, interpret=True, precision="exact1",
                              cull=True, block_tris=128, t_max=tm)
    want = np.asarray(i0 >= 0) & (np.asarray(t0) <= 15.0)
    assert np.array_equal(np.asarray(i2) >= 0, want)


def test_split3_bf16_exact():
    """Three bf16 limbs must reconstruct any f32 exactly."""
    from hermespy_rt_tpu.ops.intersect_pallas import _split3_bf16
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.concatenate([rng.normal(size=1000) * 10.0 ** rng.integers(-20, 20, 1000),
                        np.array([0.0, -0.0, 1.0, -1.0, 3.14159265e-30])])
        .astype(np.float32))
    h1, h2, h3 = _split3_bf16(x)
    recon = (h1.astype(jnp.float32) + h2.astype(jnp.float32)
             + h3.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(x))


def test_compact_rays_bit_exact():
    """compact_rays is a pure reordering: outputs must be bit-identical."""
    import hermespy_rt_tpu as hrt
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.tracer import trace_paths
    tris = flatten_scene(box_scene())
    mats = default_materials()
    rx = np.array([[0.5, 0.2, 1.0], [-1.0, 2.0, 0.5]], np.float32)
    tx = np.array([[0.0, 0.0, 1.5]], np.float32)
    z2 = np.zeros((2, 3), np.float32)
    z1 = np.zeros((1, 3), np.float32)
    for parity in ("reference", "physical"):
        cfg0 = TracerConfig(num_paths=512, num_bounces=3, parity=parity,
                            backend="pallas", keep_rays=False)
        cfg1 = TracerConfig(num_paths=512, num_bounces=3, parity=parity,
                            backend="pallas", keep_rays=False,
                            compact_rays=True)
        r0 = trace_paths(tris, mats, rx, tx, z2, z1, 3.0, cfg0)
        r1 = trace_paths(tris, mats, rx, tx, z2, z1, 3.0, cfg1)
        for f in ("a_te", "a_tm", "tau", "freq_shift", "directions_rx"):
            a = np.asarray(getattr(r0.scatter, f))
            b = np.asarray(getattr(r1.scatter, f))
            np.testing.assert_array_equal(a, b, err_msg=f"{parity}/{f}")
