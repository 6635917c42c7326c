"""Fused Pallas bounce-shading kernel (ops/shade.py): forward bit-identity
with the canonical jnp implementation, gradient equality through the
custom_vjp, and e2e trace equality under cfg.shade="pallas"."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.ops.fresnel import precompute_eta
from hermespy_rt_tpu.ops.shade import shade_a, shade_a_jnp
from hermespy_rt_tpu.scene import flatten_scene, load_hrt
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"


def _random_args(rng, R=700):
    tris = flatten_scene(load_hrt(CANYON))
    idx = rng.integers(0, int(tris.num_triangles), R)
    hit = dict(v0=np.asarray(tris.v0)[idx], e1=np.asarray(tris.e1)[idx],
               e2=np.asarray(tris.e2)[idx],
               normal=np.asarray(tris.normal)[idx],
               velocity=rng.normal(size=(R, 3)).astype(np.float32))
    eta_all = precompute_eta(default_materials(), 3.0)
    mat = np.asarray(tris.material)[idx]
    eta = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[mat]), eta_all)
    o = rng.uniform(-30, 30, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # place origins so the ray actually crosses its triangle plane sometimes
    amps = [rng.normal(size=R).astype(np.float32) for _ in range(4)]
    tau = np.abs(rng.normal(size=R)).astype(np.float32) * 1e-7
    freq = rng.normal(size=R).astype(np.float32)
    # live only on well-conditioned pairs: a real tracer "live" ray hit its
    # triangle (det bounded away from 0); random pairs with det ~ 0 amplify
    # 1-ulp t differences into arbitrarily large hit-point deltas
    det = np.einsum("ij,ij->i", hit["e1"],
                    np.cross(d, hit["e2"])).astype(np.float32)
    live = (rng.random(R) < 0.8) & (np.abs(det) > 1e-2)
    hit = {k: jnp.asarray(v) for k, v in hit.items()}
    return (jnp.asarray(o), jnp.asarray(d), *map(jnp.asarray, amps),
            jnp.asarray(tau), jnp.asarray(freq), jnp.asarray(live), hit,
            eta, jnp.float32(125.6), jnp.float32(10.0))


def test_shade_a_matches_jnp(rng):
    """Forward values match the canonical jnp chain to 1-2 ulp (identical
    op sequence; XLA vs Mosaic differ only in fma contraction choices)."""
    args = _random_args(rng)
    ref = shade_a_jnp(*args)
    got = shade_a(*args)
    for i, (a, b) in enumerate(zip(ref, got)):
        a, b = np.asarray(a), np.asarray(b)
        # tolerance on the ROW magnitude: a 1-ulp difference in the fma
        # contraction of t amplifies into |t*d|-scale absolute deltas on
        # hit-point components that cross zero
        scale = np.abs(a)
        if a.ndim == 2:
            scale = np.broadcast_to(scale.max(axis=-1, keepdims=True),
                                    a.shape)
        # 1-D chains (amplitudes) add complex-product cancellation on top
        tol = 1e-6 if a.ndim == 2 else 1e-5
        ok = np.abs(a - b) <= tol * scale + 1e-12
        assert ok.all(), (f"output {i}: {(~ok).sum()} beyond tol*rowscale; "
                          f"max {(np.abs(a - b) / (scale + 1e-30)).max()}")


def test_shade_a_grads_match(rng):
    args = _random_args(rng, R=300)

    def loss(f, eta, args):
        out = f(*args[:10], eta, *args[11:])
        # mix several outputs so every chain carries cotangents
        return (jnp.sum(out[2] ** 2) + jnp.sum(out[3] ** 2)
                + jnp.sum(out[4] ** 2) + jnp.sum(out[5] ** 2)
                + jnp.sum(out[6]) * 1e6 + jnp.sum(out[0] ** 2) * 1e-3)

    g_ref = jax.grad(lambda e: loss(shade_a_jnp, e, args))(args[10])
    g_got = jax.grad(lambda e: loss(shade_a, e, args))(args[10])
    # the custom_vjp backward IS the jnp vjp: same math at (ulp-close)
    # primals; cotangents seeded by the ulp-close pallas outputs
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("parity", ["reference", "physical"])
def test_trace_shade_pallas_matches(parity):
    tris = flatten_scene(load_hrt(CANYON))
    mats = default_materials()
    rx = np.array([[10.0, 5.0, 2.0]], np.float32)
    tx = np.array([[-20.0, -10.0, 10.0]], np.float32)
    z = np.zeros((1, 3), np.float32)
    kw = dict(num_paths=512, num_bounces=3, keep_rays=False, parity=parity)
    r0 = trace_paths(tris, mats, rx, tx, z, z, 3.0, TracerConfig(**kw))
    r1 = trace_paths(tris, mats, rx, tx, z, z, 3.0,
                     TracerConfig(shade="pallas", **kw))
    for field in ("a_te", "a_tm", "tau", "freq_shift", "directions_rx"):
        a = np.asarray(getattr(r0.scatter, field))
        b = np.asarray(getattr(r1.scatter, field))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-11,
                                   err_msg=field)


def test_trace_shade_pallas_grads():
    tris = flatten_scene(load_hrt(CANYON))
    mats = default_materials()
    rx = np.array([[10.0, 5.0, 2.0]], np.float32)
    tx = np.array([[-20.0, -10.0, 10.0]], np.float32)
    z = np.zeros((1, 3), np.float32)

    def loss(m, shade):
        cfg = TracerConfig(num_paths=256, num_bounces=2, keep_rays=False,
                           shade=shade)
        r = trace_paths(tris, m, rx, tx, z, z, 3.0, cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9

    v0, g0 = jax.value_and_grad(loss)(mats, "xla")
    v1, g1 = jax.value_and_grad(loss)(mats, "pallas")
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-30)
