#!/usr/bin/env python
"""Probe 10: Morton-sorted canyon (tight tiles) — shadow window culling,
walk, and the e2e matrix with the XLA onehot gather; backward breakdown."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.scene.model import _morton_order

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P = 1 << 20
tris_u = flatten_scene(load_hrt(CANYON))
tris_s = flatten_scene(load_hrt(CANYON), sort_triangles=True)
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)

def bench(tag, fn, *args, iters=8):
    try:
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: OK compile {c:.1f}s  {dt*1e3:.3f} ms", flush=True)
        return dt, out
    except Exception as e:
        key = str(e).split("\n")[0]
        print(f"{tag}: FAIL {key[:250]}", flush=True)
        return None, None

rng = np.random.default_rng(0)
on = rng.uniform(-60, 60, (P, 3)).astype(np.float32)
on = on[_morton_order(on)]
dsn = np.array([10.0, 5.0, 2.0], np.float32)[None] - on
dsn /= np.linalg.norm(dsn, axis=-1, keepdims=True)
o_s, d_s = jnp.asarray(on), jnp.asarray(dsn.astype(np.float32))

# ---- 1. sorted-canyon shadow window + walk ----
fb = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris_s, block_rays=1024, block_tris=256, precision="exact1"))
_, ref = bench("sorted shadow brute", fb, o_s, d_s)
for bt in (32, 64):
    fc = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, tris_s, block_rays=1024, block_tris=bt, precision="exact1",
        cull=True, t_max=1.0))
    _, out = bench(f"sorted shadow cullwin bt={bt}", fc, o_s, d_s)
    if out is not None and ref is not None:
        t0, i0 = map(np.asarray, ref); t1, i1 = map(np.asarray, out)
        w = t0 <= 1.0
        ok = ((t0[w] == t1[w]).all() and (i0[w] == i1[w]).all()
              and np.isinf(t1[~w]).all())
        print(f"  window-consistent: {bool(ok)}", flush=True)
d_coh = jnp.asarray(np.asarray(fibonacci_sphere(P))[
    _morton_order(np.asarray(fibonacci_sphere(P)))])
o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (P, 3))
_, refb = bench("sorted bounce brute", fb, o_b, d_coh)
for bt in (32, 64):
    fw = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, tris_s, block_rays=1024, block_tris=bt, precision="exact1",
        walk="resident"))
    _, out = bench(f"sorted bounce reswalk bt={bt}", fw, o_b, d_coh)

# ---- 2. e2e matrix (gather=auto -> onehot XLA now) ----
def e2e(tag, rx_=None, iters=4, tris=tris_s, **kw):
    rx_ = rx if rx_ is None else rx_
    nrx = rx_.shape[0]
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, unroll_bounces=True,
                       precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx_, tx, jnp.zeros((nrx, 3), jnp.float32),
                        z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if out is not None:
        q = 3 * P * (1 + nrx)
        print(f"  loss {float(out[0]):.8e}  {q/dt/1e6:.1f} Mq/s", flush=True)
    return dt, out

_, o_u = e2e("unsorted default", tris=tris_u)
_, o_s2 = e2e("sorted default")
if o_u is not None and o_s2 is not None:
    d = abs(float(o_u[0]) - float(o_s2[0])) / abs(float(o_u[0]))
    print(f"  sorted loss rel delta: {d:.2e}", flush=True)
e2e("sorted walk64 coherent", walk=True, block_tris=64,
    launch_order="coherent")
e2e("sorted cull32 coherent compact", cull=True, block_tris=32,
    launch_order="coherent", compact_rays=True)
rng2 = np.random.default_rng(1)
rx16 = jnp.asarray(np.stack(
    [np.array([10.0, 5.0, 2.0]) + rng2.uniform(-30, 30, 3) * (i > 0)
     for i in range(16)]).astype(np.float32))
e2e("nrx=4", rx_=rx16[:4], iters=4)
e2e("nrx=16 rxchunk", rx_=rx16, iters=2)

# ---- 3. backward breakdown: grads wrt carrier freq only ----
cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                   keep_rays=False, unroll_bounces=True, precision="exact1")
def loss_f(fg):
    r = trace_paths(tris_s, mats, rx, tx, z, z, fg, cfg)
    return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
            + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
_, _ = bench("bwd wrt freq only", jax.jit(jax.value_and_grad(loss_f)),
             jnp.float32(3.0), iters=4)
def loss_fwd(m):
    r = trace_paths(tris_s, m, rx, tx, z, z, jnp.float32(3.0), cfg)
    return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
            + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
_, _ = bench("fwd only", jax.jit(loss_fwd), mats, iters=4)
print("done", flush=True)
