#!/usr/bin/env python
"""Probe 9: fetch-kernel execution on TPU (post gather/dot_general fixes),
then the e2e matrix, plus shadow-window culling kernel A/B."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.ops.fetch_pallas import pallas_onehot_fetch
from hermespy_rt_tpu.ops.fetch import take_fetch
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.scene.model import _morton_order

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P = 1 << 20
tris = flatten_scene(load_hrt(CANYON))
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

# ---- 1. fetch kernel on TPU: exactness fwd + bwd vs take ----
rng = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([
    rng.standard_normal((256, 9)).astype(np.float32) * 1e4,
    rng.standard_normal((256, 9)).astype(np.float32),
    rng.standard_normal((256, 9)).astype(np.float32) * 1e-5], axis=1))
idx = jnp.asarray(rng.integers(0, 256, 1 << 20), jnp.int32)
cot = jnp.asarray(rng.standard_normal((1 << 20, 27)).astype(np.float32))

def fwd_p(i, t): return pallas_onehot_fetch(i, t, False)
def fwd_t(i, t): return t[i]
_, a = bench("fetch pallas fwd", jax.jit(fwd_p), idx, table)
_, b = bench("fetch take fwd", jax.jit(fwd_t), idx, table)
if a is not None and b is not None:
    print("  fwd exact:", bool((np.asarray(a) == np.asarray(b)).all()),
          flush=True)
def g_p(t): return jnp.vdot(pallas_onehot_fetch(idx, t, False), cot)
def g_t(t): return jnp.vdot(t[idx], cot)
_, ga = bench("fetch pallas bwd", jax.jit(jax.grad(g_p)), table)
_, gb = bench("fetch take bwd", jax.jit(jax.grad(g_t)), table)
if ga is not None and gb is not None:
    ga_n, gb_n = np.asarray(ga), np.asarray(gb)
    rel = np.abs(ga_n - gb_n).max() / (np.abs(gb_n).max() + 1e-30)
    print(f"  bwd max rel delta: {rel:.2e}", flush=True)

# ---- 2. shadow-window culling A/B (kernel level) ----
on = rng.uniform(-60, 60, (P, 3)).astype(np.float32)
on = on[_morton_order(on)]
dsn = np.array([10.0, 5.0, 2.0], np.float32)[None] - on
dsn /= np.linalg.norm(dsn, axis=-1, keepdims=True)
o_s, d_s = jnp.asarray(on), jnp.asarray(dsn.astype(np.float32))
fb = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
_, ref = bench("shadow brute full", fb, o_s, d_s)
for bt in (32, 64):
    fc = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
        cull=True, t_max=1.0))
    _, out = bench(f"shadow cull window bt={bt}", fc, o_s, d_s)
    if out is not None and ref is not None:
        t0, i0 = map(np.asarray, ref); t1, i1 = map(np.asarray, out)
        w = t0 <= 1.0
        ok = ((t0[w] == t1[w]).all() and (i0[w] == i1[w]).all()
              and np.isinf(t1[~w]).all())
        print(f"  window-consistent: {bool(ok)}", flush=True)

# ---- 3. e2e matrix ----
def e2e(tag, rx_=None, iters=4, **kw):
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

e2e("default (pallas fetch)")
e2e("walk64 coherent", walk=True, block_tris=64, launch_order="coherent")
rng2 = np.random.default_rng(1)
rx16 = jnp.asarray(np.stack(
    [np.array([10.0, 5.0, 2.0]) + rng2.uniform(-30, 30, 3) * (i > 0)
     for i in range(16)]).astype(np.float32))
e2e("nrx=4", rx_=rx16[:4], iters=4)
e2e("nrx=16 rxchunk", rx_=rx16, iters=2)
print("done", flush=True)
