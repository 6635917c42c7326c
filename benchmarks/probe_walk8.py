#!/usr/bin/env python
"""Probe 8: e2e A/Bs after the fetch-kernel gather fix — gather variants,
pre_expand, walk/coherent, multi-RX (rx-chunked)."""
import os, sys, time, traceback
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths

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

# 1. kernel: in-kernel vs pre-expanded exact1 operands
d_fib = jnp.asarray(fibonacci_sphere(P))
o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (P, 3))
f_ik = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
f_pre = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="exact1",
    pre_expand=True))
_, a = bench("kernel exact1 in-kernel", f_ik, o_b, d_fib)
_, b = bench("kernel exact1 pre-expand", f_pre, o_b, d_fib)
if a is not None and b is not None:
    t0, i0 = map(np.asarray, a); t1, i1 = map(np.asarray, b)
    print("  match:", bool((((t0 == t1) | (np.isinf(t0) & np.isinf(t1))).all()
                            and (i0 == i1).all())), flush=True)

# 2. e2e matrix
def e2e(tag, rx_=None, iters=4, loss_scale=1e9, **kw):
    rx_ = rx if rx_ is None else rx_
    nrx = rx_.shape[0]
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, unroll_bounces=True,
                       precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx_, tx, jnp.zeros((nrx, 3), jnp.float32),
                        z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * loss_scale
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if out is not None:
        q = 3 * P * (1 + nrx)
        print(f"  loss {float(out[0]):.8e}  {q/dt/1e6:.1f} Mq/s", flush=True)
    return dt

e2e("default (pallas fetch)")
e2e("gather=onehot (xla)", gather="onehot")
e2e("walk64 coherent", walk=True, block_tris=64, launch_order="coherent")
e2e("compact+cull coherent", compact_rays=True, launch_order="coherent",
    block_tris=64)
rng2 = np.random.default_rng(1)
rx16 = jnp.asarray(np.stack(
    [np.array([10.0, 5.0, 2.0]) + rng2.uniform(-30, 30, 3) * (i > 0)
     for i in range(16)]).astype(np.float32))
e2e("nrx=4", rx_=rx16[:4], iters=4)
e2e("nrx=16 rxchunk", rx_=rx16, iters=2)
print("done", flush=True)
