#!/usr/bin/env python
"""Probe 3: (1) onehot_fetch exactness on TPU after the optimization_barrier
fix, (2) fori-DMA walk kernel perf on canyon + 131k soup, (3) e2e with
walk+compact."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.ops.fetch import onehot_fetch, take_fetch
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P = 1 << 20

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
        key = next((l for l in str(e).split("\n") if "Ran out" in l or
                    "Mosaic" in l or "NotImplemented" in l), str(e).split("\n")[0])
        print(f"{tag}: FAIL {key[:200]}", flush=True)
        return None, None

# ---- 1. fetch exactness on TPU ----
rng = np.random.default_rng(0)
table = jnp.asarray(np.concatenate([
    rng.standard_normal((256, 9)).astype(np.float32) * 1e4,
    rng.standard_normal((256, 9)).astype(np.float32),
    rng.standard_normal((256, 9)).astype(np.float32) * 1e-5], axis=1))
idx = jnp.asarray(rng.integers(0, 256, 1 << 16), jnp.int32)
a = jax.jit(onehot_fetch)(idx, table)
b = jax.jit(take_fetch)(idx, table)
a, b = np.asarray(a), np.asarray(b)
print("fetch exact on TPU:", (a == b).all(),
      " max rel err:", float(np.max(np.abs(a - b) / (np.abs(b) + 1e-30))),
      flush=True)

# ---- 2. walk2 kernel micro, canyon ----
tris = flatten_scene(load_hrt(CANYON))
o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (P, 3))
d_b = jnp.asarray(fibonacci_sphere(P))
on = rng.uniform(-60, 60, (P, 3)).astype(np.float32)
ds = np.array([10.0, 5.0, 2.0], np.float32)[None] - on
ds /= np.linalg.norm(ds, axis=-1, keepdims=True)
o_s, d_s = jnp.asarray(on), jnp.asarray(ds.astype(np.float32))

ref = {}
for tag, o, d in (("bounce", o_b, d_b), ("shadow", o_s, d_s)):
    f0 = jax.jit(lambda o, d: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
    _, ref[tag] = bench(f"canyon brute {tag}", f0, o, d)
    for bt in (32, 64, 128):
        f1 = jax.jit(lambda o, d, bt=bt: pallas_intersect(
            o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
            walk=True))
        _, out = bench(f"canyon walk2 {tag} bt={bt}", f1, o, d)
        if out is not None:
            t0, i0 = map(np.asarray, ref[tag]); t1, i1 = map(np.asarray, out)
            ok = ((t0 == t1) | (np.isinf(t0) & np.isinf(t1))).all() and (i0 == i1).all()
            print(f"  match vs brute: {ok}", flush=True)

# ---- 3. soup 131k ----
soup = flatten_scene(random_soup_scene(131072, seed=0, extent=400.0,
                                       tri_size=4.0), sort_triangles=True)
o0 = jnp.zeros((P, 3), jnp.float32)
for bt in (256, 512, 1024):
    f1 = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, soup, block_rays=1024, block_tris=bt, precision="exact1",
        walk=True))
    bench(f"soup walk2 bt={bt}", f1, o0, d_b, iters=2)

# ---- 4. e2e fwd+bwd with fixed fetch; default vs walk+compact ----
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)
def e2e(tag, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, precision="exact1",
                       unroll_bounces=True, **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg,
                        launch_dirs=d_b)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats)
    if out is not None:
        print(f"  loss {float(out[0]):.8e}  {3*P*2/dt/1e6:.1f} Mq/s", flush=True)

e2e("default(fixed fetch)")
e2e("walk64", walk=True, block_tris=64)
e2e("walk64+compact", walk=True, block_tris=64, compact_rays=True)
e2e("walk32+compact", walk=True, block_tris=32, compact_rays=True)
