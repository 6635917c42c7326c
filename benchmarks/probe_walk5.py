#!/usr/bin/env python
"""Probe 5: in-kernel exact1 expansion (perf + flip check), soup walk tuning
(block_rays sweep + LOD-capped two-phase), multi-RX e2e."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
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
                    "Mosaic" in l or "divisible" in l), str(e).split("\n")[0])
        print(f"{tag}: FAIL {key[:200]}", flush=True)
        return None, None

tris = flatten_scene(load_hrt(CANYON))
o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (P, 3))
d_b = jnp.asarray(fibonacci_sphere(P))

# 1. exact1 in-kernel expansion: perf + flips vs highest
f_hi = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="highest"))
f_e1 = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
_, hi = bench("canyon highest (ref)", f_hi, o_b, d_b, iters=4)
_, e1 = bench("canyon exact1 in-kernel", f_e1, o_b, d_b)
th, ih = map(np.asarray, hi); te, ie = map(np.asarray, e1)
print("  flips vs highest:", int((ih != ie).sum()), flush=True)

# 2. soup walk tuning
soup = flatten_scene(random_soup_scene(131072, seed=0, extent=400.0,
                                       tri_size=4.0), sort_triangles=True)
o0 = jnp.zeros((P, 3), jnp.float32)
fb = jax.jit(lambda o, d: pallas_intersect(
    o, d, soup, block_rays=1024, block_tris=256, precision="exact1"))
_, refs = bench("soup brute", fb, o0, d_b, iters=2)
t0s, i0s = map(np.asarray, refs)
for br, bt in ((1024, 256), (512, 256), (256, 256), (512, 128)):
    f1 = jax.jit(lambda o, d, br=br, bt=bt: pallas_intersect(
        o, d, soup, block_rays=br, block_tris=bt, precision="exact1",
        walk=True))
    _, out = bench(f"soup walk br={br} bt={bt}", f1, o0, d_b, iters=2)
    if out is not None:
        t1, i1 = map(np.asarray, out)
        ok = ((t0s == t1) | (np.isinf(t0s) & np.isinf(t1))).all() and (i0s == i1).all()
        print(f"  match: {ok}", flush=True)

# LOD-capped two-phase: strided 2048-tri subset gives a per-ray upper bound
sub = jax.tree.map(lambda x: x, soup)
stride = 64
sub = dataclasses.replace(
    soup,
    v0=soup.v0[::stride], e1=soup.e1[::stride], e2=soup.e2[::stride],
    normal=soup.normal[::stride], velocity=soup.velocity[::stride],
    material=soup.material[::stride], mesh_id=soup.mesh_id[::stride],
    num_triangles=soup.num_triangles // stride)
def lod_walk(o, d):
    t_sub, _ = pallas_intersect(o, d, sub, block_rays=1024, block_tris=256,
                                precision="exact1")
    cap = jnp.where(jnp.isfinite(t_sub), t_sub, jnp.float32(1e9))
    return pallas_intersect(o, d, soup, block_rays=512, block_tris=256,
                            precision="exact1", walk=True, t_max=cap)
_, out = bench("soup walk+LODcap br=512", jax.jit(lod_walk), o0, d_b, iters=2)
if out is not None:
    t1, i1 = map(np.asarray, out)
    ok = ((t0s == t1) | (np.isinf(t0s) & np.isinf(t1))).all() and (i0s == i1).all()
    print(f"  match: {ok}", flush=True)

# 3. multi-RX e2e (VERDICT #5): nrx in {1, 4, 16}
mats = default_materials()
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)
rng = np.random.default_rng(1)
for nrx in (1, 4, 16):
    rx = jnp.asarray(np.stack([
        np.array([10.0, 5.0, 2.0]) + rng.uniform(-30, 30, 3) * (i > 0)
        for i in range(nrx)]).astype(np.float32))
    zr = jnp.zeros((nrx, 3), jnp.float32)
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, precision="exact1",
                       unroll_bounces=True)
    def loss_fn(m, rx=rx, zr=zr, cfg=cfg):
        r = trace_paths(tris, m, rx, tx, zr, z, jnp.float32(3.0), cfg,
                        launch_dirs=d_b)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e nrx={nrx}", step, mats, iters=4)
    if out is not None:
        q = 3 * P * (1 + nrx)
        print(f"  loss {float(out[0]):.8e}  {q/dt/1e6:.1f} Mq/s", flush=True)
