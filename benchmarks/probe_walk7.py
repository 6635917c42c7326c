#!/usr/bin/env python
"""Probe 7: resident walk on the canyon (bounce + shadow bundles, coherent
ray order), fixed DMA walk on the 131k soup (+ coherent dirs, LOD cap),
rx-chunked multi-RX e2e, e2e with walk+coherent launch."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.scene.model import _morton_order
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
                    "Mosaic" in l or "divisible" in l or "Slice" in l),
                   str(e).split("\n")[0])
        print(f"{tag}: FAIL {key[:250]}", flush=True)
        return None, None

def same(a, b):
    t0, i0 = map(np.asarray, a); t1, i1 = map(np.asarray, b)
    return bool((((t0 == t1) | (np.isinf(t0) & np.isinf(t1))).all()
                 and (i0 == i1).all()))

tris = flatten_scene(load_hrt(CANYON))
dirs_np = np.asarray(fibonacci_sphere(P))
perm = _morton_order(dirs_np)
d_fib = jnp.asarray(dirs_np)
d_coh = jnp.asarray(dirs_np[perm])
o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (P, 3))

# shadow-bundle-like rays: origins on scene geometry (scale of hit points),
# direction to a single RX — coherent by construction once sorted by origin
rng = np.random.default_rng(1)
on = rng.uniform(-60, 60, (P, 3)).astype(np.float32)
on = on[_morton_order(on)]
ds = np.array([10.0, 5.0, 2.0], np.float32)[None] - on
dl = np.linalg.norm(ds, axis=-1, keepdims=True)
o_s, d_s = jnp.asarray(on), jnp.asarray((ds / dl).astype(np.float32))
lim_s = jnp.asarray(dl[:, 0].astype(np.float32))

# ---- 1. canyon resident walk ----
f0 = jax.jit(lambda o, d: pallas_intersect(
    o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
_, ref_fib = bench("canyon brute fib", f0, o_b, d_fib)
_, ref_coh = bench("canyon brute coh", f0, o_b, d_coh)
for bt in (32, 64, 128):
    fw = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
        walk="resident"))
    _, out = bench(f"canyon reswalk bounce-coh bt={bt}", fw, o_b, d_coh)
    if out is not None:
        print(f"  match: {same(ref_coh, out)}", flush=True)
_, ref_s = bench("canyon brute shadow", f0, o_s, d_s)
for bt in (32, 64):
    fw = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
        walk="resident"))
    _, out = bench(f"canyon reswalk shadow bt={bt}", fw, o_s, d_s)
    if out is not None:
        print(f"  match: {same(ref_s, out)}", flush=True)
    # range-limited (physical-mode semantics): t_max = dist to RX
    fwl = jax.jit(lambda o, d, tm, bt=bt: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
        walk="resident", t_max=tm))
    _, out = bench(f"canyon reswalk shadow tmax bt={bt}", fwl, o_s, d_s,
                   lim_s)

# ---- 2. soup DMA walk (fixed) ----
soup = flatten_scene(random_soup_scene(131072, seed=0, extent=400.0,
                                       tri_size=4.0), sort_triangles=True)
o0 = jnp.zeros((P, 3), jnp.float32)
fb = jax.jit(lambda o, d: pallas_intersect(
    o, d, soup, block_rays=1024, block_tris=256, precision="exact1"))
_, refs = bench("soup brute", fb, o0, d_fib, iters=2)
for tag, dd, bt in (("fib", d_fib, 256), ("coh", d_coh, 256),
                    ("coh", d_coh, 128), ("coh", d_coh, 512)):
    f1 = jax.jit(lambda o, d, bt=bt: pallas_intersect(
        o, d, soup, block_rays=1024, block_tris=bt, precision="exact1",
        walk="dma"))
    _, out = bench(f"soup walk {tag} bt={bt}", f1, o0, dd, iters=2)
    if out is not None and tag == "fib":
        print(f"  match: {same(refs, out)}", flush=True)

# LOD cap: strided subset upper-bounds each ray's t, walk prepass prunes
import dataclasses
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
    cap = jnp.where(jnp.isfinite(t_sub), t_sub * jnp.float32(1.0 + 1e-6),
                    jnp.float32(1e9))
    return pallas_intersect(o, d, soup, block_rays=1024, block_tris=256,
                            precision="exact1", walk="dma", t_max=cap)
_, out = bench("soup walk coh LODcap", jax.jit(lod_walk), o0, d_coh, iters=2)

# ---- 3. e2e: walk + coherent launch; rx-chunked nrx=16 ----
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)
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

e2e("default")
e2e("walk64", walk=True, block_tris=64)
e2e("walk64 coherent", walk=True, block_tris=64, launch_order="coherent")
e2e("walk32 coherent", walk=True, block_tris=32, launch_order="coherent")
rng2 = np.random.default_rng(1)
rx16 = jnp.asarray(np.stack(
    [np.array([10.0, 5.0, 2.0]) + rng2.uniform(-30, 30, 3) * (i > 0)
     for i in range(16)]).astype(np.float32))
e2e("nrx=16 rxchunk", rx_=rx16, iters=2)
print("done", flush=True)
