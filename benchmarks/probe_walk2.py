#!/usr/bin/env python
"""Probe 2: SMEM-per-grid-step hypothesis + walk perf isolation."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops import intersect_pallas as ip
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere

tris = flatten_scene(load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
RXP = np.array([10.0, 5.0, 2.0], np.float32)

def rays(R, kind):
    if kind == "bounce":
        o = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (R, 3))
        d = jnp.asarray(fibonacci_sphere(R))
    else:
        rng = np.random.default_rng(0)
        on = rng.uniform(-60, 60, (R, 3)).astype(np.float32)
        ds = RXP[None] - on
        ds /= np.linalg.norm(ds, axis=-1, keepdims=True)
        o, d = jnp.asarray(on), jnp.asarray(ds.astype(np.float32))
    return o, d

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
        return dt
    except Exception as e:
        key = next((l for l in str(e).split("\n") if "Ran out" in l or "Mosaic" in l),
                   str(e).split("\n")[0])
        print(f"{tag}: FAIL {key[:160]}", flush=True)
        return None

R1 = 1 << 17
# SMEM hypothesis: same R, more grid steps via smaller block_rays
for br, bt in ((1024, 128), (512, 128), (256, 128), (128, 128)):
    o, d = rays(R1, "bounce")
    f = jax.jit(lambda o, d, br=br, bt=bt: ip.pallas_intersect(
        o, d, tris, block_rays=br, block_tris=bt, precision="exact1", walk=True))
    bench(f"walk R=128k br={br} bt={bt} steps={R1//br*(256//bt)}", f, o, d)

# brute baseline at same R
for kind in ("bounce", "shadow"):
    o, d = rays(R1, kind)
    f = jax.jit(lambda o, d: ip.pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=256, precision="exact1"))
    bench(f"brute R=128k {kind}", f, o, d)
    for bt in (128, 32):
        f = jax.jit(lambda o, d, bt=bt: ip.pallas_intersect(
            o, d, tris, block_rays=1024, block_tris=bt, precision="exact1",
            walk=True))
        bench(f"walk  R=128k {kind} bt={bt}", f, o, d)

# prepass alone at 1M
R2 = 1 << 20
o, d = rays(R2, "bounce")
f128 = ip._ray_features(o, d, R2, None)
od = jnp.concatenate([f128[0:3], f128[6:9], jnp.zeros((2, R2), jnp.float32)])
lim = jnp.full((1, R2), np.float32(ip.T_MAX), jnp.float32)
aabbs = ip._tile_aabbs(tris, 256, 32, None)
f = jax.jit(lambda od, lim: ip._walk_prepass(od, lim, aabbs, 1024))
bench("prepass alone R=1M bt=32", f, od, lim)

# slab-chunked walk at 1M (8 x 128k sequential)
o, d = rays(R2, "bounce")
def chunked(o, d):
    outs = [ip.pallas_intersect(o[i*R1:(i+1)*R1], d[i*R1:(i+1)*R1], tris,
                                block_rays=1024, block_tris=32,
                                precision="exact1", walk=True)
            for i in range(R2 // R1)]
    return (jnp.concatenate([t for t, _ in outs]),
            jnp.concatenate([i for _, i in outs]))
bench("walk chunked R=1M bt=32", jax.jit(chunked), o, d)
o, d = rays(R2, "shadow")
bench("walk chunked R=1M bt=32 shadow", jax.jit(chunked), o, d)
f = jax.jit(lambda o, d: ip.pallas_intersect(o, d, tris, block_rays=1024,
                                             block_tris=256, precision="exact1"))
bench("brute R=1M shadow", f, o, d)
