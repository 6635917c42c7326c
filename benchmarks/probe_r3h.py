#!/usr/bin/env python
"""Probe r3h: walk at 1M triangles — does the hierarchical (grouped)
prepass stay <=10% of the walk wall (VERDICT r2 #5)?

Scene: config5-style procedural city scaled to ~1.0M triangles, Morton
sorted.  Measures the XLA prepass alone vs the full walk kernel call at
1M rays, for the auto group size and a few forced ones, plus the brute
kernel as control (expected >>10x slower).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax, jax.numpy as jnp
from config5_scene import make_city
from hermespy_rt_tpu.scene import load_scene, flatten_scene
from hermespy_rt_tpu.ops import intersect_pallas as ip

xml = make_city("/tmp/city1m", n_buildings=1294, sub=8, ground_sub=64,
                extent=1200.0)
tris = flatten_scene(load_scene(xml), sort_triangles=True)
print("tris:", int(tris.num_triangles), flush=True)

R = 1 << 20
rng = np.random.default_rng(0)
# rays from a TX high above the city, coherent-ish cones downward
o = np.broadcast_to(np.array([0.0, 0.0, 300.0], np.float32), (R, 3)).copy()
d = rng.normal(size=(R, 3)).astype(np.float32)
d[:, 2] = -np.abs(d[:, 2]) - 0.1
d /= np.linalg.norm(d, axis=-1, keepdims=True)
# Morton-order directions for tile coherence (what the tracer does)
from hermespy_rt_tpu.scene.model import _morton_order
d = d[_morton_order(d)]
o_j, d_j = jnp.asarray(o), jnp.asarray(d)


def bench(tag, fn, *args, iters=4):
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
        print(f"{tag}: FAIL {str(e).splitlines()[0][:200]}", flush=True)
        return None, None


def prepass_only(block_rays, block_tris, group):
    t_pad = ip._round_up(int(tris.v0.shape[0]), block_tris * max(group, 1))
    @jax.jit
    def f(o, d):
        center = ip._scene_center(tris)
        fmat = ip._ray_features(o, d, ip._round_up(R, block_rays), center)
        od = jnp.concatenate([fmat[0:3], fmat[6:9],
                              jnp.zeros((2, fmat.shape[1]), jnp.float32)])
        aabbs = ip._tile_aabbs(tris, t_pad, block_tris, center)
        lim = jnp.full((1, fmat.shape[1]), np.float32(ip.T_MAX), jnp.float32)
        return ip._walk_prepass(od, lim, aabbs, block_rays, group)
    return f


results = {}
for group in (0, 8, 32):
    tag = f"group={'auto' if group == 0 else group}"
    kern = lambda o_, d_, g=group: ip.pallas_intersect(
        o_, d_, tris, block_rays=1024, block_tris=128, precision="exact1",
        fuse4=True, walk="dma", walk_group=g)
    dt_walk, out = bench(f"walk {tag}", jax.jit(kern), o_j, d_j)
    n_tiles = ip._round_up(int(tris.v0.shape[0]), 128) // 128
    g_eff = group if group else max(1, (n_tiles + 511) // 512)
    dt_pre, _ = bench(f"prepass {tag}", prepass_only(1024, 128,
                                                     max(g_eff, 1)), o_j, d_j)
    if dt_walk and dt_pre:
        print(f"  prepass share: {dt_pre/dt_walk*100:.1f}%  "
              f"({1 << 20} q in {dt_walk*1e3:.1f} ms = "
              f"{(1 << 20)/dt_walk/1e6:.1f} Mq/s)", flush=True)
        results[tag] = (dt_walk, dt_pre, out)

# brute control (single iter — expected ~100x slower)
bench("brute control", jax.jit(
    lambda o_, d_: ip.pallas_intersect(o_, d_, tris, block_rays=1024,
                                       block_tris=128, precision="exact1",
                                       fuse4=True)), o_j, d_j, iters=1)

# cross-check bit-identical hits across group sizes
outs = [v[2] for v in results.values() if v[2] is not None]
if len(outs) > 1:
    t0_, i0_ = map(np.asarray, outs[0])
    for (t_, i_) in outs[1:]:
        t_, i_ = np.asarray(t_), np.asarray(i_)
        same = ((t0_ == t_) | (np.isinf(t0_) & np.isinf(t_))).all() \
            and (i0_ == i_).all()
        print("bit-identical across groups:", bool(same), flush=True)
print("done", flush=True)
