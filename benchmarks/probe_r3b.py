#!/usr/bin/env python
"""Probe r3b: bisect the tpu_compile_helper crash (unrolled grad graphs) and
measure the e2e matrix with the r3 kernel upgrades + pallas fetch backward.

Crash suspects from probe_r3a (both e2e configs died, kernels alone fine):
(a) fuse4 inside an unrolled grad graph, (b) the new pallas scatter-add
backward kernels, (c) graph size (scan compiles where unrolled does not).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
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
        print(f"{tag}: FAIL {key[:200]}", flush=True)
        return None, None


def e2e(tag, iters=6, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if out is not None:
        print(f"  loss {float(out[0]):.8e}  {3*P*2/dt/1e6:.1f} Mq/s",
              flush=True)
    return dt


# ---- bisect matrix ----
# control: r2 defaults (no fuse4, xla bwd, unrolled) — compiled in r2
e2e("ctrl unroll xla-bwd", unroll_bounces=True, fetch_bwd="xla")
# suspects, one at a time
e2e("unroll xla-bwd fuse4", unroll_bounces=True, fetch_bwd="xla", fuse4=True)
e2e("unroll pallas-bwd", unroll_bounces=True, fetch_bwd="pallas")
# scan versions
e2e("scan pallas-bwd fuse4", unroll_bounces=False, fetch_bwd="pallas",
    fuse4=True)
e2e("scan pallas-bwd fuse4 br2048", unroll_bounces=False,
    fetch_bwd="pallas", fuse4=True, block_rays=2048)
e2e("scan pallas-bwd fuse4 compact", unroll_bounces=False,
    fetch_bwd="pallas", fuse4=True, compact_rays=True)

# ---- flags kernels (fixed lambda bug from r3a) ----
cfg0 = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                    keep_rays=True, unroll_bounces=False, precision="exact1")
res = jax.jit(lambda m: trace_paths(tris, m, rx, tx, z, z,
                                    jnp.float32(3.0), cfg0))(mats)
jax.block_until_ready(res.scatter.a_te)
ro = np.asarray(res.rays_scatter.origins[0])
rd = np.asarray(res.rays_scatter.directions[0])
ra = np.asarray(res.rays_scatter.active[0])
o1, d1 = jnp.asarray(ro[1]), jnp.asarray(rd[1])
ex = jnp.asarray(np.where(ra[1], 0, -1), jnp.int32)
fn = jax.jit(lambda o, d, e, l: pallas_intersect(
    o, d, tris, exclude=e, live=l, fuse4=True, precision="exact1",
    block_rays=2048))
for tag, a in (("all-live", np.ones(P, bool)), ("act b1", ra[1]),
               ("act b2", ra[2]), ("act b3", ra[3])):
    tiles = a.reshape(-1, 2048).any(axis=1)
    dt, out = bench(f"k flags {tag} (tiles {tiles.mean():.2f})", fn,
                    o1, d1, ex, jnp.asarray(a), iters=16)
print("done", flush=True)
