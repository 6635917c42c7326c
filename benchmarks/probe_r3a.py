#!/usr/bin/env python
"""Probe r3a: intersection-kernel occupancy work on the flagship (canyon).

Measures (single chip, 1M queries, exclude operand attached like the real
bounce queries): fuse4 single-pass contraction, trimmed epilogue (now
default), block_rays sweep, per-ray-tile liveness flags (dead-ray skipping)
at real bounce-1/2 activity patterns, and the e2e effect.
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


def bench(tag, fn, *args, iters=16):
    try:
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: OK compile {c:.1f}s  {dt*1e3:.3f} ms "
              f"({P/dt/1e6:.1f} Mq/s)", flush=True)
        return dt, out
    except Exception as e:
        key = str(e).split("\n")[0]
        print(f"{tag}: FAIL {key[:250]}", flush=True)
        return None, None


# ---- realistic bounce-1 state: run the fwd trace once, keep rays ----
cfg0 = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                    keep_rays=True, unroll_bounces=False,
                    precision="exact1")
res = jax.jit(lambda m: trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0),
                                    cfg0), static_argnums=())(mats)
jax.block_until_ready(res.scatter.a_te)
ro = np.asarray(res.rays_scatter.origins[0])      # [B+1, P, 3]
rd = np.asarray(res.rays_scatter.directions[0])
ra = np.asarray(res.rays_scatter.active[0])       # [B+1, P]
print("activity per bounce:", ra.mean(axis=1), flush=True)
o1 = jnp.asarray(ro[1]); d1 = jnp.asarray(rd[1])
act1 = jnp.asarray(ra[1]); act2 = jnp.asarray(ra[2])
ex = jnp.asarray(np.where(ra[1], 0, -1), jnp.int32)  # fake but present

# tile-level skippable fraction at br=1024
for b, a in (("b1", ra[1]), ("b2", ra[2])):
    tiles = a.reshape(-1, 1024).any(axis=1)
    print(f"  {b}: live rays {a.mean():.2f}, live tiles {tiles.mean():.2f}",
          flush=True)

variants = [
    ("base exact1 br1024 bt256", dict()),
    ("fuse4", dict(fuse4=True)),
    ("fuse4 br2048", dict(fuse4=True, block_rays=2048)),
    ("fuse4 br4096", dict(fuse4=True, block_rays=4096)),
    ("fuse4 br512", dict(fuse4=True, block_rays=512)),
    ("fuse4 bt128", dict(fuse4=True, block_tris=128)),
    ("highest", dict(precision="highest")),
    ("highest fuse4", dict(precision="highest", fuse4=True)),
]
ref = None
for tag, kw in variants:
    kw.setdefault("block_rays", 1024)
    kw.setdefault("block_tris", 256)
    kw.setdefault("precision", "exact1")
    fn = jax.jit(lambda o, d, e, kw=kw: pallas_intersect(
        o, d, tris, exclude=e, **kw))
    dt, out = bench(f"k {tag}", fn, o1, d1, ex)
    if out is not None:
        if ref is None and tag.startswith("base"):
            ref = tuple(map(np.asarray, out))
        elif ref is not None and kw["precision"] == "exact1":
            t1, i1 = map(np.asarray, out)
            print(f"  exact vs base: t {bool((ref[0]==t1).all())} "
                  f"idx {bool((ref[1]==i1).all())}", flush=True)

# ---- liveness flags ----
for tag, lv in (("all-live", jnp.ones((P,), bool)), ("act b1", act1),
                ("act b2", act2)):
    fn = jax.jit(lambda o, d, e, l: pallas_intersect(
        o, d, tris, exclude=e, live=l, fuse4=True, precision="exact1"))
    dt, out = bench(f"k flags {tag}", fn, o1, d1, lv)
    if out is not None and ref is not None:
        t1, i1 = map(np.asarray, out)
        m = np.asarray(lv)
        print(f"  live rows exact: t {bool((ref[0][m]==t1[m]).all())} "
              f"idx {bool((ref[1][m]==i1[m]).all())}", flush=True)

# ---- e2e ----
def e2e(tag, iters=4, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, unroll_bounces=True,
                       precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if out is not None:
        q = 3 * P * 2
        print(f"  loss {float(out[0]):.8e}  {q/dt/1e6:.1f} Mq/s", flush=True)

e2e("fuse4", fuse4=True)
e2e("fuse4 compact", fuse4=True, compact_rays=True)
print("done", flush=True)
