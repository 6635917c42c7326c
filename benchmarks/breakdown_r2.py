#!/usr/bin/env python
"""Round-2 breakdown: where the 61 ms goes, and what the walk kernel buys.

Measures on the real TPU chip (run ONE at a time over the tunnel):
  [K] kernel-only exact1 q/s: brute vs walk at several tile sizes, on
      bounce-like (incoherent) and shadow-like (coherent) ray sets, canyon.
  [E] end-to-end canyon fwd+bwd 1M x 3 bounces: default vs walk vs
      walk+compact; fwd-only split.
  [S] 131k-tri Morton soup: brute vs culled vs walk (the >=10x target,
      VERDICT item 2).
  [M] misc: argsort cost of 1M keys (ray-sort feasibility).

Appends one JSON line per measurement to benchmarks/logs/breakdown_r2.jsonl.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs",
                   "breakdown_r2.jsonl")
P = 1 << 20


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, iters=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, compile_s


def kernel_micro():
    tris = flatten_scene(load_hrt(CANYON))
    rng = np.random.default_rng(0)
    # bounce-like: ray tile = coherent Fibonacci cone from one TX (bounce 0)
    o_b = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32),
                           (P, 3))
    d_b = jnp.asarray(fibonacci_sphere(P))
    # shadow-like: origins scattered on scene scale, dirs to one RX
    o_s = jnp.asarray(rng.uniform(-60, 60, (P, 3)).astype(np.float32))
    rxp = np.array([10.0, 5.0, 2.0], np.float32)
    ds = rxp[None] - np.asarray(o_s)
    ds /= np.linalg.norm(ds, axis=-1, keepdims=True)
    d_s = jnp.asarray(ds.astype(np.float32))

    for tag, o, d in (("bounce", o_b, d_b), ("shadow", o_s, d_s)):
        # NOTE: the scalar-prefetch walk kernel exhausts SMEM above ~1024
        # grid steps at 1M rays (probe_walk2.log) — walk variants measured
        # separately once the fori-DMA redesign lands.
        for mode, bt, walk in (("brute", 256, False), ("cull", 256, False),
                               ("cull", 64, False)):
            cull = mode == "cull"
            fn = jax.jit(lambda o, d, bt=bt, walk=walk, cull=cull:
                         pallas_intersect(
                             o, d, tris, block_rays=1024, block_tris=bt,
                             precision="exact1", walk=walk, cull=cull))
            dt, comp = timeit(fn, o, d)
            emit(kind="kernel", rays=tag, mode=mode, block_tris=bt,
                 ms=dt * 1e3, mqs=P / dt / 1e6, compile_s=round(comp, 1))


def e2e():
    tris = flatten_scene(load_hrt(CANYON))
    mats = default_materials()
    dirs = jnp.asarray(fibonacci_sphere(P))
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    B = 3

    def run(tag, fwd_only=False, **kw):
        cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                           keep_rays=False, precision="exact1",
                           unroll_bounces=True, **kw)

        def loss_fn(m):
            r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg,
                            launch_dirs=dirs)
            return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                    + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9

        step = jax.jit(loss_fn if fwd_only else jax.value_and_grad(loss_fn))
        dt, comp = timeit(step, mats)
        q = B * P * 2
        out = step(mats)
        loss = float(out[0] if not fwd_only else out)
        emit(kind="e2e", tag=tag, fwd_only=fwd_only, ms=dt * 1e3,
             mqs=q / dt / 1e6, loss=loss, compile_s=round(comp, 1))

    run("default_r2fetch")                       # new fetch, old kernel
    run("default_fwdonly", fwd_only=True)
    run("take_gather", gather="take")
    run("physical_mode", parity="physical")


def soup():
    tris = flatten_scene(random_soup_scene(131072, seed=0, extent=400.0,
                                           tri_size=4.0), sort_triangles=True)
    o = jnp.zeros((P, 3), jnp.float32)
    d = jnp.asarray(fibonacci_sphere(P))
    for tag, kw in (("brute256", dict(block_tris=256)),
                    ("cull256", dict(block_tris=256, cull=True)),
                    ("cull512", dict(block_tris=512, cull=True))):
        fn = jax.jit(lambda o, d, kw=kw: pallas_intersect(
            o, d, tris, block_rays=1024, precision="exact1", **kw))
        dt, comp = timeit(fn, o, d, iters=2)
        emit(kind="soup131k", tag=tag, ms=dt * 1e3, mqs=P / dt / 1e6,
             compile_s=round(comp, 1))


def misc():
    keys = jnp.asarray(np.random.default_rng(0)
                       .standard_normal(P).astype(np.float32))
    f = jax.jit(lambda k: jnp.argsort(k))
    dt, comp = timeit(f, keys)
    emit(kind="misc", tag="argsort_1M", ms=dt * 1e3, compile_s=round(comp, 1))
    vals = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((P, 8)).astype(np.float32))
    perm = jnp.asarray(np.random.default_rng(2).permutation(P))
    g = jax.jit(lambda v, p: v[p])
    dt, comp = timeit(g, vals, perm)
    emit(kind="misc", tag="gather_1Mx8", ms=dt * 1e3, compile_s=round(comp, 1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "kernel"):
        kernel_micro()
    if which in ("all", "e2e"):
        e2e()
    if which in ("all", "soup"):
        soup()
    if which in ("all", "misc"):
        misc()
