#!/usr/bin/env python
"""Probe: walk-kernel compile variants on real TPU (SMEM pressure hunt)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
tris = flatten_scene(load_hrt(CANYON))

def probe(tag, R, bt, br=1024, **kw):
    o = jnp.broadcast_to(jnp.asarray([-20.0, -10.0, 10.0], jnp.float32), (R, 3))
    d = jnp.asarray(fibonacci_sphere(R))
    try:
        t0 = time.perf_counter()
        fn = jax.jit(lambda o, d: pallas_intersect(
            o, d, tris, block_rays=br, block_tris=bt, precision="exact1",
            walk=True, **kw))
        out = fn(o, d)
        jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(o, d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 8
        print(f"{tag}: OK compile {c:.1f}s  {dt*1e3:.2f} ms  {R/dt/1e6:.0f} Mq/s",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")
        key = next((l for l in msg if "memory" in l.lower() or "Error" in l), msg[0])
        print(f"{tag}: FAIL {key[:200]}", flush=True)

probe("walk bt=256 R=128k", 1 << 17, 256)
probe("walk bt=128 R=128k", 1 << 17, 128)
probe("walk bt=128 R=1M", 1 << 20, 128)
probe("walk bt=64  R=1M", 1 << 20, 64)
probe("walk bt=32  R=1M", 1 << 20, 32)
probe("walk bt=128 R=1M br=512", 1 << 20, 128, br=512)
