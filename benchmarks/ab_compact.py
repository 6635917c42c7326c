#!/usr/bin/env python
"""A/B: compact_rays (dead-ray tile skipping) on top of exact1, fwd+bwd,
street canyon, 1M rays x 3 bounces.  Run on the real TPU chip."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P, B, ITERS = 1 << 20, 3, 8

tris = flatten_scene(load_hrt(CANYON))
mats = default_materials()
dirs = jnp.asarray(fibonacci_sphere(P))
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)


def bench(tag, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1",
                       unroll_bounces=True, **kw)

    def loss_fn(mats):
        res = trace_paths(tris, mats, rx, tx, z, z, jnp.float32(3.0), cfg,
                          launch_dirs=dirs)
        return (jnp.sum(jnp.abs(res.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(res.scatter.a_tm) ** 2)) * 1e9

    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    loss, g = step(mats)
    jax.block_until_ready((loss, g))
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s loss={float(loss):.6e}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, g = step(mats)
    jax.block_until_ready((loss, g))
    dt = (time.perf_counter() - t0) / ITERS
    q = B * P * 2
    print(f"{tag}: {dt*1e3:.2f} ms  {q/dt/1e6:.1f} Mq/s", flush=True)
    return float(loss)


l0 = bench("baseline        ")
l1 = bench("compact         ", compact_rays=True)
l2 = bench("compact+cull    ", compact_rays=True, cull=True)
print(f"loss rel delta compact: {abs(l1-l0)/abs(l0):.2e}  "
      f"compact+cull: {abs(l2-l0)/abs(l0):.2e}", flush=True)
