#!/usr/bin/env python
"""Probe r5e: config-5 with the Pallas slab-test prepass (VERDICT r4
item 3).  trace_r4h attributed ~26% of the 772 ms step to the XLA
prepass sweep (lax.map chunks + broadcast materialisations); the r5
kernel streams the identical arithmetic through VMEM.  A/B rows:

  A  walk, prepass=ray (Pallas)      — the new default
  B  walk, prepass=ray_xla (control) — the r4 path, must match A's loss
  C  A with block_tris=256           — walk tile-size check under the
                                       cheaper prepass
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax, jax.numpy as jnp
import numpy as np
from config5_scene import make_city
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.scene import flatten_scene, load_scene
from hermespy_rt_tpu.tracer import trace_paths
import warnings
warnings.filterwarnings("ignore")

xml = make_city("/tmp/city131k")
scene = load_scene(xml)
tris = flatten_scene(scene, sort_triangles=True)
mats = default_materials()
rx = jnp.asarray([[30.0, -40.0, 1.5]], jnp.float32)
tx = jnp.asarray([[-120.0, 80.0, 45.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)

P, B = 1 << 20, 3
common = dict(num_paths=P, num_bounces=B, backend="pallas",
              keep_rays=False, precision="exact1", fuse4=True,
              parity="physical", unroll_bounces=False, fetch_bwd="xla",
              gather="take", launch_order="coherent")


def bench(tag, iters=4, **kw):
    cfg = TracerConfig(**{**common, **kw})

    def loss_fn(m, tx_):
        r = trace_paths(tris, m, rx, tx_, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    t0 = time.perf_counter()
    v, g = step(mats, tx); jax.block_until_ready(v)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={float(v):.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = step(mats, tx)
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / iters
    q = B * P * 2
    print(f"{tag}: {dt*1e3:.1f} ms  {q/dt/1e6:.2f} Mq/s", flush=True)
    return dt, float(v)


dt_a, loss_a = bench("A walk prepass=ray(pallas) bt=128", walk=True,
                     block_tris=128, walk_prepass="ray")
dt_b, loss_b = bench("B walk prepass=ray_xla bt=128 (control)", walk=True,
                     block_tris=128, walk_prepass="ray_xla")
print("loss match A==B:", loss_a == loss_b, flush=True)
bench("C walk prepass=ray bt=256", walk=True, block_tris=256,
      walk_prepass="ray")
print("done", flush=True)
