#!/usr/bin/env python
"""Probe r4h: config5 (131k-tri city) attribution + the cheap levers
(VERDICT r3 next-round #4: 8.1 -> >=25 Mq/s).

config5_r3 ran with full geometric gradients; the canyon's single biggest
r3 lever (grad_geometry=False: materials-only training grads, geometric
backward DCE'd) was never applied to the big scene.  A/B here, plus a
profiler trace of the best variant for the shared-prepass design."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax, jax.numpy as jnp
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
COMMON = dict(num_paths=P, num_bounces=B, backend="pallas",
              keep_rays=False, precision="exact1", fuse4=True,
              parity="physical", unroll_bounces=False, fetch_bwd="xla",
              gather="take", launch_order="coherent", walk=True,
              block_tris=128)


def bench(tag, iters=4, trace=None, tx_grad=True, **kw):
    cfg = TracerConfig(**{**COMMON, **kw})

    def loss_fn(m, tx_):
        r = trace_paths(tris, m, rx, tx_, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(
        loss_fn, argnums=(0, 1) if tx_grad else 0))
    t0 = time.perf_counter()
    out = step(mats, tx); jax.block_until_ready(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={float(out[0]):.4e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats, tx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.1f} ms  {B*P*2/dt/1e6:.2f} Mq/s", flush=True)
    if trace:
        with jax.profiler.trace(f"/root/repo/benchmarks/logs/{trace}"):
            out = step(mats, tx); jax.block_until_ready(out)
        print(f"{tag}: trace written", flush=True)
    return dt


bench("A config5_r3 flags (geom grads)", iters=2)
bench("B grad_geometry=False", grad_geometry=False, tx_grad=True)
bench("C B + fwd-only-style no-tx-grad", grad_geometry=False, tx_grad=False,
      trace="trace_r4h")
bench("D C + block_tris=256", grad_geometry=False, tx_grad=False,
      block_tris=256)
