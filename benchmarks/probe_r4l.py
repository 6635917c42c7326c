#!/usr/bin/env python
"""Probe r4l: config5 resort REDO with stacked row-gather permutation (r4k) + tile-interval prepass
(VERDICT r3 next-round #4).  A/B vs the r4h baseline (768 ms, 8.2 Mq/s):

A. resort=False, walk_prepass="ray"      (r3 behaviour, control)
B. resort=True,  walk_prepass="ray"      (coherence only)
C. resort=True,  walk_prepass="tile"     (full r4 design)
D. C with block_tris=256
plus a trace of the best.
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
COMMON = dict(num_paths=P, num_bounces=B, backend="pallas",
              keep_rays=False, precision="exact1", fuse4=True,
              parity="physical", unroll_bounces=False, fetch_bwd="xla",
              gather="take", launch_order="coherent", walk=True,
              block_tris=128, grad_geometry=False)

ref_loss = None


def bench(tag, iters=4, trace=None, **kw):
    global ref_loss
    cfg = TracerConfig(**{**COMMON, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    loss = float(out[0])
    match = "" if ref_loss is None else f" match={np.isclose(loss, ref_loss, rtol=1e-6)}"
    if ref_loss is None:
        ref_loss = loss
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.6e}{match}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.1f} ms  {B*P*2/dt/1e6:.2f} Mq/s", flush=True)
    if trace:
        with jax.profiler.trace(f"/root/repo/benchmarks/logs/{trace}"):
            out = step(mats); jax.block_until_ready(out)
        print("trace written", flush=True)
    return dt


bench("A control resort=F wp=ray", resort=False, walk_prepass="ray")
bench("B resort=T wp=ray", resort=True, walk_prepass="ray")
bench("C resort=T wp=tile", resort=True, walk_prepass="tile",
      trace="trace_r4l")
bench("D C bt=256", resort=True, walk_prepass="tile", block_tris=256)
