#!/usr/bin/env python
"""Probe r5g: config-5 attribution after the r5 levers (Pallas prepass,
material-indirect take fetch).  probe_r5e: prepass=ray(pallas) 725.3 ms
(8.67 Mq/s) vs ray_xla 764.5 — only a 5% move, so the r4h '~26% prepass'
read was wrong or the cost lives elsewhere.  Pin it down:

  A  current default, fwd+bwd      (the probe_r5e A row, post-fetch-edit)
  B  A fwd-only                    (isolates the backward)
  C  A with unroll_bounces=True    (per-op attribution; scan hides the
                                    body inside one XLA 'while')
  -> profiler trace of C -> benchmarks/logs/trace_r5g
"""
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
common = dict(num_paths=P, num_bounces=B, backend="pallas",
              keep_rays=False, precision="exact1", fuse4=True,
              parity="physical", unroll_bounces=False, fetch_bwd="xla",
              gather="take", launch_order="coherent", walk=True,
              block_tris=128, walk_prepass="ray", grad_geometry=False)


def bench(tag, iters=4, bwd=True, trace=None, **kw):
    cfg = TracerConfig(**{**common, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn) if bwd else loss_fn)
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    v = float(out[0]) if bwd else float(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={v:.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.1f} ms  {B*P*2/dt/1e6:.2f} Mq/s", flush=True)
    if trace:
        with jax.profiler.trace(f"/root/repo/benchmarks/logs/{trace}"):
            out = step(mats); jax.block_until_ready(out)
        print(f"{tag}: trace written", flush=True)
    return dt


bench("A default fwd+bwd")
bench("B fwd-only", bwd=False)
bench("C unrolled fwd+bwd", unroll_bounces=True, trace="trace_r5g")
print("done", flush=True)
