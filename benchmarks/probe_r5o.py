#!/usr/bin/env python
"""Probe r5o: the config-5 block_rays sweep probe_r5m died before (its
nrx=8 fused row hit the loop-backward scoped-vmem OOM, now fixed by
nrx-scaling the backward tile).  Rows: block_rays 512 / 1024(=shipping,
628.7 ms probe_r5i3) / 2048 under the any-hit shadow walk."""
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

city = flatten_scene(load_scene(make_city("/tmp/city131k")),
                     sort_triangles=True)
mats = default_materials()
rxc = jnp.asarray([[30.0, -40.0, 1.5]], jnp.float32)
txc = jnp.asarray([[-120.0, 80.0, 45.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)
C5 = dict(num_paths=1 << 20, num_bounces=3, backend="pallas",
          keep_rays=False, precision="exact1", fuse4=True,
          parity="physical", unroll_bounces=False, fetch_bwd="xla",
          gather="take", launch_order="coherent", walk=True,
          block_tris=128, walk_prepass="ray", grad_geometry=False)


def bench(tag, iters=4, **kw):
    cfg = TracerConfig(**{**C5, **kw})

    def loss_fn(m):
        r = trace_paths(city, m, rxc, txc, z1, z1, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={float(out[0]):.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.1f} ms  {3*(1<<20)*2/dt/1e6:.2f} Mq/s",
          flush=True)
    return dt


bench("c5 br=512", block_rays=512)
bench("c5 br=2048", block_rays=2048)
print("done", flush=True)
