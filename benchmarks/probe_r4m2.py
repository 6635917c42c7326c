#!/usr/bin/env python
"""Probe r4m2: finish the r4m matrix — nrx=16 xla row (fused OOMs scoped
vmem at nrx=16, probe_r4m.log), plus nrx=8 for the bench row decision."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
import warnings
warnings.filterwarnings("ignore")

scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene)
mats = default_materials()
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)
P, B = 1 << 20, 3

BASE = dict(num_paths=P, num_bounces=B, backend="auto", keep_rays=False,
            precision="exact1", unroll_bounces=True, fuse4=True,
            compact_rays=True, launch_order="coherent",
            grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla")


def bench(tag, nrx=1, iters=4, **kw):
    rx = (jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
          + jnp.arange(nrx, dtype=jnp.float32)[:, None]
          * jnp.asarray([[1.5, -2.0, 0.25]], jnp.float32))
    zrx = jnp.zeros((nrx, 3), jnp.float32)
    cfg = TracerConfig(**{**BASE, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, zrx, z1, jnp.float32(3.0), cfg)
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
    q = B * P * (1 + nrx)
    print(f"{tag}: {dt*1e3:.3f} ms  {q/dt/1e6:.1f} Mq/s", flush=True)
    return dt


bench("nrx=16 xla", nrx=16, shade="xla")
bench("nrx=8 xla", nrx=8, shade="xla")
bench("nrx=8 fused", nrx=8, shade="fused", grad_positions=False)
