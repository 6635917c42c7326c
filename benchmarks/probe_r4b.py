#!/usr/bin/env python
"""Probe r4b: fused bounce kernels with grad_positions=False (the in-kernel
backward DCE) — canyon 1M rays B=3 fwd+bwd, nrx 1/4; profile trace."""
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

tris = flatten_scene(load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
mats = default_materials()
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)

BASE = dict(num_paths=1 << 20, backend="auto", keep_rays=False,
            precision="exact1", unroll_bounces=True, fuse4=True,
            compact_rays=True, launch_order="coherent",
            grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla")


def bench(shade, nrx=1, gp=True, iters=10, tag=""):
    rx = (jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
          + jnp.arange(nrx, dtype=jnp.float32)[:, None]
          * jnp.asarray([[1.5, -2.0, 0.25]], jnp.float32))
    zrx = jnp.zeros((nrx, 3), jnp.float32)
    cfg = TracerConfig(shade=shade, num_bounces=3, grad_positions=gp,
                       **BASE)

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
    q = 3 * (1 << 20) * (1 + nrx)
    print(f"{tag}: {dt*1e3:.3f} ms  {q/dt/1e6:.1f} Mq/s", flush=True)
    return step


step = bench("fused", nrx=1, gp=False, tag="fused gp=F nrx=1")
with jax.profiler.trace("/root/repo/benchmarks/logs/trace_r4b"):
    out = step(mats); jax.block_until_ready(out)
print("trace written", flush=True)
bench("fused", nrx=4, gp=False, iters=5, tag="fused gp=F nrx=4")
