#!/usr/bin/env python
"""Probe r4e: backward attribution for the fused+slim path (VERDICT r3
next-round #3).  Captures profiler traces of the fused gp=F slim config,
fwd-only and fwd+bwd — the diff is the backward's device-op budget."""
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
tris = flatten_scene(scene, sort_triangles="morton")
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)

cfg = TracerConfig(num_paths=1 << 20, num_bounces=3, backend="auto",
                   keep_rays=False, precision="exact1", unroll_bounces=True,
                   fuse4=True, compact_rays=True, launch_order="coherent",
                   grad_geometry=False, grad_positions=False,
                   gather="onehot_pallas", fetch_bwd="xla", shade="fused")


def loss_fn(m):
    r = trace_paths(tris, m, rx, tx, z1, z1, jnp.float32(3.0), cfg)
    return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
            + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9


for tag, step in (("fwd", jax.jit(loss_fn)),
                  ("fwdbwd", jax.jit(jax.value_and_grad(loss_fn)))):
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(8):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 8
    print(f"{tag}: {dt*1e3:.3f} ms  {3*(1<<20)*2/dt/1e6:.1f} Mq/s",
          flush=True)
    with jax.profiler.trace(f"/root/repo/benchmarks/logs/trace_r4e_{tag}"):
        out = step(mats); jax.block_until_ready(out)
    print(f"{tag}: trace written", flush=True)
