#!/usr/bin/env python
"""Probe r5n: scatter-contraction lowering A/B in the whole-loop slim
backward (probe_r5j2: the [17, B] x [36, B] lane-lane dot costs ~2.5 ms —
suspected Mosaic operand relayout).  Rows: shipping form (oht LHS),
swapped form (one-hot RHS + tiny [36, 17] output transpose)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.ops import bounce_fused
import warnings
warnings.filterwarnings("ignore")

scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene, sort_triangles="morton")
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)

cfg = TracerConfig(num_paths=1 << 20, num_bounces=3, backend="auto",
                   keep_rays=False, precision="exact1", fuse4=True,
                   compact_rays=True, launch_order="coherent",
                   unroll_bounces=True, grad_geometry=False,
                   grad_positions=False, gather="onehot_pallas",
                   fetch_bwd="xla", shade="fused")


def bench(tag, ablate=(), iters=8):
    bounce_fused._ABLATE = frozenset(ablate)

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z1, z1, jnp.float32(3.0), cfg)
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
    print(f"{tag}: {dt*1e3:.3f} ms  {3*(1<<20)*2/dt/1e6:.1f} Mq/s",
          flush=True)
    bounce_fused._ABLATE = frozenset()
    return dt


bench("shipping (oht LHS)")
bench("swapped (oht RHS)", ("swapscatter",))
print("done", flush=True)
