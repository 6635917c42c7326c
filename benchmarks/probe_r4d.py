#!/usr/bin/env python
"""Probe r4d: does the completed slim (grad_positions=False) Pallas
backward close the fused-megakernel gap on the chip?

probe_r4a measured fused B=3 fwd+bwd at 47.2 ms vs 34.8 ms XLA control;
probe_r4b's gp=F (generic bwd + DCE) gave 43.2 ms.  The slim bwd kernels
(commit bfd8f93) recompute only the Fresnel/scattering amplitude chain at
saved residuals instead of the full geometric chain.  Also splits fwd-only
walls for both paths to attribute what remains.
"""
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

BASE = dict(num_paths=1 << 20, num_bounces=3, backend="auto",
            keep_rays=False, precision="exact1", unroll_bounces=True,
            fuse4=True, compact_rays=True, launch_order="coherent",
            grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla")


def bench(tag, grad=True, iters=8, **kw):
    cfg = TracerConfig(**{**BASE, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z1, z1, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn) if grad else loss_fn)
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    v = out[0] if grad else out
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={float(v):.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms  {3*(1<<20)*2/dt/1e6:.1f} Mq/s", flush=True)
    return dt


bench("xla fwd-only", grad=False, shade="xla", grad_positions=True)
bench("xla fwd+bwd (control)", shade="xla", grad_positions=True)
bench("fused fwd-only", grad=False, shade="fused", grad_positions=False)
bench("fused gp=F slim fwd+bwd", shade="fused", grad_positions=False)
