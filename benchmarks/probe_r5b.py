#!/usr/bin/env python
"""Probe r5b: (1) the eta-slim fused backward (VERDICT r4 item 2: pre bwd
scatter-adds 12 columns instead of 27, post bwd 2; shared in-kernel one-hot)
— target fwd+bwd <= 27 ms at the bench flags (r4d: fused fwd 21.8,
fwd+bwd 31.6, slim bwd kernels 8.1 ms device); (2) the batched fused shadow
query + nrx-scaled block: does shade="fused" now beat xla at nrx=4/8 and
compile at nrx=16 (r4m: 224.6 vs 242.1 at nrx=4; scoped-vmem OOM at 16)?
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
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)

BASE = dict(num_paths=1 << 20, num_bounces=3, backend="auto",
            keep_rays=False, precision="exact1", unroll_bounces=True,
            fuse4=True, compact_rays=True, launch_order="coherent",
            grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla")


def bench(tag, nrx=1, grad=True, iters=8, **kw):
    cfg = TracerConfig(**{**BASE, **kw})
    rx = (jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
          + jnp.arange(nrx, dtype=jnp.float32)[:, None]
          * jnp.asarray([[1.5, -2.0, 0.25]], jnp.float32))
    zrx = jnp.zeros((nrx, 3), jnp.float32)

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, zrx, z1, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn) if grad else loss_fn)
    try:
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
        q = 3 * (1 << 20) * (1 + nrx)
        print(f"{tag}: {dt*1e3:.3f} ms  {q/dt/1e6:.1f} Mq/s", flush=True)
        return dt
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


# --- item 2: the slim backward at the nrx=1 bench flags ---
bench("nrx=1 fused fwd-only", grad=False, shade="fused",
      grad_positions=False)
bench("nrx=1 fused slim fwd+bwd", shade="fused", grad_positions=False)
bench("nrx=1 xla fwd+bwd (control)", shade="xla")
# kernel block size at the trace level (probe_r5a standalone: br
# 2048/4096 ~3% over 1024; dead-tile skip granularity may eat it back)
bench("nrx=1 fused slim br=2048", shade="fused", grad_positions=False,
      block_rays=2048)

# --- item 10: batched fused shadow + nrx-scaled block ---
for nrx in (4, 8, 16):
    bench(f"nrx={nrx} fused slim", nrx=nrx, iters=4, shade="fused",
          grad_positions=False)
    bench(f"nrx={nrx} xla (control)", nrx=nrx, iters=4, shade="xla")
print("done", flush=True)
