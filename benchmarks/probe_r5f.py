#!/usr/bin/env python
"""Probe r5f: the whole-loop slim fused backward (ONE Pallas kernel for the
entire bounce loop's backward, ops/bounce_fused.py::fused_loop_slim) vs the
r4/r5a per-stage slim backwards (6 serialized-accumulator kernel launches,
8.1 ms device — probe_r5d attribution).  Bench flags, canyon, 1M rays, B=3.

Rows:
  fwd-only      — unchanged forward kernels (baseline 21.8 ms, probe_r5b)
  fwd+bwd loop  — the new whole-loop backward (ask: <= 27.3 ms = 1.25x fwd)
  fwd+bwd steps — the old per-stage path, forced via unroll_bounces=False
                  (scan; slightly different forward plumbing — context row)
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
            keep_rays=False, precision="exact1", fuse4=True,
            compact_rays=True, launch_order="coherent",
            grad_geometry=False, grad_positions=False,
            gather="onehot_pallas", fetch_bwd="xla", shade="fused")


def bench(tag, bwd=True, iters=8, **kw):
    cfg = TracerConfig(**{**BASE, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z1, z1, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn) if bwd else loss_fn)
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={float(out[0] if bwd else out):.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms  {3*(1<<20)/dt/1e6:.1f} Mray/s "
          f"{3*(1<<20)*2/dt/1e6:.1f} Mq/s", flush=True)
    return dt, (float(out[0]) if bwd else float(out))


from hermespy_rt_tpu.ops import bounce_fused

dt_f, _ = bench("fwd-only", bwd=False, unroll_bounces=True)
results = {}
for bb in (2048, 1024):
    bounce_fused._LOOP_BWD_BLOCK = bb
    try:
        results[bb] = bench(f"fwd+bwd loop bwd_block={bb}",
                            unroll_bounces=True)
    except Exception as e:
        print(f"fwd+bwd loop bwd_block={bb}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
bounce_fused._LOOP_BWD_BLOCK = 2048
dt_s, loss_s = bench("fwd+bwd steps(scan)", unroll_bounces=False)
for bb, (dt_l, loss_l) in results.items():
    print(f"bwd_block={bb}: loss match loop==steps: {loss_l == loss_s} "
          f"({loss_l:.6e} vs {loss_s:.6e})  "
          f"bwd/fwd {dt_l/dt_f:.3f}x (steps {dt_s/dt_f:.3f}x)", flush=True)
print("done", flush=True)
