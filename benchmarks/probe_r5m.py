#!/usr/bin/env python
"""Probe r5m: (1) does the whole-loop + material-level slim backward flip
the fused-vs-xla decision at nrx=4/8?  (probe_r5b measured the per-stage
fused at 222.1 vs xla 243.6 Mq/s at nrx=4 — before fused_loop_slim.)
(2) config-5 block_rays sweep under the any-hit shadow walk (smaller ray
tiles complete their any-hit early-out sooner; 1024 is the r3-tuned
default from BEFORE any-hit existed)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, load_scene
from hermespy_rt_tpu.tracer import trace_paths
import warnings
warnings.filterwarnings("ignore")

mats = default_materials()
z1 = jnp.zeros((1, 3), jnp.float32)

# --- part 1: canyon nrx sweep, fused(loop bwd) vs xla -----------------
canyon = flatten_scene(
    load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"),
    sort_triangles="morton")
tx1 = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
BASE = dict(num_paths=1 << 20, num_bounces=3, backend="auto",
            keep_rays=False, precision="exact1", fuse4=True,
            compact_rays=True, launch_order="coherent",
            grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla",
            unroll_bounces=True)


def bench_canyon(tag, nrx, shade, iters=6):
    rx = (jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
          + jnp.arange(nrx, dtype=jnp.float32)[:, None]
          * jnp.asarray([[1.5, -2.0, 0.25]], jnp.float32))
    zr = jnp.zeros((nrx, 3), jnp.float32)
    cfg = TracerConfig(**BASE, shade=shade,
                       grad_positions=(shade != "fused"))

    def loss_fn(m):
        r = trace_paths(canyon, m, rx, tx1, zr, z1, jnp.float32(3.0), cfg)
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
    return dt


for nrx in (4, 8):
    bench_canyon(f"nrx={nrx} fused(loop bwd)", nrx, "fused")
    bench_canyon(f"nrx={nrx} xla (control)", nrx, "xla")

# --- part 2: config-5 block_rays sweep --------------------------------
from config5_scene import make_city
city = flatten_scene(load_scene(make_city("/tmp/city131k")),
                     sort_triangles=True)
rxc = jnp.asarray([[30.0, -40.0, 1.5]], jnp.float32)
txc = jnp.asarray([[-120.0, 80.0, 45.0]], jnp.float32)
C5 = dict(num_paths=1 << 20, num_bounces=3, backend="pallas",
          keep_rays=False, precision="exact1", fuse4=True,
          parity="physical", unroll_bounces=False, fetch_bwd="xla",
          gather="take", launch_order="coherent", walk=True,
          block_tris=128, walk_prepass="ray", grad_geometry=False)


def bench_c5(tag, iters=4, **kw):
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


bench_c5("c5 br=512", block_rays=512)
bench_c5("c5 br=2048", block_rays=2048)
print("done", flush=True)
