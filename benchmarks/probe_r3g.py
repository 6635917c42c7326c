#!/usr/bin/env python
"""Probe r3g: remat="hits" (save only kernel decisions + payload rows,
recompute elementwise shading in the backward) stacked on the r3f levers;
plus a profiler shot of the best config."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
tris = flatten_scene(load_hrt(CANYON))
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)


def bench(tag, fn, *args, iters=8):
    try:
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: OK compile {c:.1f}s  {dt*1e3:.3f} ms", flush=True)
        return dt, out
    except Exception as e:
        print(f"{tag}: FAIL {str(e).splitlines()[0][:200]}", flush=True)
        return None, None


def make_step(fwd_only=False, P=1 << 20, B=3, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    return jax.jit(loss_fn) if fwd_only else jax.jit(
        jax.value_and_grad(loss_fn))


def e2e(tag, iters=8, fwd_only=False, P=1 << 20, B=3, **kw):
    step = make_step(fwd_only=fwd_only, P=P, B=B, **kw)
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if dt is not None:
        print(f"  loss {float(out if fwd_only else out[0]):.8e}"
              f"  {B*P*2/dt/1e6:.1f} Mq/s", flush=True)
    return dt


import warnings
warnings.filterwarnings("ignore")
BASE = dict(unroll_bounces=True, fuse4=True, compact_rays=True,
            launch_order="coherent")
BEST = dict(grad_geometry=False, fetch_bwd="xla", **BASE)
e2e("remat only", remat="hits", **BASE)
e2e("best + remat", remat="hits", **BEST)
e2e("best + remat scan", remat="hits", unroll_bounces=False,
    **{k: v for k, v in BEST.items() if k != "unroll_bounces"})
e2e("best fwd-only (floor)", fwd_only=True,
    **{k: v for k, v in BEST.items() if k not in ("grad_geometry",
                                                  "fetch_bwd")})
e2e("best + remat B=8", remat="hits", B=8, iters=4, **BEST)
e2e("best + remat P=4M", remat="hits", P=1 << 22, iters=4, **BEST)
# profiler shot of the winner (best + remat assumed; re-measured inline)
step = make_step(remat="hits", **BEST)
try:
    _ = step(mats); jax.block_until_ready(_)
    with jax.profiler.trace("/root/repo/benchmarks/logs/trace_r3g"):
        out = step(mats)
        jax.block_until_ready(out)
    print("profiler trace written", flush=True)
except Exception as e:
    print("profiler FAIL", str(e)[:200], flush=True)
print("done", flush=True)
