#!/usr/bin/env python
"""Probe r3n: fast_exp_neg scat + canyon walk retry (post visit-DMA fix,
in-kernel features) + kernel block sweep, on the best config."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths

tris = flatten_scene(load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
tris_m = flatten_scene(load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"), sort_triangles=True)
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


def e2e(tag, iters=8, fwd_only=False, P=1 << 20, B=3, soa=None, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    t_ = tris if soa is None else soa
    def loss_fn(m):
        r = trace_paths(t_, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(loss_fn) if fwd_only else jax.jit(
        jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if dt is not None:
        print(f"  loss {float(out if fwd_only else out[0]):.8e}"
              f"  {B*P*2/dt/1e6:.1f} Mq/s", flush=True)


import warnings
warnings.filterwarnings("ignore")
BEST = dict(unroll_bounces=True, fuse4=True, compact_rays=True,
            launch_order="coherent", grad_geometry=False, fetch_bwd="xla",
            gather="onehot_pallas")
e2e("best + fastexp", **BEST)
e2e("best + fastexp fwd-only", fwd_only=True,
    **{k: v for k, v in BEST.items() if k not in ("grad_geometry",
                                                  "fetch_bwd")})
e2e("best + walk bt64", walk=True, block_tris=64, **BEST)
e2e("best + walk bt64 morton", walk=True, block_tris=64, soa=tris_m, **BEST)
e2e("best + walk bt32 morton", walk=True, block_tris=32, soa=tris_m, **BEST)
e2e("best br2048", block_rays=2048, **BEST)
e2e("best bt128", block_tris=128, **BEST)
print("done", flush=True)
