#!/usr/bin/env python
"""Probe r3q: smaller ray blocks = finer dead-tile skip granularity at
bounces 1-2 (liveness flags skip whole ray tiles; 46%/24% live)."""
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
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)
BEST = dict(unroll_bounces=True, fuse4=True, compact_rays=True,
            launch_order="coherent", grad_geometry=False, fetch_bwd="xla",
            gather="onehot_pallas")

def e2e(tag, iters=8, **kw):
    cfg = TracerConfig(num_paths=1 << 20, num_bounces=3, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    try:
        t0 = time.perf_counter(); out = step(mats); jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(mats)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: OK compile {c:.1f}s  {dt*1e3:.3f} ms  "
              f"{3*(1<<20)*2/dt/1e6:.1f} Mq/s  loss {float(out[0]):.6e}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {str(e).splitlines()[0][:160]}", flush=True)

e2e("br512", block_rays=512, **BEST)
e2e("br256", block_rays=256, **BEST)
e2e("br512 bt128", block_rays=512, block_tris=128, **BEST)
print("done", flush=True)
