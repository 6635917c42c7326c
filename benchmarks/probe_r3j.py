#!/usr/bin/env python
"""Probe r3j: the rewritten (transposed-layout) VMEM one-hot fetch —
micro at 1M rays and e2e with xla/pallas backward, vs the XLA one-hot."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.ops.fetch import onehot_fetch
from hermespy_rt_tpu.ops.fetch_pallas import pallas_onehot_fetch

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


# micro: 1M-ray fetch fwd + grad
rng = np.random.default_rng(0)
T, C, R = 256, 27, 1 << 20
table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32) * 37.0)
idx = jnp.asarray(rng.integers(0, T, R).astype(np.int32))
_, o1 = bench("micro fwd xla-onehot", jax.jit(
    lambda i, tb: onehot_fetch(i, tb, "xla")), idx, table)
_, o2 = bench("micro fwd pallas-v2", jax.jit(
    lambda i, tb: pallas_onehot_fetch(i, tb, False)), idx, table)
if o1 is not None and o2 is not None:
    print("  micro exact match:",
          bool((np.asarray(o1) == np.asarray(o2)).all()), flush=True)
bench("micro grad pallas-v2/xla-bwd", jax.jit(jax.grad(
    lambda tb: jnp.sum(pallas_onehot_fetch(idx, tb, False, "xla") ** 2))),
    table)
bench("micro grad pallas-v2/pallas-bwd", jax.jit(jax.grad(
    lambda tb: jnp.sum(pallas_onehot_fetch(idx, tb, False, "pallas") ** 2))),
    table)


def e2e(tag, iters=8, P=1 << 20, B=3, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if dt is not None:
        print(f"  loss {float(out[0]):.8e}  {B*P*2/dt/1e6:.1f} Mq/s",
              flush=True)


import warnings
warnings.filterwarnings("ignore")
BEST = dict(unroll_bounces=True, fuse4=True, compact_rays=True,
            launch_order="coherent", grad_geometry=False, fetch_bwd="xla")
e2e("best + pallas-fetch-v2", gather="onehot_pallas", **BEST)
e2e("best + pallas-fetch-v2 + remat", gather="onehot_pallas", remat="hits",
    **BEST)
e2e("best + pallas-fetch-v2 + pallas-bwd", gather="onehot_pallas",
    iters=2, **{**BEST, "fetch_bwd": "pallas"})
print("done", flush=True)
