#!/usr/bin/env python
"""Probe r3f: backward-overhead levers measured e2e on the canyon.

- grad_geometry=False: stop-grad geometry payload -> XLA DCEs the
  cross-bounce geometric backward (material grads bit-identical, proven on
  CPU in tests/test_grad.py).
- gather="onehot_pallas" + fetch_bwd="xla": VMEM one-hot fetch forward
  (no 0.5 GB HBM one-hot per fetch), pure-XLA backward (keeps the grad
  graph at 6+6 Pallas calls -> does the remote compiler take it?).
"""
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


def e2e(tag, iters=8, fwd_only=False, P=1 << 20, B=3, nrx=1, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    rxs = jnp.tile(rx, (nrx, 1)) + jnp.arange(nrx, dtype=jnp.float32)[:, None]
    def loss_fn(m):
        r = trace_paths(tris, m, rxs, tx, jnp.zeros((nrx, 3)), z,
                        jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(loss_fn) if fwd_only else jax.jit(
        jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if dt is not None:
        q = B * P * (1 + nrx)
        print(f"  loss {float(out if fwd_only else out[0]):.8e}"
              f"  {q/dt/1e6:.1f} Mq/s", flush=True)
    return dt


import warnings
warnings.filterwarnings("ignore")
BASE = dict(unroll_bounces=True, fuse4=True, compact_rays=True,
            launch_order="coherent")
e2e("cc base (re-measure)", **BASE)
e2e("cc gradgeo=F", grad_geometry=False, **BASE)
e2e("cc pallas-fetch xla-bwd", gather="onehot_pallas", fetch_bwd="xla",
    **BASE)
e2e("cc gradgeo=F + pallas-fetch", grad_geometry=False,
    gather="onehot_pallas", fetch_bwd="xla", **BASE)
e2e("cc gradgeo=F + pallas-fetch + pallas-bwd", grad_geometry=False,
    gather="onehot_pallas", fetch_bwd="pallas", iters=2, **BASE)
e2e("fwd-only pallas-fetch", fwd_only=True, gather="onehot_pallas", **BASE)
e2e("physical gradgeo=F + pallas-fetch", parity="physical",
    grad_geometry=False, gather="onehot_pallas", fetch_bwd="xla", **BASE)
e2e("nrx4 gradgeo=F + pallas-fetch", nrx=4, iters=4, grad_geometry=False,
    gather="onehot_pallas", fetch_bwd="xla", **BASE)
print("done", flush=True)
