#!/usr/bin/env python
"""Probe r3c: (1) rewritten scatter-add kernel standalone, (2) scan-mode
controls to localise the 330 ms pathology from r3b, (3) crash bisect for
unroll+pallas-bwd by bounce count, (4) fwd-only segment split."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.ops.fetch_pallas import pallas_scatter_add, \
    pallas_onehot_fetch
from hermespy_rt_tpu.ops.fetch import onehot_fetch

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P = 1 << 20
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
        key = str(e).split("\n")[0]
        print(f"{tag}: FAIL {key[:200]}", flush=True)
        return None, None


# ---- 1. fetch kernels standalone at 1M ----
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((256, 27)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 256, P), jnp.int32)
cot = jnp.asarray(rng.standard_normal((P, 27)).astype(np.float32))
_, sa = bench("scatter_add new", jax.jit(
    lambda i, g: pallas_scatter_add(i, g, 256, False)), idx, cot)
_, sx = bench("scatter_add xla", jax.jit(
    lambda t: jax.grad(lambda tt: jnp.vdot(onehot_fetch(idx, tt, "xla"),
                                           cot))(t)), table)
if sa is not None and sx is not None:
    rel = np.abs(np.asarray(sa) - np.asarray(sx)).max() / \
        np.abs(np.asarray(sx)).max()
    print(f"  scatter-add rel vs xla: {rel:.2e}", flush=True)
_, pf = bench("pallas fetch fwd", jax.jit(
    lambda i, t: pallas_onehot_fetch(i, t, False)), idx, table)
_, xf = bench("xla onehot fwd", jax.jit(
    lambda i, t: onehot_fetch(i, t)), idx, table)
_, tf = bench("take fwd", jax.jit(lambda i, t: t[i]), idx, table)
if pf is not None:
    print("  pallas fetch fwd exact:",
          bool((np.asarray(pf) == np.asarray(tf)).all()), flush=True)


def e2e(tag, iters=6, fwd_only=False, B=3, **kw):
    cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                       keep_rays=False, precision="exact1", **kw)
    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(loss_fn) if fwd_only else jax.jit(
        jax.value_and_grad(loss_fn))
    dt, out = bench(f"e2e {tag}", step, mats, iters=iters)
    if dt is not None:
        print(f"  {B*P*2/dt/1e6:.1f} Mq/s", flush=True)
    return dt


# ---- 2. scan controls ----
e2e("scan xla-bwd fuse4", unroll_bounces=False, fetch_bwd="xla", fuse4=True)
e2e("scan pallas-bwd fuse4 v2", unroll_bounces=False, fetch_bwd="pallas",
    fuse4=True)

# ---- 3. crash bisect: unroll + pallas-bwd by bounce count ----
for B in (1, 2, 3):
    e2e(f"unroll pallas-bwd B={B}", B=B, unroll_bounces=True,
        fetch_bwd="pallas", fuse4=True, iters=4)

# ---- 4. fwd segment split ----
e2e("fwd-only fuse4", fwd_only=True, unroll_bounces=True, fuse4=True)
e2e("fwd-only fuse4 take", fwd_only=True, unroll_bounces=True, fuse4=True,
    gather="take")
e2e("fwd-only fuse4 physical", fwd_only=True, unroll_bounces=True,
    fuse4=True, parity="physical")
print("done", flush=True)
