#!/usr/bin/env python
"""Probe r3d: minimal-repro bisect of the unroll+pallas-bwd compiler crash,
plus scan-mode controls (fuse4 on/off, xla vs pallas bwd)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
from hermespy_rt_tpu.ops.fetch import onehot_fetch
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect

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


# ---- minimal crash repros ----
rng = np.random.default_rng(0)
table0 = jnp.asarray(rng.standard_normal((256, 27)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 256, P), jnp.int32)
o = jnp.asarray(rng.uniform(-60, 60, (P, 3)).astype(np.float32))
dd = rng.standard_normal((P, 3)).astype(np.float32)
dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
d = jnp.asarray(dd)

# (a) grad of one pallas-bwd fetch alone
bench("repro a: grad 1 fetch", jax.jit(jax.grad(
    lambda t: jnp.vdot(onehot_fetch(idx, t, "pallas"), idx[:, None] * 0.5))),
    table0)
# (b) grad of fetch whose idx comes from an intersect kernel
def loss_b(t):
    _, i1 = pallas_intersect(o, d, tris, precision="exact1")
    rows = onehot_fetch(jnp.maximum(i1, 0), t, "pallas")
    return jnp.sum(rows * rows)
bench("repro b: intersect+fetch", jax.jit(jax.grad(loss_b)), table0)
# (c) two fetches
def loss_c(t):
    r1 = onehot_fetch(idx, t, "pallas")
    r2 = onehot_fetch(jnp.flip(idx), t, "pallas")
    return jnp.sum(r1 * r1) + jnp.sum(r2 * r2)
bench("repro c: 2 fetches", jax.jit(jax.grad(loss_c)), table0)
# (d) like b but xla bwd (control)
def loss_d(t):
    _, i1 = pallas_intersect(o, d, tris, precision="exact1")
    rows = onehot_fetch(jnp.maximum(i1, 0), t, "xla")
    return jnp.sum(rows * rows)
bench("repro d: intersect+fetch xla-bwd", jax.jit(jax.grad(loss_d)), table0)


def e2e(tag, iters=8, fwd_only=False, B=3, **kw):
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


# ---- micro A/B in-grad-graph scatter, input-varied to bust any caching ----
cots = [jnp.asarray(rng.standard_normal((P, 27)).astype(np.float32))
        for _ in range(4)]
for bwd in ("xla", "pallas"):
    f = jax.jit(lambda t, c, bwd=bwd: jax.grad(
        lambda tt: jnp.vdot(onehot_fetch(idx, tt, bwd), c))(t))
    try:
        out = f(table0, cots[0]); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for k in range(16):
            out = f(table0, cots[k % 4])
        jax.block_until_ready(out)
        print(f"grad-fetch {bwd}: {(time.perf_counter()-t0)/16*1e3:.3f} ms",
              flush=True)
    except Exception as e:
        print(f"grad-fetch {bwd}: FAIL {str(e)[:160]}", flush=True)

# ---- kernel g-preexp A/B (now default; compare vs nofuse4 too) ----
exf = jnp.full((P,), -1, jnp.int32)
for tag, kw in (("k gpre fuse4 br2048", dict(fuse4=True, block_rays=2048)),
                ("k gpre fuse4 br1024", dict(fuse4=True)),
                ("k gpre nofuse4 br2048", dict(block_rays=2048))):
    fn = jax.jit(lambda o_, d_, e_, kw=kw: pallas_intersect(
        o_, d_, tris, exclude=e_, precision="exact1", **kw))
    bench(tag, fn, o, d, exf, iters=16)

# ---- e2e with everything new ----
e2e("unroll pallas-bwd v3", unroll_bounces=True, fetch_bwd="pallas",
    fuse4=True)
e2e("unroll pallas-bwd v3 br2048", unroll_bounces=True, fetch_bwd="pallas",
    fuse4=True, block_rays=2048)
e2e("unroll xla-bwd gpre br2048", unroll_bounces=True, fetch_bwd="xla",
    fuse4=True, block_rays=2048)

# ---- scan controls: isolate the 106/330 ms scan regressions ----
e2e("scan xla-bwd nofuse4", unroll_bounces=False, fetch_bwd="xla")
e2e("unroll xla-bwd fuse4 again", unroll_bounces=True, fetch_bwd="xla",
    fuse4=True)
# fwd segment split (from r3c tail, likely unreached)
e2e("fwd-only fuse4", fwd_only=True, unroll_bounces=True, fuse4=True,
    fetch_bwd="xla")
e2e("fwd-only fuse4 take", fwd_only=True, unroll_bounces=True, fuse4=True,
    gather="take", fetch_bwd="xla")
e2e("fwd-only fuse4 physical", fwd_only=True, unroll_bounces=True,
    fuse4=True, parity="physical", fetch_bwd="xla")
print("done", flush=True)
