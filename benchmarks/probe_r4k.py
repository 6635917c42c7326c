#!/usr/bin/env python
"""Probe r4k: r4j redo with honest timing (per-iter block + scalar pull)
and an IN-SCAN variant — trace_r4i shows in-scan gathers lower to a
kCustom fusion with the s32 index in SMEM (S(1)) at ~22 ms per 1M-row
gather; standalone they are ~us.  Which formulations keep the fast
emitter inside lax.scan?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import warnings
warnings.filterwarnings("ignore")

R, C = 1 << 20, 24
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 2**27, size=R).astype(np.int32))
x = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
xt = jnp.asarray(np.asarray(x).T)


def bench(tag, fn, *args, iters=8):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms", flush=True)


def scan3(body):
    def fn(k, x_):
        def step(carry, _):
            kk, xx = carry
            return body(kk, xx), None
        (k2, x2), _ = jax.lax.scan(step, (k, x_), None, length=3)
        return jnp.float32(0) + x2.ravel()[0] + k2[0]
    return fn


bench("argsort alone", lambda k: jnp.argsort(k)[:8], key)
bench("row gather [R,24] standalone", lambda x_, k: x_[jnp.argsort(k)][:2],
      x, key)
bench("scan3: row gather x[order]", scan3(
    lambda k, x_: (k + 1, x_[jnp.argsort(k)])), key, x)
bench("scan3: row gather unique_indices", scan3(
    lambda k, x_: (k + 1, jnp.take(x_, jnp.argsort(k), axis=0,
                                   unique_indices=True,
                                   indices_are_sorted=False))), key, x)
bench("scan3: variadic sort [24,R]", scan3(
    lambda k, xt_: (k + 1, jax.lax.sort(
        (jnp.broadcast_to(k[None], (C, R)), xt_),
        dimension=1, num_keys=1)[1])), key, xt)
bench("scan3: sort pairs per row via vmap", scan3(
    lambda k, xt_: (k + 1, jax.vmap(
        lambda row: jax.lax.sort((k, row), num_keys=1)[1])(xt_))), key, xt)
