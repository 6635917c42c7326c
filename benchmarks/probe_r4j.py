#!/usr/bin/env python
"""Probe r4j: how to APPLY a 1M-ray permutation cheaply on TPU.

trace_r4i: ~30 per-column jnp.take gathers per bounce cost ~1.35 s/step —
the resort idea lives or dies on this.  Candidates, all applying the same
random permutation to 24 f32 rows of 1M:

a. 24 separate x[order] gathers ([R] each — the r4i implementation)
b. ONE row gather of a stacked [R, 24] matrix (contiguous 96-byte rows)
c. lax.sort with key broadcast over a [24, R] payload (dimension=1)
d. argsort alone (key only) for reference
e. scatter (inverse application): zeros[R,24].at[order].set(x)
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import warnings
warnings.filterwarnings("ignore")

R, C = 1 << 20, 24
rng = np.random.default_rng(0)
key_np = rng.integers(0, 2**27, size=R).astype(np.int32)
x_np = rng.standard_normal((R, C)).astype(np.float32)
key = jnp.asarray(key_np)
x = jnp.asarray(x_np)          # [R, C]
xt = jnp.asarray(x_np.T)       # [C, R]
order = jnp.argsort(key)


def bench(tag, fn, *args, iters=16):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms", flush=True)


bench("d argsort(key) alone", lambda k: jnp.argsort(k), key)
bench("a 24 x [R] gathers", lambda xt_, o_: tuple(
    xt_[i][o_] for i in range(C)), xt, order)
bench("b one [R,24] row gather", lambda x_, o_: x_[o_], x, order)
bench("c variadic sort [24,R] payload", lambda k, xt_: jax.lax.sort(
    (jnp.broadcast_to(k[None], (C, R)), xt_), dimension=1, num_keys=1),
    key, xt)
bench("e scatter rows [R,24]", lambda x_, o_: jnp.zeros_like(x_).at[o_].set(
    x_), x, order)
bench("c2 sort key+iota then b", lambda k, x_: x_[
    jax.lax.sort((k, jax.lax.iota(jnp.int32, R)), num_keys=1)[1]], key, x)
