#!/usr/bin/env python
"""Probe r3i: XLA one-hot fetch micro-variants at 1M rays, T=256, C=27.

(a) current: bf16 one-hot @ [T, 3C] limb columns + slice-sum ([1M,81]
    intermediate in HBM)
(b) mixed dtype: bf16 one-hot @ f32 table, preferred f32 — is it exact,
    and does skipping the limb expansion/slice-sum pay?
(c) HIGHEST f32 one-hot (6-pass decomposition, f32 operand traffic)
Plus the grad of each (bwd = one-hot^T matmul).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from hermespy_rt_tpu.ops.fetch import _limb_cols, _sum_limb_cols, _onehot_bf16

T, C, R = 256, 27, 1 << 20
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32) * 100.0)
idx = jnp.asarray(rng.integers(0, T, R).astype(np.int32))


def bench(tag, fn, *args, iters=16):
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


@jax.jit
def fetch_limb(idx, table):
    oh = _onehot_bf16(idx, T)
    y = jnp.dot(oh, _limb_cols(table), preferred_element_type=jnp.float32)
    return _sum_limb_cols(y, C)


@jax.jit
def fetch_mixed(idx, table):
    oh = _onehot_bf16(idx, T)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32)


@jax.jit
def fetch_highest(idx, table):
    oh = (idx[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, idx.shape + (T,), idx.ndim)).astype(jnp.float32)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def fetch_take(idx, table):
    return jnp.take(table, idx, axis=0)


ref = np.asarray(table)[np.asarray(idx)]
for tag, fn in (("limb (current)", fetch_limb), ("mixed bf16xf32", fetch_mixed),
                ("highest f32", fetch_highest), ("take", fetch_take)):
    dt, out = bench(tag, fn, idx, table)
    if out is not None:
        exact = bool((np.asarray(out) == ref).all())
        print(f"  exact: {exact}", flush=True)

# grads (bwd scatter-add form)
for tag, fn in (("limb", fetch_limb), ("mixed", fetch_mixed),
                ("highest", fetch_highest), ("take", fetch_take)):
    g = jax.jit(jax.grad(lambda tb, f=fn: jnp.sum(f(idx, tb) ** 2)))
    bench(f"grad {tag}", g, table, iters=8)
print("done", flush=True)
