"""Pallas row-fetch kernel: ``out[r] = table[idx[r]]`` with the one-hot
operand living only in VMEM.

:func:`hermespy_rt_tpu.ops.fetch.onehot_fetch` is exact and one MXU pass, but
XLA materialises its ``[R, T]`` bf16 one-hot in HBM (~0.5 GB per 1M-ray fetch
at T=256 — write + read ~1.2 ms each way).  This kernel builds the one-hot
per 1024-ray tile in VMEM (iota compare), contracts against the limb-split
table resident in VMEM, and writes only the ``[R, C]`` f32 result — the
one-hot never touches HBM.  The backward accumulates
``dtable += one_hot(idx)^T @ split3(g)`` across ray tiles into a revisited
output block, also one exact pass per tile.

Used for the tracer's per-hit payload gathers
(/root/reference/src/compute_paths.c:621,653,661 equivalents) when the scene
fits VMEM (padded T <= 4096); exact per the same limb argument as
``ops/fetch.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_onehot_fetch"]

_BLOCK_R = 1024


def _round_up(x, m):
    return -(-x // m) * m


def _split3_kernel(x):
    """In-kernel 3-limb bf16 split (no barriers needed under Mosaic)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _fwd_kernel(idx_ref, limbs_ref, out_ref, *, c: int):
    """One-hot construction notes (found the hard way):

    * ``value[0, :, None]`` integer indexing lowers to a lax.gather, which
      Mosaic rejects ("Shape mismatch in input, indices and output") — the
      index array ships as a [BLOCK_R, 1] column instead so the one-hot is a
      plain broadcast compare against a lane iota.
    * Contracting dimension 0 of the one-hot via dot_general crashed the TPU
      compiler outright; both kernels use standard [M,K]@[K,N] matmuls.
    """
    t = limbs_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_R, t), 1)
    oh = (idx_ref[...] == iota).astype(jnp.bfloat16)     # [BLOCK_R, T]
    y = jnp.dot(oh, limbs_ref[...],
                preferred_element_type=jnp.float32)      # [BLOCK_R, 3C]
    out_ref[...] = y[:, :c] + y[:, c:2 * c] + y[:, 2 * c:3 * c]


def _bwd_kernel(idx_ref, g_ref, out_ref, *, c: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    t = out_ref.shape[0]
    # transposed one-hot [T, BLOCK_R]: idx ships as a [1, BLOCK_R] row here,
    # broadcast against a sublane iota (see _fwd_kernel notes)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, _BLOCK_R), 0)
    oht = (idx_ref[...] == iota).astype(jnp.bfloat16)
    h1, h2, h3 = _split3_kernel(g_ref[...])              # [BLOCK_R, Cp] each
    gl = jnp.concatenate([h1, h2, h3], axis=-1)          # [BLOCK_R, 3Cp]
    dy = jnp.dot(oht, gl, preferred_element_type=jnp.float32)
    cp = g_ref.shape[1]
    out_ref[...] += dy[:, :cp] + dy[:, cp:2 * cp] + dy[:, 2 * cp:3 * cp]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_onehot_fetch(idx, table, interpret=False):
    """``table[idx]`` (idx i32[...] clamped, table f32[T, C]) via the VMEM
    one-hot kernel; differentiable w.r.t. ``table``."""
    out, _ = _fetch_fwd(idx, table, interpret)
    return out


def _fetch_fwd(idx, table, interpret):
    t, c = table.shape
    # lanes: C padded so 3C lands on a 128 multiple keeps the MXU happy; the
    # out block's last dim equals the whole-array dim so any C works.
    shape = idx.shape
    flat = jax.lax.stop_gradient(idx).reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    r_pad = _round_up(max(r, _BLOCK_R), _BLOCK_R)
    if r_pad > r:
        flat = jnp.pad(flat, (0, r_pad - r))
    # the table limb split runs in XLA land where xla_allow_excess_precision
    # can elide the convert round-trips — use the barriered split
    from .fetch import _limb_cols
    limbs = _limb_cols(table)                            # [T, 3C] bf16
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c),
        grid=(r_pad // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # idx column
            pl.BlockSpec(memory_space=pltpu.VMEM),       # limbs whole
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, c), jnp.float32),
        interpret=interpret,
    )(flat.reshape(-1, 1), limbs)
    return out[:r].reshape(shape + (c,)), (idx, t, c)


def _fetch_bwd(interpret, res, g):
    idx, t, c = res
    flat = idx.reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    r_pad = _round_up(max(r, _BLOCK_R), _BLOCK_R)
    g2 = g.reshape(-1, c)
    if r_pad > r:
        flat = jnp.pad(flat, (0, r_pad - r), constant_values=-1)
        g2 = jnp.pad(g2, ((0, r_pad - r), (0, 0)))
    dtable = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        grid=(r_pad // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_R, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        interpret=interpret,
    )(flat.reshape(1, -1), g2)
    return None, dtable


pallas_onehot_fetch.defvjp(_fetch_fwd, _fetch_bwd)
