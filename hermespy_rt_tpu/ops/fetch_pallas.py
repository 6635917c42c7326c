"""Pallas row-fetch / row-scatter-add kernels with the one-hot in VMEM only.

:func:`hermespy_rt_tpu.ops.fetch.onehot_fetch` is exact and one MXU pass, but
XLA materialises its ``[R, T]`` bf16 one-hot in HBM (~0.5 GB per 1M-ray fetch
at T=256 — write + read ~1.2 ms each way), and its *backward* — the
scatter-add ``dtable += one_hot(idx)^T @ g`` — costs ~3 ms per 1M-ray fetch
that way (measured, benchmarks/logs/probe_walk9.log): at 3 bounces x 2
fetches the fetch backwards alone were the r2 bench's entire 18 ms backward
overhead.  These kernels build the one-hot per ray tile in VMEM (iota
compare), so it never touches HBM.

Layout rule learned the hard way (probe_r3b/r3c: 55 ms/call from lane
relayouts): bf16 limb groups must NEVER be concatenated, sliced, or
converted along the LANE axis at non-128 offsets inside the kernel.

* forward: the table ships as ``[3T, C]`` bf16 (limb groups stacked on
  ROWS, split in XLA with the barriered split); the one-hot is built
  against ``lane_iota mod T`` so ONE ``[R_tile, 3T] @ [3T, C]`` bf16 pass
  sums the three limb rows of the selected entry in the MXU's f32
  accumulator — exact, no slicing at all.
* backward (:func:`pallas_scatter_add`): per ray tile the transposed
  one-hot (sublane iota, no transpose op) contracts against the raw f32
  cotangent block in one ``precision=HIGHEST`` dot — exact because the
  one-hot is single-limb, so the decomposition reduces to summing the
  cotangent's limbs in the f32 accumulator.  No in-kernel bf16 ops at all.

Used for the tracer's per-hit payload gathers
(/root/reference/src/compute_paths.c:621,653,661 equivalents) when the scene
fits VMEM (padded T <= 4096).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_onehot_fetch", "pallas_onehot_fetch_t",
           "pallas_scatter_add"]

_BLOCK_R = 4096


def _round_up(x, m):
    return -(-x // m) * m


def _split3_kernel(x):
    """In-kernel 3-limb bf16 split (no barriers needed under Mosaic)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _fwd_kernel(idx_ref, limbs_ref, out_ref, *, t: int):
    """Transposed-layout one-hot fetch: everything stays in its natural
    (lane = rays) layout.

    The first version shipped ``idx`` as a [BLOCK_R, 1] *column* block and
    built a [BLOCK_R, 3T] one-hot against ``lane_iota mod t`` — the column
    operand relayouts on every grid step and the integer ``rem`` over
    BLOCK_R x 3T elements is VPU-serial; measured ~26 ms per 1M-ray fetch
    when embedded in the e2e graph (probe_r3f).  Here ``idx`` ships as a
    [1, BLOCK_R] ROW, the transposed one-hot comes from a sublane iota
    (``tri_iota[k] == idx[r]``, no rem: the iota is three stacked [T]
    ranges — a cheap sublane concat, no rem — matching the row-stacked
    limb groups), and one pre-transposed ``[C, 3T] @ [3T, BLOCK_R]`` bf16
    pass sums the three limbs of the selected entry in the f32 accumulator
    — exact.  Output is [C, R] (rays on lanes, the same physical layout
    XLA gives an [R, C] array)."""
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t, _BLOCK_R), 0)
    iota3 = jnp.concatenate([iota_t, iota_t, iota_t], axis=0)  # [3T, B]
    oht = (idx_ref[...] == iota3).astype(jnp.bfloat16)
    out_ref[...] = jnp.dot(limbs_ref[...], oht,
                           preferred_element_type=jnp.float32)


def _bwd_kernel(idx_ref, g_ref, out_ref):
    """One ray tile of the scatter-add: out += oht @ g, one HIGHEST f32 dot.

    HIGHEST is *exact* here: the one-hot is exactly representable in its
    first bf16 limb, so the 6-pass decomposition reduces to summing the
    cotangent's three limbs — a bit-exact f32 reconstruction — inside the
    MXU accumulator.  No in-kernel bf16 splits or limb concats (bf16
    conversions on odd-lane-count blocks relayout catastrophically —
    measured ~55 ms/call in the first version, benchmarks/logs/probe_r3c);
    the transposed one-hot comes straight from a sublane iota against the
    idx row — no transpose op."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    t = out_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, _BLOCK_R), 0)
    oht = (idx_ref[...] == iota).astype(jnp.float32)     # [T, BLOCK_R]
    out_ref[...] += jnp.dot(oht, g_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _scatter_add_impl(idx, g, t, interpret):
    r, c = g.shape
    r_pad = _round_up(max(r, _BLOCK_R), _BLOCK_R)
    if r_pad > r:
        idx = jnp.pad(idx, (0, r_pad - r), constant_values=-1)
        g = jnp.pad(g, ((0, r_pad - r), (0, 0)))
    dy = pl.pallas_call(
        _bwd_kernel,
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
    )(idx.reshape(1, -1), g)
    return dy


def pallas_scatter_add(idx, g, t, interpret=None):
    """``dtable[k] = sum over r with idx[r] == k of g[r]`` — the exact
    backward of a row fetch.  ``idx`` i32[...] (negative entries are
    dropped), ``g`` f32[..., C] cotangents, ``t`` table rows; returns
    f32[t, C].  One exact HIGHEST MXU contraction per ray tile with the
    one-hot in VMEM only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = g.shape[-1]
    return _scatter_add_impl(idx.reshape(-1).astype(jnp.int32),
                             g.reshape(-1, c), int(t), bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_onehot_fetch(idx, table, interpret=False, bwd="xla"):
    """``table[idx]`` (idx i32[...] clamped, table f32[T, C]) via the VMEM
    one-hot kernel; differentiable w.r.t. ``table``.  ``bwd`` selects the
    scatter-add backward: "xla" (default, matching ``TracerConfig.fetch_bwd``
    — pure-XLA one-hot^T matmul, keeps Pallas calls out of the grad graph,
    which crashes the remote compiler beyond ~8 kernels) or "pallas"
    (one-hot in VMEM; faster standalone, opt-in)."""
    out, _ = _fetch_fwd(idx, table, interpret, bwd)
    return out


def _fetch_fwd(idx, table, interpret, bwd="pallas"):
    t, c = table.shape
    shape = idx.shape
    flat = jax.lax.stop_gradient(idx).reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    r_pad = _round_up(max(r, _BLOCK_R), _BLOCK_R)
    if r_pad > r:
        flat = jnp.pad(flat, (0, r_pad - r))
    # the table limb split runs in XLA land where xla_allow_excess_precision
    # can elide the convert round-trips — use the barriered split; limbs
    # ship pre-transposed ([C, 3T], limb groups stacked on the LANE axis at
    # T-multiples: T is a multiple of 128, so no sub-tile lane slicing ever
    # happens in-kernel)
    from .fetch import _split3_bf16
    limbs = jnp.concatenate(_split3_bf16(table.T), axis=-1)  # [C, 3T] bf16
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t),
        grid=(r_pad // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # idx row
            pl.BlockSpec(memory_space=pltpu.VMEM),       # limbsT whole
        ],
        out_specs=pl.BlockSpec((c, _BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, r_pad), jnp.float32),
        interpret=interpret,
    )(flat.reshape(1, -1), limbs)
    # [C, R] -> [R, C]: a logical transpose only — XLA's [R, C] layout puts
    # R on lanes already, so this is a bitcast, not a relayout
    return out[:, :r].T.reshape(shape + (c,)), (idx, t, c)


def _fetch_bwd(interpret, bwd, res, g):
    if bwd == "xla":
        from .fetch import _onehot_fetch_bwd_xla
        return _onehot_fetch_bwd_xla(res, g)
    idx, t, c = res
    return None, pallas_scatter_add(idx, g, t, interpret)


pallas_onehot_fetch.defvjp(_fetch_fwd, _fetch_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_onehot_fetch_t(idx, table, interpret=False, bwd="xla",
                          bwd_cols=None):
    """Transposed-output fetch: returns f32[C, R] (rays on LANES) for
    ``idx`` i32[R] flat.  Consumers slice ROWS ([k, R] sublane slices —
    cheap) instead of columns of an [R, C] array (12 single-column slices
    measured 3.1 ms per trace, benchmarks/logs/trace_r3l).  Differentiable
    w.r.t. ``table``.  ``bwd_cols`` (static (lo, hi) or None) restricts the
    backward scatter-add to that column range — the caller's contract that
    every other column's cotangent is identically zero (grad_geometry=False
    stop-grads the 15 geometry columns); the skipped columns' gradients
    come back as zeros."""
    out, _ = _fetch_fwd_t(idx, table, interpret, bwd, bwd_cols)
    return out


def _fetch_fwd_t(idx, table, interpret, bwd="xla", bwd_cols=None):
    t, c = table.shape
    flat = jax.lax.stop_gradient(idx).reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    r_pad = _round_up(max(r, _BLOCK_R), _BLOCK_R)
    if r_pad > r:
        flat = jnp.pad(flat, (0, r_pad - r))
    from .fetch import _split3_bf16
    limbs = jnp.concatenate(_split3_bf16(table.T), axis=-1)  # [C, 3T] bf16
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t),
        grid=(r_pad // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, _BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, r_pad), jnp.float32),
        interpret=interpret,
    )(flat.reshape(1, -1), limbs)
    return out[:, :r], (idx, t, c)


def _fetch_bwd_t(interpret, bwd, bwd_cols, res, g):
    idx, t, c = res
    lo, hi = (0, c) if bwd_cols is None else bwd_cols
    gs = g[lo:hi]
    if bwd == "xla":
        from .fetch import _onehot_fetch_bwd_xla
        _, dt = _onehot_fetch_bwd_xla((idx, t, hi - lo), gs.T)
    else:
        dt = pallas_scatter_add(idx, gs.T, t, interpret)
    if bwd_cols is not None:
        dt = jnp.pad(dt, ((0, 0), (lo, c - hi)))
    return None, dt


pallas_onehot_fetch_t.defvjp(_fetch_fwd_t, _fetch_bwd_t)
