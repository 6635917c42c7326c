"""Geometric primitives: launch-direction generation and vector helpers.

The reference generates per-TX launch directions on a Fibonacci sphere with
mixed float/double trigonometry (``/root/reference/src/compute_paths.c:442-456``):
``k = path + 0.5f`` (f32), ``phi = acos(1 - 2k/N)`` (f64 acos of an f32
argument), ``theta = pi*(1+sqrt(5))*k`` (f32), and the direction components are
f64 products truncated to f32.  :func:`fibonacci_sphere` reproduces that
rounding chain bit-for-bit in numpy so parity tests see identical launch rays.
Directions are constants (no gradient flows through them), so host-side numpy
is the right place to compute them.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["fibonacci_sphere", "dot3", "cross3", "normalize3", "reflect3"]

_PI32 = np.float32(3.14159265358979323846)


def fibonacci_sphere(num_paths: int) -> np.ndarray:
    """Deterministic unit launch directions, f32[num_paths, 3].

    Bit-exact with /root/reference/src/compute_paths.c:443-451 (including the
    f32 wrap-around of ``theta`` at large path indices).
    """
    k = np.arange(num_paths, dtype=np.float32) + np.float32(0.5)
    # 1.f - 2.f * k / num_paths evaluated in f32 (C float arithmetic).
    arg = np.float32(1.0) - (np.float32(2.0) * k) / np.float32(num_paths)
    phi32 = np.arccos(arg.astype(np.float64)).astype(np.float32)
    sqrt5 = np.sqrt(np.float32(5.0), dtype=np.float32)
    theta32 = (_PI32 * (np.float32(1.0) + sqrt5)) * k  # f32 multiply chain
    theta64 = theta32.astype(np.float64)
    phi64 = phi32.astype(np.float64)
    d = np.stack([
        np.cos(theta64) * np.sin(phi64),
        np.sin(theta64) * np.sin(phi64),
        np.cos(phi64),
    ], axis=-1)
    return d.astype(np.float32)


def dot3(a, b):
    """Row-wise 3-vector dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def cross3(a, b):
    return jnp.cross(a, b)


def normalize3(v, eps: float = 0.0):
    n = jnp.sqrt(dot3(v, v))
    return v / jnp.maximum(n, eps)[..., None] if eps else v / n[..., None]


def reflect3(d, n):
    """Specular reflection ``d' = d - 2 (d.n) n``
    (/root/reference/src/compute_paths.c:652-656)."""
    return d - 2.0 * dot3(d, n)[..., None] * n
