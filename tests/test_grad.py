"""Differentiability tests: gradients w.r.t. material parameters and TX/RX
positions checked against central finite differences of the forward pass
(BASELINE.json configs 2-3; SURVEY.md §7 M3)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.scene import flatten_scene, simple_reflector_scene, box_scene
from hermespy_rt_tpu.tracer import trace_paths

CFG = TracerConfig(num_paths=256, num_bounces=2, backend="jnp",
                   keep_rays=False)

RX = np.array([[0.1, -0.05, 0.4]], np.float32)
TX = np.array([[0.0, 0.1, 0.6]], np.float32)
Z = np.zeros((1, 3), np.float32)


def _loss_mats(mats, tris):
    res = trace_paths(tris, mats, RX, TX, Z, Z, 3.0, CFG)
    # power sum of scatter gains, scaled into a numerically comfy range
    return (jnp.sum(jnp.abs(res.scatter.a_te) ** 2)
            + jnp.sum(jnp.abs(res.scatter.a_tm) ** 2)) * 1e6


def _loss_pos(tx, tris, mats):
    res = trace_paths(tris, mats, RX, tx, Z, Z, 3.0, CFG)
    # distance-weighted observable: delay spread in metres + gain power
    c = 299792458.0
    return (jnp.sum(res.scatter.tau) * c
            + jnp.sum(jnp.abs(res.scatter.a_te) ** 2) * 1e6
            + jnp.sum(res.los.tau) * c)


@pytest.fixture(scope="module")
def reflector_tris():
    return flatten_scene(simple_reflector_scene())


def test_material_grads_vs_fd(reflector_tris):
    """Config 2: gradients w.r.t. material permittivity/conductivity (a, c)
    and roughness (s) on the reflector plate."""
    tris = reflector_tris
    mats = default_materials()
    grads = jax.grad(_loss_mats)(mats, tris)
    for field, eps in [("a", 0.05), ("c", 0.005), ("s", 0.01),
                       ("s1_alpha", 0.05), ("d", 0.01)]:
        g = np.asarray(getattr(grads, field))[1]  # concrete row
        base = np.asarray(getattr(mats, field)).copy()
        hi, lo = base.copy(), base.copy()
        hi[1] += eps
        lo[1] -= eps
        f_hi = float(_loss_mats(mats.replace(**{field: jnp.asarray(hi)}), tris))
        f_lo = float(_loss_mats(mats.replace(**{field: jnp.asarray(lo)}), tris))
        fd = (f_hi - f_lo) / (2 * eps)
        assert np.isfinite(g), field
        scale = max(abs(fd), abs(g), 1e-8)
        assert abs(g - fd) / scale < 0.05, (
            f"material.{field}: grad {g} vs fd {fd}")


def test_position_grads_vs_fd(reflector_tris):
    """Config 3 analogue: TX position gradients."""
    tris = reflector_tris
    mats = default_materials()
    g = np.asarray(jax.grad(_loss_pos)(jnp.asarray(TX), tris, mats))
    for axis in range(3):
        eps = 1e-3
        hi, lo = TX.copy(), TX.copy()
        hi[0, axis] += eps
        lo[0, axis] -= eps
        fd = (float(_loss_pos(jnp.asarray(hi), tris, mats))
              - float(_loss_pos(jnp.asarray(lo), tris, mats))) / (2 * eps)
        scale = max(abs(fd), abs(g[0, axis]), 1e-6)
        assert abs(g[0, axis] - fd) / scale < 0.05, (
            f"tx axis {axis}: grad {g[0, axis]} vs fd {fd}")


def test_grads_finite_everywhere_box():
    """No NaN/Inf gradients on a closed scene with deep bounces, TIR-prone
    angles and the full output set."""
    tris = flatten_scene(box_scene())
    mats = default_materials()
    cfg = TracerConfig(num_paths=128, num_bounces=3, backend="jnp",
                       keep_rays=False)
    rx = np.array([[1.0, 2.0, 1.5]], np.float32)
    tx = np.array([[-2.0, -1.0, 2.5]], np.float32)
    vel = np.array([[1.0, 0.5, -0.2]], np.float32)

    def loss(mats, tx_pos, rx_pos, tx_vel, rx_vel, f):
        res = trace_paths(tris, mats, rx_pos, tx_pos, rx_vel, tx_vel, f, cfg)
        return (jnp.sum(jnp.abs(res.scatter.a_te) ** 2) * 1e12
                + jnp.sum(jnp.abs(res.scatter.a_tm) ** 2) * 1e12
                + jnp.sum(res.scatter.tau) * 1e6
                + jnp.sum(res.scatter.freq_shift) * 1e-3
                + jnp.sum(jnp.abs(res.los.a_te) ** 2))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        mats, jnp.asarray(tx), jnp.asarray(rx), jnp.asarray(vel),
        jnp.asarray(Z), jnp.float32(3.0))
    flat, _ = jax.tree.flatten(grads)
    for leaf in flat:
        assert np.all(np.isfinite(np.asarray(leaf))), "non-finite gradient"


def test_vertex_grads_flow():
    """Gradients flow into scene geometry (vertices via v0/e1/e2)."""
    tris = flatten_scene(simple_reflector_scene())
    mats = default_materials()

    def loss(v0):
        t2 = dataclasses.replace(tris, v0=v0)
        res = trace_paths(t2, mats, RX, TX, Z, Z, 3.0, CFG)
        return jnp.sum(res.scatter.tau) * 1e9

    g = np.asarray(jax.grad(loss)(tris.v0))
    assert np.all(np.isfinite(g))
    assert np.abs(g[:2]).sum() > 0  # the two real triangles get gradient
    assert np.abs(g[2:]).sum() == 0  # padding does not
