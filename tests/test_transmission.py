"""Occlusion-with-penetration-loss mode (ITU eqs. 31c/31d — the reference's
unimplemented refraction TODO, /root/reference/src/compute_paths.c:725-728)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.materials import default_materials, MATERIAL_METAL
from hermespy_rt_tpu.scene import HostMesh, HostScene


def _wall_scene(material=1):
    """A wall in the x=0 plane separating TX (x<0) from RX (x>0)."""
    vs = np.array([[0, -10, -10], [0, 10, -10], [0, 10, 10], [0, -10, 10]],
                  np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    return HostScene([HostMesh(vs, idx, material_index=material)])


CFG = dict(num_paths=64, num_bounces=1, backend="jnp", keep_rays=False)


def test_requires_physical_mode():
    with pytest.raises(ValueError):
        hrt.TracerConfig(transmission=True)  # parity defaults to reference


def _los_through_wall(material, transmission):
    cfg = hrt.TracerConfig(parity="physical", transmission=transmission,
                           **CFG)
    res = hrt.trace(_wall_scene(material), [[3.0, 0.0, 0.0]],
                    [[-3.0, 0.0, 0.0]], config=cfg)
    return np.asarray(res.los.a_te)[0, 0, 0], np.asarray(res.los.tau)[0, 0, 0]


def test_los_penetration_loss():
    a_off, tau_off = _los_through_wall(1, False)   # concrete, no transmission
    assert a_off == 0.0 and tau_off == 0.0
    a_on, tau_on = _los_through_wall(1, True)
    assert 0 < abs(a_on)
    assert tau_on > 0
    # transmitted amplitude must be weaker than free space at same distance
    free, _ = _los_through_wall(0, True)  # "air" wall
    assert abs(a_on) < abs(free) * 1.001


def test_metal_wall_nearly_opaque():
    a_metal, _ = _los_through_wall(MATERIAL_METAL, True)
    a_concrete, _ = _los_through_wall(1, True)
    assert abs(a_metal) < 0.05 * abs(a_concrete)


def test_scatter_shadow_transmission():
    """Scatter shadow rays through a wall: with transmission on, a reflector
    behind a wall still contributes (attenuated) paths."""
    vs_r = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0],
                     [-0.5, 0.5, 0]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    # reflector at z=0 around origin; wall at z=1 between reflector and RX
    wall_vs = np.array([[-5, -5, 1.0], [5, -5, 1.0], [5, 5, 1.0], [-5, 5, 1.0]],
                       np.float32)
    scene = HostScene([
        HostMesh(vs_r, idx, material_index=1, name="reflector"),
        HostMesh(wall_vs, idx, material_index=4, name="wood_wall"),
    ])
    rx = [[0.0, 0.0, 2.0]]   # above the wall
    tx = [[0.0, 0.0, 0.5]]   # between reflector and wall
    base = hrt.trace(scene, rx, tx,
                     config=hrt.TracerConfig(parity="physical", **CFG))
    trans = hrt.trace(scene, rx, tx,
                      config=hrt.TracerConfig(parity="physical",
                                              transmission=True, **CFG))
    a0 = np.asarray(base.scatter.a_te)
    a1 = np.asarray(trans.scatter.a_te)
    # reflector bounce paths to RX are blocked by the wall without
    # transmission, present with it
    reflector_paths = (np.abs(a1) > 0) & (np.abs(a0) == 0)
    assert reflector_paths.sum() > 3
    assert np.isfinite(a1).all()


def test_transmission_differentiable():
    scene = _wall_scene(1)
    tris = hrt.flatten_scene(scene)
    cfg = hrt.TracerConfig(parity="physical", transmission=True, **CFG)
    rx = jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32)
    tx = jnp.asarray([[-3.0, 0.0, 0.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)

    def loss(mats):
        res = hrt.trace_paths(tris, mats, rx, tx, z, z, 3.0, cfg)
        return jnp.sum(jnp.abs(res.los.a_te) ** 2) * 1e6

    g = jax.grad(loss)(default_materials())
    ga = np.asarray(g.a)
    assert np.isfinite(ga).all()
    assert abs(ga[1]) > 0  # permittivity of the concrete wall matters
