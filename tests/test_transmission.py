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


# ---------------------------------------------------------------------------
# Transmission-path SPAWNING (refracted continuation paths): rays partitioned
# over reflect/transmit interaction patterns, cfg.spawn_transmission=True.
# ---------------------------------------------------------------------------

def test_spawn_requires_physical_mode():
    with pytest.raises(ValueError):
        hrt.TracerConfig(spawn_transmission=True)


def test_spawn_pattern_zero_rays_unchanged():
    """Rays assigned the pure-reflection pattern must be bit-identical to a
    trace without spawning, and transmit rays must reach an RX behind the
    wall that no reflection path can reach."""
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.scene import flatten_scene
    from hermespy_rt_tpu.tracer import trace_paths

    P = 128
    tris = flatten_scene(_wall_scene(1))
    mats = default_materials()
    tx = jnp.asarray([[-3.0, 0.0, 0.0]], jnp.float32)
    rx = jnp.asarray([[3.0, 4.0, 1.0]], jnp.float32)   # far side of the wall
    z = jnp.zeros((1, 3), jnp.float32)
    kw = dict(num_paths=P, num_bounces=1, parity="physical", backend="jnp",
              keep_rays=False)
    r0 = trace_paths(tris, mats, rx, tx, z, z, 3.0, TracerConfig(**kw))
    r1 = trace_paths(tris, mats, rx, tx, z, z, 3.0,
                     TracerConfig(spawn_transmission=True, **kw))
    a0 = np.asarray(r0.scatter.a_te)[0, 0]          # [P]
    a1 = np.asarray(r1.scatter.a_te)[0, 0]
    even = np.arange(P) % 2 == 0                    # pattern 0 = reflect
    np.testing.assert_array_equal(a1[even], a0[even])
    # reflection-only tracing cannot reach a far-side RX at all (front-face
    # scatter is self-occluded by the wall)
    assert np.all(a0 == 0)
    # transmitted rays scatter from the exit face and do reach it
    odd = np.arange(P) % 2 == 1
    assert np.count_nonzero(a1[odd]) > 10


def test_spawn_refracted_continuation_geometry():
    """TX -> through wall A -> interact with wall B -> RX.  The TR-pattern
    ray must produce a bounce-2 path into the hemisphere between the walls,
    the TT ray only into the far hemisphere, with the TT/TR magnitude ratio
    equal to |T/R| of wall B (mirrored RX pair, zero-width scatter lobe so
    the scattering factor magnitude cancels)."""
    import dataclasses
    import jax as J
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.ops.fresnel import (precompute_eta, refl_coefs,
                                             trans_coefs)
    from hermespy_rt_tpu.scene import HostMesh, HostScene, flatten_scene
    from hermespy_rt_tpu.tracer import SPEED_OF_LIGHT, trace_paths

    def wall_x(x, material):
        vs = np.array([[x, -10, -10], [x, 10, -10], [x, 10, 10],
                       [x, -10, 10]], np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        return HostMesh(vs, idx, material_index=material)

    scene = HostScene([wall_x(1.0, 1), wall_x(3.0, 1)])  # concrete walls
    tris = flatten_scene(scene)
    mats = default_materials()
    # zero-width scattering lobe: |scat coefs| independent of the scatter
    # direction's hemisphere, so mirrored RX geometry cancels exactly
    mats = dataclasses.replace(
        mats, s1_alpha=jnp.zeros_like(mats.s1_alpha))
    tx = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    # rx0 between the walls, rx1 its mirror behind wall B
    rx = jnp.asarray([[2.0, 5.0, 0.0], [4.0, 5.0, 0.0]], jnp.float32)
    z1 = jnp.zeros((1, 3), jnp.float32)
    z2 = jnp.zeros((2, 3), jnp.float32)
    # four identical +x rays; patterns i%4 = RR, TR, RT, TT over 2 bounces
    dirs = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (4, 1)), jnp.float32)
    cfg = TracerConfig(num_paths=4, num_bounces=2, parity="physical",
                       backend="jnp", keep_rays=False,
                       spawn_transmission=True)
    res = trace_paths(tris, mats, rx, tx, z2, z1, 3.0, cfg, launch_dirs=dirs)
    a = np.asarray(res.scatter.a_te)[:, 0]      # [2 rx, 2*4] bounce-major
    tau = np.asarray(res.scatter.tau)[:, 0]
    b2 = a[:, 4:]                               # bounce-2 slots, rays 0..3
    # RR: reflected at A back to -x, nothing there -> no bounce-2 path
    assert np.all(b2[:, 0] == 0.0)
    # TR: through A, reflected at B(3,0,0): radiates between the walls only
    assert abs(b2[0, 1]) > 0 and b2[1, 1] == 0.0
    d_b_rx = np.sqrt(26.0)                      # |(3,0,0)-(2,5,0)|
    np.testing.assert_allclose(tau[0, 4 + 1],
                               (3.0 + d_b_rx) / SPEED_OF_LIGHT, rtol=1e-3)
    # TT: transmits through B: radiates into the far hemisphere only
    assert abs(b2[1, 3]) > 0 and b2[0, 3] == 0.0
    # mirrored geometry + zero-width lobe -> |TT/TR| == |T_B/R_B| at normal
    # incidence
    eta_all = precompute_eta(mats, 3.0)
    eta = J.tree.map(lambda leaf: jnp.asarray([leaf[1]]), eta_all)
    c1 = jnp.asarray([1.0 - 1.1920929e-07])
    s1 = jnp.sqrt(1.0 - c1 * c1)
    rr = refl_coefs(eta, c1, s1)
    tt = trans_coefs(eta, c1, s1)
    R = complex(float(rr[0][0]), float(rr[1][0]))
    T = complex(float(tt[0][0]), float(tt[1][0]))
    np.testing.assert_allclose(abs(b2[1, 3] / b2[0, 1]), abs(T / R),
                               rtol=1e-3)
    # bounce-1 scatter of the TR ray comes from wall A's exit face: visible
    # from rx0 (x=2 > 1), with the through-wall delay
    assert abs(a[0, 1]) > 0
    d_a_rx = np.sqrt(26.0 + 0.0)                # |(1,0,0)-(2,5,0)|
    np.testing.assert_allclose(tau[0, 1], (1.0 + d_a_rx) / SPEED_OF_LIGHT,
                               rtol=1e-3)


def test_snell_refraction_bends_continuation():
    """refraction='snell' bends the transmitted continuation by Snell's law
    (air -> medium, n = Re(sqrt(eta))); 'straight' (the ITU slab default)
    passes through unchanged.  Verifies sin(theta2) = sin(theta1)/n, unit
    norm, preserved tangential direction, and the straight-mode default."""
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.ops.fresnel import precompute_eta
    from hermespy_rt_tpu.scene import flatten_scene
    from hermespy_rt_tpu.tracer import trace_paths

    tris = flatten_scene(_wall_scene(1))           # concrete wall at x=0
    mats = default_materials()
    tx = jnp.asarray([[-3.0, 3.0, 0.0]], jnp.float32)
    rx = jnp.asarray([[3.0, 4.0, 1.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    d0 = np.array([1.0, 1.0, 0.0], np.float32) / np.float32(np.sqrt(2.0))
    dirs = jnp.asarray(np.tile(d0, (2, 1)))        # ray 0 reflect, 1 transmit
    kw = dict(num_paths=2, num_bounces=1, parity="physical", backend="jnp",
              keep_rays=True, spawn_transmission=True)

    def bounce1_dir(refraction):
        cfg = TracerConfig(refraction=refraction, **kw)
        res = trace_paths(tris, mats, rx, tx, z, z, jnp.float32(3.0), cfg,
                          launch_dirs=dirs)
        return np.asarray(res.rays_scatter.directions)[0, 1]   # [P, 3]

    d_straight = bounce1_dir("straight")
    np.testing.assert_allclose(d_straight[1], d0, atol=1e-6)

    d_t = bounce1_dir("snell")[1]
    assert np.isclose(np.linalg.norm(d_t), 1.0, rtol=1e-5)
    n_med = float(precompute_eta(mats, 3.0).eta_sqrt_re[1])
    sin1 = np.sqrt(0.5)
    sin2 = np.linalg.norm(d_t[1:])                 # tangential (wall = x=0)
    np.testing.assert_allclose(sin2, sin1 / n_med, rtol=1e-5)
    # forward through the wall, tangential direction preserved, in-plane
    assert d_t[0] > 0 and d_t[1] > 0 and abs(d_t[2]) < 1e-6
    # the reflected ray (pattern 0) is identical in both modes
    np.testing.assert_array_equal(bounce1_dir("snell")[0], d_straight[0])

    # differentiable: the bent direction moves with the material's eta
    import dataclasses
    def tangential(a1):
        m = dataclasses.replace(mats, a=mats.a.at[1].set(a1))
        cfg = TracerConfig(refraction="snell", **kw)
        res = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg,
                          launch_dirs=dirs)
        return res.rays_scatter.directions[0, 1, 1, 1]
    g = jax.grad(tangential)(mats.a[1])
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_snell_requires_spawn():
    with pytest.raises(ValueError):
        hrt.TracerConfig(parity="physical", refraction="snell")
