"""Channel-model layer tests (models/channel.py)."""
import numpy as np
import jax
import jax.numpy as jnp

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.models.channel import (cir, combine_paths,
                                            narrowband_coefficients,
                                            path_gain_db, rms_delay_spread)

RX = [[0.0, 0.0, 0.15]]
TX = [[0.0, 0.0, 0.151]]
CFG = hrt.TracerConfig(num_paths=512, num_bounces=2, backend="jnp",
                       keep_rays=False)


def _result():
    return hrt.trace(hrt.simple_reflector_scene(), RX, TX,
                     carrier_frequency=3.0, config=CFG)


def test_combine_shapes():
    r = _result()
    a, tau, nu = combine_paths(r)
    assert a.shape == (1, 1, 1 + 2 * 512)
    assert tau.shape == a.shape == nu.shape


def test_cir_energy_and_peak():
    r = _result()
    h = cir(r, sampling_rate=1e9, num_taps=32)
    assert h.shape == (1, 1, 32)
    h0 = np.asarray(h)[0, 0]
    # LoS path: tau ~ 3.3e-12 s -> tap 0 dominates with |a| ~ 1
    assert np.argmax(np.abs(h0)) == 0
    assert abs(abs(h0[0]) - 1.0) < 0.1


def test_narrowband_doppler_rotation():
    cfg = hrt.TracerConfig(num_paths=128, num_bounces=1, backend="jnp",
                           keep_rays=False)
    r = hrt.trace(hrt.simple_reflector_scene(), RX, TX,
                  rx_velocities=[[0.0, 0.0, -10.0]],
                  carrier_frequency=3.0, config=cfg)
    t = np.linspace(0, 1e-3, 8)
    h = narrowband_coefficients(r, 3.0, t)
    assert h.shape == (1, 1, 8)
    # moving RX -> coefficient rotates over time
    ph = np.angle(np.asarray(h)[0, 0])
    assert np.abs(np.diff(ph)).max() > 1e-4


def test_path_gain_and_delay_spread_finite_and_differentiable():
    r = _result()
    g = float(path_gain_db(r)[0, 0])
    ds = float(rms_delay_spread(r)[0, 0])
    assert np.isfinite(g) and g <= 1.0  # LoS amp clamp -> <= 0 dB-ish
    assert 0.0 <= ds < 1e-6

    tris = hrt.flatten_scene(hrt.simple_reflector_scene())
    mats = hrt.default_materials()

    def loss(m):
        res = hrt.trace_paths(tris, m, jnp.asarray(RX, jnp.float32),
                              jnp.asarray(TX, jnp.float32),
                              jnp.zeros((1, 3)), jnp.zeros((1, 3)), 3.0, CFG)
        h = cir(res, 1e9, 16)
        return jnp.sum(jnp.abs(h) ** 2)

    grad = jax.grad(loss)(mats)
    assert np.isfinite(np.asarray(grad.s)).all()


def test_coverage_map():
    from hermespy_rt_tpu.models.coverage import coverage_map
    grid = coverage_map(hrt.box_scene(), [[0.0, 0.0, 4.0]],
                        x_range=(-4, 4), y_range=(-4, 4), resolution=2.0,
                        height=1.0,
                        config=hrt.TracerConfig(num_paths=64, num_bounces=2,
                                                backend="jnp",
                                                keep_rays=False),
                        batch_size=16)
    assert grid.gain_db.shape == (5, 5)
    assert np.isfinite(grid.gain_db).all()
    assert not grid.los_blocked.any()  # open box interior: all LoS
    # closer cells receive more power than corner cells
    assert grid.gain_db[2, 2] >= grid.gain_db[0, 0]


def test_los_blocked_under_transmission():
    """PathsResult.los_blocked carries the real occlusion decision: under
    transmission=True a blocked LoS has NONZERO penetration-loss gain, so
    inferring blockage from |a_te| == 0 (the pre-r5 coverage-map bug) is
    wrong.  RX inside the closed box, TX outside: blocked either way."""
    cfg = hrt.TracerConfig(num_paths=64, num_bounces=1, backend="jnp",
                           keep_rays=False, parity="physical",
                           transmission=True)
    res = hrt.trace(hrt.box_scene(), [[0.0, 0.0, 1.0]], [[0.0, 0.0, 40.0]],
                    carrier_frequency=3.0, config=cfg)
    blocked = np.asarray(res.los_blocked)
    assert blocked.shape == (1, 1) and blocked[0, 0]
    # the amplitude is the penetration-loss gain — nonzero despite blockage
    assert np.abs(np.asarray(res.los.a_te))[0, 0, 0] > 0.0
    # control: same geometry without transmission zeroes the gain but
    # reports the same decision
    cfg0 = hrt.TracerConfig(num_paths=64, num_bounces=1, backend="jnp",
                            keep_rays=False, parity="physical")
    res0 = hrt.trace(hrt.box_scene(), [[0.0, 0.0, 1.0]], [[0.0, 0.0, 40.0]],
                     carrier_frequency=3.0, config=cfg0)
    assert np.asarray(res0.los_blocked)[0, 0]
    assert np.abs(np.asarray(res0.los.a_te))[0, 0, 0] == 0.0


def test_coverage_map_transmission():
    """Coverage maps report los_blocked from the tracer decision (not the
    amplitude) when penetration loss keeps blocked cells' gain nonzero."""
    from hermespy_rt_tpu.models.coverage import coverage_map
    cfg = hrt.TracerConfig(num_paths=64, num_bounces=1, backend="jnp",
                           keep_rays=False, parity="physical",
                           transmission=True)
    grid = coverage_map(hrt.box_scene(), [[0.0, 0.0, 40.0]],
                        x_range=(-2, 2), y_range=(-2, 2), resolution=2.0,
                        height=1.0, config=cfg, batch_size=9)
    assert grid.los_blocked.all()  # TX outside the closed box: every cell
    assert np.isfinite(grid.gain_db).all()
