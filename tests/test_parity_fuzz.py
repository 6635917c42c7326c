"""Randomized parity fuzzing: random scenes + random configs vs the C oracle,
plus first-principles checks of our (fixed) Doppler semantics."""
import numpy as np
import pytest

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.scene import random_soup_scene, save_hrt, HostScene, HostMesh
from tests.oracle.oracle import run_reference
from tests.test_parity import check_los, check_scatter


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_random_scene_parity(seed, tmp_path):
    rng = np.random.default_rng(seed)
    n_tris = int(rng.integers(20, 120))
    scene = random_soup_scene(n_tris, seed=seed + 100, extent=20.0,
                              tri_size=4.0)
    path = str(tmp_path / "fuzz.hrt")
    save_hrt(scene, path)

    nrx = int(rng.integers(1, 3))
    ntx = int(rng.integers(1, 3))
    rx = rng.uniform(-15, 15, (nrx, 3)).astype(np.float32)
    tx = rng.uniform(-15, 15, (ntx, 3)).astype(np.float32)
    z_rx, z_tx = np.zeros((nrx, 3), np.float32), np.zeros((ntx, 3), np.float32)
    P = int(rng.integers(200, 800))
    B = int(rng.integers(1, 4))
    f = float(rng.uniform(0.8, 30.0))

    ref = run_reference(path, rx, tx, z_rx, z_tx, f, P, B)
    los, scat = hrt.compute_paths(path, rx, tx, z_rx, z_tx, f, nrx, ntx,
                                  P, B, backend="jnp")
    check_los(ref, los, freq=False)
    check_scatter(ref, scat, max_bad_frac=0.005)


def _single_bounce_doppler(rx, tx, mesh_vel, tx_vel, f_ghz):
    """Trace one path off a moving plate and return our freq_shift plus the
    first-principles expectation."""
    vs = np.array([[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    scene = HostScene([HostMesh(vs, idx, material_index=1,
                                velocity=np.asarray(mesh_vel, np.float32))])
    cfg = hrt.TracerConfig(num_paths=64, num_bounces=1, backend="jnp")
    res = hrt.trace(scene, [rx], [tx], tx_velocities=[tx_vel],
                    carrier_frequency=f_ghz, config=cfg)
    freq = np.asarray(res.scatter.freq_shift)[0, 0]
    a = np.asarray(np.abs(res.scatter.a_te))[0, 0]
    ri = res.rays_scatter
    d0 = np.asarray(ri.directions)[0, 0]        # launch dirs
    d1 = np.asarray(ri.directions)[0, 1]        # reflected dirs
    o1 = np.asarray(ri.origins)[0, 1]           # hit points (offset)
    act = np.asarray(ri.active)[0, 1]
    return freq, a, d0, d1, o1, act


def test_doppler_first_principles():
    """Our Doppler semantics (the reference's documented *intent*,
    SURVEY.md §3.5 2): per-path shift = (v_tx . d0) f/c
    + ((d1 - d0) . v_mesh) f/c - ((d_scat - d1) . v_mesh) f/c."""
    c = 299792458.0
    f_hz = 3.0e9
    rx = [0.3, -0.2, 2.0]
    tx = [0.0, 0.0, 3.0]
    mesh_vel = [2.0, -1.0, 0.5]
    tx_vel = [-1.0, 0.5, 3.0]
    freq, amp, d0, d1, o1, act = _single_bounce_doppler(rx, tx, mesh_vel,
                                                        tx_vel, 3.0)
    hit = (amp > 0)
    assert hit.sum() > 5
    k = f_hz / c
    for p in np.where(hit)[0][:10]:
        ds = np.asarray(rx) - o1[p]
        ds = ds / np.linalg.norm(ds)
        expect = (np.dot(tx_vel, d0[p]) * k
                  + np.dot(d1[p] - d0[p], mesh_vel) * k
                  - np.dot(ds - d1[p], mesh_vel) * k)
        assert abs(freq[p] - expect) < max(1e-3 * abs(expect), 0.5), \
            f"path {p}: {freq[p]} vs {expect}"


def test_doppler_zero_for_static_world():
    freq, amp, *_ = _single_bounce_doppler([0.3, -0.2, 2.0], [0.0, 0.0, 3.0],
                                           [0, 0, 0], [0, 0, 0], 3.0)
    assert np.all(freq == 0.0)
