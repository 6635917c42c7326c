"""Sweep driver (checkpoint/resume) and validation subsystem tests."""
import os

import numpy as np
import pytest

import hermespy_rt_tpu as hrt
from hermespy_rt_tpu.models.sweep import (SweepConfig, load_sweep_results,
                                          run_sweep)
from hermespy_rt_tpu.utils.validation import (SceneValidationError,
                                              check_finite, validate_inputs,
                                              validate_scene)
from hermespy_rt_tpu.scene import HostMesh, HostScene


def test_sweep_runs_and_resumes(tmp_path):
    cfg = SweepConfig(output_dir=str(tmp_path / "sweep"), chunk_size=4,
                      tracer=hrt.TracerConfig(num_paths=64, num_bounces=2,
                                              backend="jnp", keep_rays=False))
    rng = np.random.default_rng(0)
    rx = rng.uniform(-2, 2, (10, 3)).astype(np.float32) + [0, 0, 1.0]
    tx = np.array([[0.0, 0.0, 2.0]], np.float32)
    scene = hrt.box_scene()

    n1 = run_sweep(scene, tx, rx, cfg)
    assert n1 == 3  # ceil(10/4)
    # resume: nothing to do
    assert run_sweep(scene, tx, rx, cfg) == 0
    # corrupt one chunk -> only that chunk recomputes
    os.remove(os.path.join(cfg.output_dir, "chunk_00001.npz"))
    assert run_sweep(scene, tx, rx, cfg) == 1

    chunks = list(load_sweep_results(cfg.output_dir))
    assert len(chunks) == 3
    total_rx = sum(c["a_te"].shape[0] for c in chunks)
    assert total_rx == 10
    assert chunks[0]["a_te"].shape[1:] == (1, 128)


def test_validate_scene_catches_errors():
    good = hrt.box_scene()
    assert validate_scene(good) == []

    bad_idx = HostScene([HostMesh(np.zeros((3, 3), np.float32),
                                  np.array([[0, 1, 5]], np.uint32))])
    with pytest.raises(SceneValidationError):
        validate_scene(bad_idx)

    nan_verts = HostScene([HostMesh(
        np.array([[0, 0, np.nan], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.uint32))])
    with pytest.raises(SceneValidationError):
        validate_scene(nan_verts)

    with pytest.raises(SceneValidationError):
        validate_scene(HostScene([]))

    # degenerate triangles are soft warnings
    deg = HostScene([HostMesh(np.zeros((3, 3), np.float32),
                              np.array([[0, 1, 2]], np.uint32))])
    warns = validate_scene(deg)
    assert any("degenerate" in w for w in warns)


def test_validate_inputs():
    z = np.zeros((1, 3))
    validate_inputs(z, z, z, z, 3.0)
    with pytest.raises(ValueError):
        validate_inputs(np.zeros((1, 2)), z, z, z, 3.0)
    with pytest.raises(ValueError):
        validate_inputs(z, z, z, z, 0.0)
    with pytest.raises(ValueError):
        validate_inputs(z * np.nan, z, z, z, 3.0)
    with pytest.raises(ValueError):
        validate_inputs(z, z, np.zeros((2, 3)), z, 3.0)


def test_check_finite_passes_on_real_trace():
    res = hrt.trace(hrt.box_scene(), [[1.0, 1.0, 1.0]], [[-1.0, -1.0, 2.0]],
                    config=hrt.TracerConfig(num_paths=64, num_bounces=2,
                                            backend="jnp"))
    assert check_finite(res) == []
