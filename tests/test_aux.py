"""Auxiliary subsystem tests: CLI, viz, native C++ I/O, profiling, fast_acos."""
import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import hermespy_rt_tpu as hrt
from tests.utils import ref_scene_path


def test_fast_acos_accuracy_and_grad():
    import jax
    from hermespy_rt_tpu.ops.geometry import fast_acos
    x = np.linspace(-1, 1, 400_001).astype(np.float32)
    ours = np.asarray(fast_acos(jnp.asarray(x)))
    ref = np.arccos(x.astype(np.float64))
    assert np.abs(ours - ref).max() < 1e-6
    g = float(jax.grad(lambda v: fast_acos(v))(jnp.float32(0.25)))
    assert abs(g - (-1 / np.sqrt(1 - 0.0625))) < 1e-5


def test_cli_convert_and_trace(tmp_path):
    from hermespy_rt_tpu.cli import convert_main, trace_main
    out = str(tmp_path / "box_out.hrt")
    # convert from the hardcoded box.xml shortcut
    rc = convert_main([str(tmp_path / "box.xml"), "-o", out])
    assert rc == 0 and os.path.exists(out)
    scene = hrt.load_hrt(out)
    assert scene.num_triangles == 12

    npz = str(tmp_path / "paths.npz")
    rc = trace_main([out, "--tx=-2,-1,2.5", "--rx", "1,2,1.5",
                     "-p", "128", "-b", "2", "--backend", "jnp",
                     "-o", npz])
    assert rc == 0 and os.path.exists(npz)
    data = np.load(npz)
    assert data["scatter_a_te"].shape == (1, 1, 256)
    assert np.abs(data["scatter_a_te"]).max() > 0


def test_viz_renders_png(tmp_path):
    from hermespy_rt_tpu.viz import save_rays_figure
    scene = hrt.box_scene()
    res = hrt.trace(scene, [[1.0, 2.0, 1.5]], [[-2.0, -1.0, 2.5]],
                    config=hrt.TracerConfig(num_paths=64, num_bounces=2,
                                            backend="jnp"))
    out = str(tmp_path / "rays.png")
    save_rays_figure(scene, res.rays_scatter, out)
    assert os.path.getsize(out) > 10_000


def test_native_io_matches_python(tmp_path):
    from hermespy_rt_tpu.scene import native
    if not native.native_available():
        pytest.skip("no C++ toolchain")
    path = ref_scene_path("2cars.hrt")
    s_native = native.load_hrt_native(path)
    s_py = hrt.load_hrt(path)
    assert s_native.num_meshes == s_py.num_meshes
    for a, b in zip(s_native.meshes, s_py.meshes):
        np.testing.assert_array_equal(a.vertices, b.vertices)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.material_index == b.material_index
        np.testing.assert_array_equal(a.velocity, b.velocity)

    out = str(tmp_path / "roundtrip.hrt")
    native.save_hrt_native(s_native, out)
    np.testing.assert_array_equal(
        hrt.load_hrt(out).meshes[0].vertices, s_py.meshes[0].vertices)

    # flatten parity incl. normals
    v0, e1, e2, n, vel, mat, mid = native.flatten_arrays_native(s_py, 128)
    soa = hrt.flatten_scene(s_py, pad_to=128)
    np.testing.assert_allclose(v0, np.asarray(soa.v0))
    np.testing.assert_allclose(n, np.asarray(soa.normal), atol=2e-7)
    np.testing.assert_array_equal(mat, np.asarray(soa.material))
    np.testing.assert_array_equal(mid, np.asarray(soa.mesh_id))


def test_native_ply_reader(tmp_path):
    from hermespy_rt_tpu.scene import native
    if not native.native_available():
        pytest.skip("no C++ toolchain")
    import ctypes
    from tests.test_scene_io import _write_ply
    ply = tmp_path / "tri.ply"
    _write_ply(ply, [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]])
    lib = native._get_lib()
    h = lib.hrt_scene_new()
    try:
        vel = np.zeros(3, np.float32)
        rc = lib.hrt_load_ply(str(ply).encode(), ctypes.c_void_p(h), 1, vel)
        assert rc == 0, lib.hrt_last_error()
        assert lib.hrt_scene_num_triangles(ctypes.c_void_p(h)) == 1
    finally:
        lib.hrt_scene_free(ctypes.c_void_p(h))


def test_profiling_harness():
    from hermespy_rt_tpu.utils.profiling import time_trace, log_metrics

    cfg = hrt.TracerConfig(num_paths=64, num_bounces=1, backend="jnp",
                           keep_rays=False)
    scene = hrt.simple_reflector_scene()

    def run(_):
        r = hrt.trace(scene, [[0, 0, 0.15]], [[0, 0, 0.151]], config=cfg)
        return r.scatter.tau

    stats = time_trace(run, 0, num_paths=64, num_bounces=1, iters=2)
    assert stats.queries == 1 * 64 * 2 * 1
    assert stats.queries_per_s > 0
    rec = log_metrics(stats, extra={"scene": "reflector"})
    assert rec["scene"] == "reflector"
    json.dumps(rec)


def test_interactive_viewer_controls(tmp_path):
    """RayViewer: bounce stepping (x/z), pan (wasd), roll (q/e) all work
    headless — interactive parity with /root/reference/viz/vizrays.c:200-279."""
    import jax.numpy as jnp
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.scene import box_scene, flatten_scene
    from hermespy_rt_tpu.tracer import trace_paths
    from hermespy_rt_tpu.viz import vizrays

    scene = box_scene()
    res = trace_paths(flatten_scene(scene), default_materials(),
                      jnp.asarray([[1.0, 2.0, 1.5]]),
                      jnp.asarray([[-2.0, -1.0, 2.5]]),
                      jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.float32(3.0),
                      TracerConfig(num_paths=64, num_bounces=3,
                                   backend="jnp"))
    viewer = vizrays(scene, res.rays_scatter, show=False, max_rays=32)
    assert viewer.bounce == 0
    n0 = len(viewer._ray_artists)
    assert n0 > 0

    class E:
        def __init__(self, key):
            self.key = key

    viewer.on_key(E("x"))
    assert viewer.bounce == 1
    viewer.on_key(E("x"))
    viewer.on_key(E("x"))
    viewer.on_key(E("x"))  # clamps at num_slots-1
    assert viewer.bounce == viewer.num_slots - 1
    viewer.on_key(E("z"))
    assert viewer.bounce == viewer.num_slots - 2

    xlim0 = viewer.ax.get_xlim()
    viewer.on_key(E("d"))
    assert viewer.ax.get_xlim() != xlim0

    roll0 = getattr(viewer.ax, "roll", 0.0)
    viewer.on_key(E("e"))
    assert getattr(viewer.ax, "roll", 0.0) != roll0

    # the PNG path still renders after interaction
    from hermespy_rt_tpu.viz import save_rays_figure
    out = save_rays_figure(scene, res.rays_scatter, str(tmp_path / "r.png"))
    import os
    assert os.path.getsize(out) > 0
