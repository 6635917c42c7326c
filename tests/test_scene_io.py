"""Scene data model + HRT/Sionna I/O tests (reference format:
/root/reference/src/scene.c:7-83, importer: /root/reference/src/scene_fromSionna.c)."""
import io
import os
import struct

import numpy as np
import pytest

from hermespy_rt_tpu.scene import (HostMesh, HostScene, box_scene,
                                   flatten_scene, load_hrt, save_hrt,
                                   simple_reflector_scene, load_scene,
                                   load_ply, HrtFormatError)
from tests.utils import ref_scene_path


def test_hrt_roundtrip(tmp_path):
    scene = box_scene()
    scene.meshes[0].velocity = np.array([1.0, -2.0, 0.5], np.float32)
    p = str(tmp_path / "box.hrt")
    save_hrt(scene, p)
    loaded = load_hrt(p)
    assert loaded.num_meshes == 1
    m0, m1 = scene.meshes[0], loaded.meshes[0]
    np.testing.assert_array_equal(m0.vertices, m1.vertices)
    np.testing.assert_array_equal(m0.indices, m1.indices)
    assert m1.material_index == m0.material_index
    np.testing.assert_array_equal(m0.velocity, m1.velocity)


def test_hrt_reads_reference_scenes():
    # Shipped scene facts per SURVEY.md §2 asset table.
    expect = {
        "box.hrt": (1, 12),
        "simple_reflector.hrt": (1, 2),
        "2cars.hrt": (3, 26),
        "simple_street_canyon_with_cars.hrt": (15, 234),
    }
    for name, (nm, nt) in expect.items():
        scene = load_hrt(ref_scene_path(name))
        assert scene.num_meshes == nm
        assert scene.num_triangles == nt


def test_hrt_rejects_garbage():
    with pytest.raises(HrtFormatError):
        load_hrt(io.BytesIO(b"NOT A SCENE"))
    with pytest.raises(HrtFormatError):
        load_hrt(io.BytesIO(b"HRT" + struct.pack("<I", 0)))
    with pytest.raises(HrtFormatError):
        load_hrt(io.BytesIO(b"HRT" + struct.pack("<I", 100000)))


def test_flatten_scene_normals_and_padding():
    soa = flatten_scene(simple_reflector_scene(), pad_to=128)
    assert soa.pad_triangles == 128
    assert soa.num_triangles == 2
    n = np.asarray(soa.normal)[:2]
    np.testing.assert_allclose(n, [[0, 0, 1], [0, 0, 1]], atol=1e-7)
    # padding rows are degenerate
    assert np.all(np.asarray(soa.e1)[2:] == 0)
    assert np.all(np.asarray(soa.mesh_id)[2:] == -1)


def _write_ply(path, vertices, faces, extra_props=("s", "t")):
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(vertices)}",
               "property float x", "property float y", "property float z"]
        hdr += [f"property float {p}" for p in extra_props]
        hdr += [f"element face {len(faces)}",
                "property list uchar int vertex_index", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        for v in vertices:
            f.write(np.asarray(v, "<f4").tobytes())
            f.write(np.zeros(len(extra_props), "<f4").tobytes())
        for face in faces:
            f.write(struct.pack("<B", 3))
            f.write(np.asarray(face, "<u4").tobytes())


def test_sionna_import(tmp_path):
    meshes_dir = tmp_path / "meshes"
    os.makedirs(meshes_dir)
    _write_ply(meshes_dir / "plate.ply",
               [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
               [[0, 1, 2], [0, 2, 3]])
    xml = """<?xml version="1.0"?>
<scene version="2.1.0">
  <bsdf type="twosided" id="mat-itu_concrete"><bsdf type="diffuse"/></bsdf>
  <shape type="ply" name="plate-shape">
    <string name="filename" value="meshes/plate.ply"/>
    <ref id="mat-itu_concrete" name="bsdf"/>
  </shape>
</scene>"""
    xml_path = tmp_path / "test_scene.xml"
    xml_path.write_text(xml)
    scene = load_scene(str(xml_path))
    assert scene.num_meshes == 1
    assert scene.meshes[0].material_index == 1  # concrete
    assert scene.meshes[0].num_triangles == 2

    # CSV sidecar overrides material + velocity
    (tmp_path / "test_scene.csv").write_text(
        "name,material_index,velocity_x,velocity_y,velocity_z\n"
        "plate-shape,13,1.5,0,0\n")
    scene = load_scene(str(xml_path))
    assert scene.meshes[0].material_index == 13  # metal
    np.testing.assert_allclose(scene.meshes[0].velocity, [1.5, 0, 0])


def test_hardcoded_scene_shortcuts(tmp_path):
    # The reference short-circuits these names
    # (/root/reference/src/scene_fromSionna.c:475-478).
    s = load_scene(str(tmp_path / "box.xml"))
    assert s.num_triangles == 12
    s = load_scene(str(tmp_path / "simple_reflector.xml"))
    assert s.num_triangles == 2


def test_ply_loader_against_reference_ply(tmp_path):
    _write_ply(tmp_path / "m.ply", [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]])
    mesh = load_ply(str(tmp_path / "m.ply"))
    assert mesh.num_vertices == 3 and mesh.num_triangles == 1


def test_sionna_transform_matrix_and_ops(tmp_path):
    """Mitsuba <transform name="to_world"> blocks (matrix / translate /
    rotate / scale) are parsed by the xml.etree path and baked into the
    vertices — the reference scanner ignores them entirely
    (/root/reference/src/scene_fromSionna.c:255-367)."""
    meshes_dir = tmp_path / "meshes"
    os.makedirs(meshes_dir)
    _write_ply(meshes_dir / "plate.ply",
               [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
               [[0, 1, 2], [0, 2, 3]])
    xml = """<?xml version="1.0"?>
<scene version="2.1.0">
  <bsdf type="twosided" id="mat-itu_metal"/>
  <shape type="ply" id="mesh-car" name="car">
    <string name="filename" value="meshes/plate.ply"/>
    <ref id="mat-itu_metal" name="bsdf"/>
    <transform name="to_world">
      <scale value="2"/>
      <rotate z="1" angle="90"/>
      <translate x="10" y="-3" z="5"/>
    </transform>
  </shape>
  <shape type="ply" id="mesh-wall" name="wall">
    <string name="filename" value="meshes/plate.ply"/>
    <ref id="mat-itu_concrete" name="bsdf"/>
    <transform name="to_world">
      <matrix value="1 0 0 4  0 1 0 0  0 0 1 0  0 0 0 1"/>
    </transform>
  </shape>
</scene>"""
    p = tmp_path / "t.xml"
    p.write_text(xml)
    scene = load_scene(str(p))
    assert scene.num_meshes == 2
    car, wall = scene.meshes
    assert car.material_index == 13  # metal
    # scale 2 then rotate 90deg about z then translate: (1,0,0) ->
    # (2,0,0) -> (0,2,0) -> (10,-1,5)
    np.testing.assert_allclose(car.vertices[1], [10, -1, 5], atol=1e-5)
    np.testing.assert_allclose(car.vertices[0], [10, -3, 5], atol=1e-5)
    # 4x4 matrix translate x+4
    np.testing.assert_allclose(wall.vertices[0], [4, 0, 0], atol=1e-6)

    # and it traces end-to-end
    import jax.numpy as jnp
    from hermespy_rt_tpu.config import TracerConfig
    from hermespy_rt_tpu.materials import default_materials
    from hermespy_rt_tpu.tracer import trace_paths
    tris = flatten_scene(scene)
    res = trace_paths(tris, default_materials(),
                      jnp.asarray([[10.0, -2.0, 8.0]]),
                      jnp.asarray([[10.0, -2.0, 2.0]]),
                      jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.float32(3.0),
                      TracerConfig(num_paths=256, num_bounces=2,
                                   backend="jnp", keep_rays=False))
    assert np.isfinite(np.abs(np.asarray(res.scatter.a_te))).all()


def test_sionna_regex_fallback_on_malformed_xml(tmp_path):
    """Not-well-formed XML (unclosed tags) falls back to the reference-style
    regex scan and still imports."""
    meshes_dir = tmp_path / "meshes"
    os.makedirs(meshes_dir)
    _write_ply(meshes_dir / "plate.ply",
               [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]])
    xml = """<scene version="2.1.0">
  <shape type="ply" name="plate">
    <string name="filename" value="meshes/plate.ply"/>
    <ref id="mat-itu_brick" name="bsdf"/>
  </shape>
  <unclosed>
</scene>"""
    p = tmp_path / "bad.xml"
    p.write_text(xml)
    scene = load_scene(str(p))
    assert scene.num_meshes == 1
    assert scene.meshes[0].material_index == 2  # brick
