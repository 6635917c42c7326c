"""Scene data model, HRT serialization, Sionna import and procedural builders."""
from .model import HostMesh, HostScene, TriangleSoA, flatten_scene
from .hrt import load_hrt, save_hrt, HrtFormatError
from .builders import (box_scene, simple_reflector_scene, ground_plane_scene,
                       random_soup_scene)
from .sionna import load_ply, load_sionna_xml, load_scene

__all__ = [
    "HostMesh", "HostScene", "TriangleSoA", "flatten_scene",
    "load_hrt", "save_hrt", "HrtFormatError",
    "box_scene", "simple_reflector_scene", "ground_plane_scene",
    "random_soup_scene",
    "load_ply", "load_sionna_xml", "load_scene",
]
