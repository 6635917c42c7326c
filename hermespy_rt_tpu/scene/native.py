"""ctypes bindings for the native C++ scene-I/O library (csrc/hrt_io.cpp).

Builds ``libhrt_io.so`` on first use (make; g++) and exposes fast HRT
load/save, binary-PLY reading and SoA flattening.  Falls back silently to the
pure-Python implementations when no compiler is available — every entry point
here has a Python twin in :mod:`hermespy_rt_tpu.scene.hrt` /
:mod:`hermespy_rt_tpu.scene.model`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .model import HostMesh, HostScene

__all__ = ["native_available", "load_hrt_native", "save_hrt_native",
           "flatten_arrays_native", "NativeIOError"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libhrt_io.so")
_lib = None
_tried = False


class NativeIOError(RuntimeError):
    pass


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_CSRC, "hrt_io.cpp")
    if not os.path.exists(src):
        return None
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    lib.hrt_last_error.restype = ctypes.c_char_p
    lib.hrt_scene_new.restype = ctypes.c_void_p
    lib.hrt_scene_free.argtypes = [ctypes.c_void_p]
    lib.hrt_scene_num_meshes.argtypes = [ctypes.c_void_p]
    lib.hrt_scene_num_triangles.argtypes = [ctypes.c_void_p]
    lib.hrt_load.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.hrt_save.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.hrt_mesh_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float)]
    lib.hrt_mesh_copy.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p, u32p]
    lib.hrt_scene_add_mesh.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_uint32, u32p, ctypes.c_uint32,
        ctypes.c_uint32, f32p]
    lib.hrt_flatten.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                f32p, f32p, f32p, f32p, f32p, i32p, i32p]
    lib.hrt_load_ply.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_uint32, f32p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _check(lib, rc: int):
    if rc != 0:
        raise NativeIOError(lib.hrt_last_error().decode())


def _scene_to_handle(lib, scene: HostScene):
    h = lib.hrt_scene_new()
    for m in scene.meshes:
        lib.hrt_scene_add_mesh(
            h, np.ascontiguousarray(m.vertices, np.float32), m.num_vertices,
            np.ascontiguousarray(m.indices, np.uint32), m.num_triangles,
            m.material_index, np.ascontiguousarray(m.velocity, np.float32))
    return h


def load_hrt_native(path: str) -> HostScene:
    lib = _get_lib()
    if lib is None:
        raise NativeIOError("native library unavailable")
    h = lib.hrt_scene_new()
    try:
        _check(lib, lib.hrt_load(path.encode(), h))
        meshes = []
        for i in range(lib.hrt_scene_num_meshes(h)):
            nv = ctypes.c_uint32()
            nt = ctypes.c_uint32()
            mat = ctypes.c_uint32()
            vel = (ctypes.c_float * 3)()
            _check(lib, lib.hrt_mesh_info(h, i, ctypes.byref(nv),
                                          ctypes.byref(nt), ctypes.byref(mat),
                                          vel))
            vs = np.empty((nv.value, 3), np.float32)
            idx = np.empty((nt.value, 3), np.uint32)
            _check(lib, lib.hrt_mesh_copy(h, i, vs, idx))
            meshes.append(HostMesh(vs, idx, material_index=int(mat.value),
                                   velocity=np.array(vel, np.float32)))
        return HostScene(meshes)
    finally:
        lib.hrt_scene_free(h)


def save_hrt_native(scene: HostScene, path: str) -> None:
    lib = _get_lib()
    if lib is None:
        raise NativeIOError("native library unavailable")
    h = _scene_to_handle(lib, scene)
    try:
        _check(lib, lib.hrt_save(path.encode(), h))
    finally:
        lib.hrt_scene_free(h)


def flatten_arrays_native(scene: HostScene, pad_triangles: int):
    """Native SoA flattening: returns numpy (v0, e1, e2, normal, velocity,
    material, mesh_id) padded to ``pad_triangles`` rows."""
    lib = _get_lib()
    if lib is None:
        raise NativeIOError("native library unavailable")
    h = _scene_to_handle(lib, scene)
    try:
        v0 = np.empty((pad_triangles, 3), np.float32)
        e1 = np.empty_like(v0)
        e2 = np.empty_like(v0)
        normal = np.empty_like(v0)
        velocity = np.empty_like(v0)
        material = np.empty(pad_triangles, np.int32)
        mesh_id = np.empty(pad_triangles, np.int32)
        _check(lib, lib.hrt_flatten(h, pad_triangles, v0, e1, e2, normal,
                                    velocity, material, mesh_id))
        return v0, e1, e2, normal, velocity, material, mesh_id
    finally:
        lib.hrt_scene_free(h)
