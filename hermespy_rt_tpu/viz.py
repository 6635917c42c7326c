"""Ray/scene visualisation.

Capability parity with the reference OpenGL/GLUT viewer
(``/root/reference/viz/vizrays.c``): renders the scene triangles colour-coded
by mesh and the bounce-``k`` ray segments colour-coded by bounce depth,
honouring the per-ray active mask.  Redesigned headless-first (matplotlib 3D,
PNG/SVG output) since TPU hosts have no display; an interactive window still
works locally via ``plt.show()``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .scene.model import HostScene
from .tracer import RaysInfo

__all__ = ["plot_scene", "plot_rays", "save_rays_figure"]

_BOUNCE_COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
                  "#8c564b", "#e377c2"]


def _require_mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt  # noqa: F401
    return matplotlib


def plot_scene(scene: HostScene, ax=None, alpha: float = 0.35):
    """Triangles colour-coded per mesh (viz/vizrays.c:51-71)."""
    _require_mpl()
    import matplotlib.pyplot as plt
    from matplotlib import colormaps
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    if ax is None:
        fig = plt.figure(figsize=(9, 8))
        ax = fig.add_subplot(111, projection="3d")
    cmap = colormaps["tab20"]
    for mi, mesh in enumerate(scene.meshes):
        tri = mesh.vertices[mesh.indices.astype(np.int64)]
        coll = Poly3DCollection(tri, alpha=alpha,
                                facecolor=cmap(mi % 20), edgecolor="k",
                                linewidths=0.2)
        ax.add_collection3d(coll)
    lo, hi = scene.bounding_box()
    c = (lo + hi) / 2
    r = float(np.max(hi - lo)) / 2 or 1.0
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    return ax


def plot_rays(rays: RaysInfo, ax, bounces: Optional[Sequence[int]] = None,
              tx: int = 0, max_rays: int = 256, seg_len: float = 2.0):
    """Ray segments per bounce slot, colour-coded by depth and masked by
    activity (viz/vizrays.c:73-131).  ``seg_len`` draws inactive-terminal
    direction stubs like the reference's fixed-length segment display."""
    o = np.asarray(rays.origins[tx])       # [B+1, P, 3]
    d = np.asarray(rays.directions[tx])
    act = np.asarray(rays.active[tx])      # [B+1, P]
    nslots, P = act.shape
    sel = np.linspace(0, P - 1, min(max_rays, P)).astype(int)
    bounces = range(nslots) if bounces is None else bounces
    for b in bounces:
        color = _BOUNCE_COLORS[b % len(_BOUNCE_COLORS)]
        for p in sel:
            if not act[b, p]:
                continue
            start = o[b, p]
            if b + 1 < nslots and act[min(b + 1, nslots - 1), p]:
                end = o[b + 1, p]
            else:
                end = start + seg_len * d[b, p]
            ax.plot([start[0], end[0]], [start[1], end[1]],
                    [start[2], end[2]], color=color, linewidth=0.5,
                    alpha=0.7)
    return ax


def save_rays_figure(scene: HostScene, rays: RaysInfo, path: str,
                     bounces: Optional[Sequence[int]] = None,
                     max_rays: int = 256, dpi: int = 130):
    """Render scene + rays to an image file; the headless equivalent of the
    reference's interactive ``vizrays`` window."""
    _require_mpl()
    import matplotlib.pyplot as plt

    ax = plot_scene(scene)
    plot_rays(rays, ax, bounces=bounces, max_rays=max_rays)
    ax.figure.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(ax.figure)
    return path
