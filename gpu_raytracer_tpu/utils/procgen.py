"""Procedural benchmark scenes.

The environment has no glTF assets (zero egress), so benchmark configs that
call for "Sponza-scale" geometry (BASELINE.md configs 4-5) use a procedural
stand-in: an architectural courtyard — tiled floor, a grid of columns, arched
boxes and a rippled heightfield roof — tuned to a target triangle count, with
a camera inside and several punctual lights. Deterministic per seed.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONFIG, RaytracerConfig
from ..models.camera import Camera
from ..models.geometry import Mesh, Spheres
from ..models.light import LightBuilder
from ..models.material import MaterialBuilder
from ..models.scene import Scene, prepare_scene

_BOX_FACES = np.asarray([
    [0, 1, 2], [0, 2, 3],  # bottom
    [4, 6, 5], [4, 7, 6],  # top
    [0, 4, 5], [0, 5, 1],  # -z
    [3, 2, 6], [3, 6, 7],  # +z
    [0, 3, 7], [0, 7, 4],  # -x
    [1, 5, 6], [1, 6, 2],  # +x
], np.uint32)

_BOX_CORNERS = np.asarray([
    [0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1],
    [0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1],
], np.float32)


def _boxes(centers, sizes):
    """Vectorised box meshes: centers [B,3], sizes [B,3] → (verts, faces)."""
    B = centers.shape[0]
    verts = (_BOX_CORNERS[None] - 0.5) * sizes[:, None, :] + centers[:, None, :]
    faces = _BOX_FACES[None] + (np.arange(B, dtype=np.uint32) * 8)[:, None, None]
    return verts.reshape(-1, 3).astype(np.float32), faces.reshape(-1, 3)


def _heightfield(nx, nz, x0, x1, z0, z1, fn):
    xs = np.linspace(x0, x1, nx, dtype=np.float32)
    zs = np.linspace(z0, z1, nz, dtype=np.float32)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = fn(X, Z).astype(np.float32)
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    i, j = np.meshgrid(np.arange(nx - 1), np.arange(nz - 1), indexing="ij")
    a = (i * nz + j).reshape(-1)
    b = ((i + 1) * nz + j).reshape(-1)
    c = ((i + 1) * nz + j + 1).reshape(-1)
    d = (i * nz + j + 1).reshape(-1)
    faces = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)])
    return verts, faces.astype(np.uint32)


def make_courtyard_scene(target_triangles: int = 100_000, seed: int = 0,
                         config: RaytracerConfig = DEFAULT_CONFIG,
                         lights: int = 2) -> Scene:
    """Sponza-scale procedural stand-in."""
    rng = np.random.default_rng(seed)
    mats = MaterialBuilder()
    m_stone = mats.add_diffuse((0.6, 0.55, 0.5))
    m_floor = mats.add_diffuse((0.45, 0.42, 0.4))
    m_metal = mats.add_metallic((0.7, 0.6, 0.3), 0.2)
    m_glass = mats.add_glass((0.4, 0.5, 0.8), 1.5, 0.9)
    m_red = mats.add_diffuse((0.7, 0.15, 0.1))

    all_verts, all_faces, all_mats = [], [], []
    voffset = 0

    def add(verts, faces, mat_ids):
        nonlocal voffset
        all_verts.append(verts)
        all_faces.append(faces + voffset)
        all_mats.append(mat_ids)
        voffset += verts.shape[0]

    # columns + crates on a CONSTANT-SPACING grid (12 tris per box): the
    # scene extent grows with the triangle budget, so boxes never merge into
    # a solid mass and the camera always has sight lines through the field —
    # a constant-extent grid packs solid at ~100k tris, which makes every
    # camera ray terminate on the nearest wall and the benchmark trivially
    # easy (and the image a flat ambient wall).
    n_boxes = max(target_triangles // 24, 1)
    grid = int(np.ceil(np.sqrt(n_boxes)))
    spacing = 1.75
    extent = grid * spacing / 2.0
    # centers at half-spacing offsets regardless of grid parity, so the
    # lines x = k*spacing (in particular x = 0) are always clear lanes
    gx, gz = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    pos = np.stack([
        (gx.reshape(-1) - grid // 2 + 0.5) * spacing,
        np.zeros(grid * grid),
        (gz.reshape(-1) - grid // 2 + 0.5) * spacing,
    ], axis=1)[:n_boxes].astype(np.float32)
    heights = rng.uniform(0.5, 4.0, n_boxes).astype(np.float32)
    widths = rng.uniform(0.3, 1.2, (n_boxes, 2)).astype(np.float32)
    sizes = np.stack([widths[:, 0], heights, widths[:, 1]], axis=1)
    centers = pos + np.stack([np.zeros(n_boxes), heights / 2 + 0.2,
                              np.zeros(n_boxes)], axis=1)
    bv, bf = _boxes(centers, sizes)
    box_mats = rng.choice(np.asarray([m_stone, m_stone, m_stone, m_metal,
                                      m_glass, m_red], np.uint32),
                          size=n_boxes)
    add(bv, bf, np.repeat(box_mats, 12))

    # floor heightfield (gentle ripple) sized to the box field, consuming
    # the rest of the budget
    hf_tris = max(target_triangles - n_boxes * 12, 2)
    n = int(np.sqrt(hf_tris / 2)) + 1
    hv, hfc = _heightfield(n, n, -extent, extent, -extent, extent,
                           lambda x, z: 0.15 * np.sin(x * 0.8) * np.cos(z * 0.7))
    add(hv, hfc, np.full(hfc.shape[0], m_floor, np.uint32))

    mesh = Mesh.from_arrays(np.concatenate(all_verts),
                            np.concatenate(all_faces),
                            np.concatenate(all_mats))

    lb = LightBuilder()
    lb.add_directional((0.3, -1.0, 0.2), (1.0, 0.98, 0.9), 1.5)
    if lights > 1:
        lb.add_point((0.0, 8.0, 0.0), (1.0, 0.9, 0.7), 4.0)
    for i in range(max(lights - 2, 0)):
        p = rng.uniform(-20, 20, 3)
        p[1] = rng.uniform(2, 6)
        lb.add_point(tuple(p), tuple(rng.uniform(0.5, 1.0, 3)), 2.0)

    # camera on the x = 0 lane (always clear, see the half-offset centres),
    # at a z-lane crossing just inside the field edge, looking down the lane
    cam_z = float(np.floor(extent * 0.9 / spacing) * spacing)
    camera = Camera.create(position=(0.0, 2.5, cam_z),
                           direction=(0.0, -0.12, -1.0), fov=55.0)
    return prepare_scene(camera, Spheres.from_rows([]), mesh, mats.build(),
                         lb.build(), config=config)
