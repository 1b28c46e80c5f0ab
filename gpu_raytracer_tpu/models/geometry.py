"""Geometric primitives (struct-of-arrays) + host helpers.

Covers the reference's `Sphere`, `Vertex`, `Triangle`, `TriangleLegacy` and
`Aabb` types (/root/reference/shared/src/lib.rs:97-150, impls lib.rs:641-831).
Arrays, not structs: vertices `[V,3]`, triangle indices `[T,3]`, etc.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class Spheres:
    center: jnp.ndarray       # [S,3] f32
    radius: jnp.ndarray       # [S] f32
    material_id: jnp.ndarray  # [S] u32

    @property
    def count(self) -> int:
        return self.center.shape[0]

    @staticmethod
    def from_rows(rows: list[tuple]) -> "Spheres":
        """rows: (center, radius, material_id). Empty scenes get one
        radius-0 sphere (a guaranteed miss: discriminant < 0 for r=0 unless
        the ray passes exactly through the centre; also t ≤ MIN_RAY_DISTANCE)."""
        if not rows:
            rows = [((0.0, 0.0, 0.0), 0.0, 0)]
        c = np.asarray([r[0] for r in rows], np.float32).reshape(-1, 3)
        rad = np.asarray([r[1] for r in rows], np.float32)
        mid = np.asarray([r[2] for r in rows], np.uint32)
        return Spheres(jnp.asarray(c), jnp.asarray(rad), jnp.asarray(mid))


@pytree_dataclass
class Mesh:
    """Indexed triangle mesh — Vertex/Triangle semantics of
    /root/reference/shared/src/lib.rs:108-127.

    `from_arrays`/`empty` keep HOST (NumPy) arrays: the mesh is a host-side
    asset consumed by the BVH builder and refit; `prepare_scene` converts it
    to device arrays exactly once when assembling the Scene. (Round-tripping
    through the accelerator before the host build is pure transfer cost —
    and very slow over a tunneled TPU.)"""

    vertices: jnp.ndarray     # [V,3] f32
    indices: jnp.ndarray      # [T,3] u32 (v0,v1,v2)
    material_id: jnp.ndarray  # [T] u32
    # Per-vertex texture coordinates (TEXCOORD_0). The reference's 12-byte
    # vertex carries positions only (shared/src/lib.rs:108-127) — one reason
    # its texture bindings go unread; here UVs are first-class so texturing
    # actually works. All-zeros when the asset has none.
    uv: jnp.ndarray           # [V,2] f32

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @staticmethod
    def empty() -> "Mesh":
        # One degenerate triangle (all vertices at origin): Möller-Trumbore
        # rejects it via the |det| < MIN_RAY_DISTANCE guard, so it never hits.
        return Mesh(
            vertices=np.zeros((1, 3), np.float32),
            indices=np.zeros((1, 3), np.uint32),
            material_id=np.zeros((1,), np.uint32),
            uv=np.zeros((1, 2), np.float32),
        )

    @staticmethod
    def from_arrays(vertices, indices, material_id, uv=None) -> "Mesh":
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        i = np.asarray(indices, np.uint32).reshape(-1, 3)
        m = np.asarray(material_id, np.uint32).reshape(-1)
        assert i.shape[0] == m.shape[0]
        if i.shape[0] == 0:
            return Mesh.empty()
        t = (np.zeros((v.shape[0], 2), np.float32) if uv is None
             else np.asarray(uv, np.float32).reshape(-1, 2))
        assert t.shape[0] == v.shape[0]
        return Mesh(v, i, m, t)

    def to_device(self) -> "Mesh":
        return Mesh(jnp.asarray(self.vertices), jnp.asarray(self.indices),
                    jnp.asarray(self.material_id), jnp.asarray(self.uv))


def dedup_triangles(tri_vertices: np.ndarray, material_ids: np.ndarray):
    """Convert fat triangles `[T,3,3]` to an indexed mesh with bit-exact
    position dedup — TriangleLegacy::to_indexed semantics
    (/root/reference/shared/src/lib.rs:688-749) and the glTF loader's
    HashMap-on-f32-bits dedup (/root/reference/src/gltf_loader.rs:287-394),
    vectorised with np.unique over the raw bit patterns."""
    tri_vertices = np.asarray(tri_vertices, np.float32).reshape(-1, 3, 3)
    flat = tri_vertices.reshape(-1, 3)
    bits = flat.view(np.uint32)
    # unique rows by bit pattern; `index` keeps first occurrence order stable
    _, first_idx, inverse = np.unique(
        bits, axis=0, return_index=True, return_inverse=True
    )
    # Reorder unique set by first appearance (matches find_or_add_vertex order).
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    vertices = flat[np.sort(first_idx)]
    indices = rank[inverse].reshape(-1, 3).astype(np.uint32)
    return vertices, indices, np.asarray(material_ids, np.uint32)


def triangle_aabbs(vertices: np.ndarray, indices: np.ndarray):
    """Per-triangle AABBs — Triangle::bounding_box
    (/root/reference/shared/src/lib.rs:671-685). Returns (min[T,3], max[T,3])."""
    tri = vertices[indices]  # [T,3,3]
    return tri.min(axis=1), tri.max(axis=1)


def aabb_union(min_a, max_a, min_b, max_b):
    """Aabb::union (/root/reference/shared/src/lib.rs:751-802)."""
    return np.minimum(min_a, min_b), np.maximum(max_a, max_b)


def aabb_surface_area(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


@pytree_dataclass
class Textures:
    """Texture atlas — TextureInfo semantics
    (/root/reference/shared/src/lib.rs:85-95) with the flat byte buffer of
    /root/reference/src/gltf_loader.rs:128-184. All textures are decoded to
    RGBA8 and stored contiguously; `offset` indexes into `data` in bytes."""

    width: jnp.ndarray    # [N] u32
    height: jnp.ndarray   # [N] u32
    format: jnp.ndarray   # [N] u32 (3 = RGBA8; everything is decoded to RGBA8)
    offset: jnp.ndarray   # [N] u32 byte offset into the (conceptual) byte buffer
    size: jnp.ndarray     # [N] u32 byte size
    wrap: jnp.ndarray     # [N] u32 sampler wrap: 0=REPEAT 1=CLAMP 2=MIRRORED
    # Texels stored pre-packed as little-endian RGBA-in-u32 — the layout the
    # reference packs on upload (/root/reference/src/buffers.rs:423-431) —
    # so a texel fetch is ONE u32 gather + vector bit unpacking.
    data_u32: jnp.ndarray  # [B/4] u32 flat texels

    @property
    def count(self) -> int:
        return self.width.shape[0]

    @staticmethod
    def empty() -> "Textures":
        z = jnp.zeros((1,), jnp.uint32)
        return Textures(z, z, z, z, z, z, jnp.zeros((1,), jnp.uint32))

    @staticmethod
    def from_images(images: list[np.ndarray],
                    wrap: list[int] | None = None) -> "Textures":
        """images: list of [H,W,4] uint8 arrays; wrap: per-texture sampler
        wrap modes (0=REPEAT, the glTF default)."""
        if not images:
            return Textures.empty()
        widths, heights, offsets, sizes, chunks = [], [], [], [], []
        off = 0
        for img in images:
            img = np.asarray(img, np.uint8)
            assert img.ndim == 3 and img.shape[2] == 4, "textures must be RGBA8"
            h, w = img.shape[:2]
            widths.append(w)
            heights.append(h)
            offsets.append(off)
            sizes.append(h * w * 4)
            chunks.append(img.reshape(-1))
            off += h * w * 4
        u32 = lambda x: jnp.asarray(np.asarray(x, np.uint32))
        flat = np.concatenate(chunks)
        return Textures(
            width=u32(widths), height=u32(heights),
            format=u32([3] * len(images)),
            offset=u32(offsets), size=u32(sizes),
            wrap=u32(wrap if wrap is not None else [0] * len(images)),
            data_u32=jnp.asarray(flat.view("<u4")),
        )
