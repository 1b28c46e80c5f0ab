"""Texture atlas sampling.

The reference uploads decoded RGBA8 texture bytes and per-texture metadata to
the GPU (/root/reference/src/buffers.rs:339-470, byte-packing u8→u32 at
buffers.rs:423-431) and binds them to the kernel — but the kernel never reads
them (the bindings are underscore-named, /root/reference/shader/src/lib.rs:34-35),
because the 12-byte position-only vertex format carries no UVs
(shared/src/lib.rs:108-127). This module completes that unfinished design the
TPU way:

* the flat RGBA8 byte buffer is reinterpreted as a `u32` texel array once at
  scene prep (same little-endian RGBA-in-u32 layout the reference packs), so
  a texel fetch is ONE gather + vectorised bit unpacking;
* UVs come from glTF `TEXCOORD_0` (models/gltf.py) interpolated with the
  Möller-Trumbore barycentrics the traversal already computes — no extra
  intersection work;
* wrap mode is REPEAT (the glTF default), filtering is nearest or bilinear.

All functions are batched over rays: `idx` may be any shape S, uv [*S, 2],
returns [*S, 4] f32 in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.geometry import Textures

NO_TEXTURE = jnp.uint32(0xFFFFFFFF)


def _fetch_texel(tex: Textures, idx: jnp.ndarray, tx: jnp.ndarray,
                 ty: jnp.ndarray) -> jnp.ndarray:
    """One u32 gather per lane → RGBA f32. `tx`/`ty` must already be wrapped
    to [0, w) × [0, h). Invalid idx lanes read texel 0 (callers mask)."""
    off_u32 = (tex.offset[idx] >> 2).astype(jnp.uint32)
    w = tex.width[idx].astype(jnp.uint32)
    addr = off_u32 + ty.astype(jnp.uint32) * w + tx.astype(jnp.uint32)
    addr = jnp.minimum(addr, jnp.uint32(tex.data_u32.shape[0] - 1))
    texel = tex.data_u32[addr]
    r = (texel & 0xFF).astype(jnp.float32)
    g = ((texel >> 8) & 0xFF).astype(jnp.float32)
    b = ((texel >> 16) & 0xFF).astype(jnp.float32)
    a = ((texel >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) * (1.0 / 255.0)


def _wrap(coord: jnp.ndarray, size: jnp.ndarray,
          mode: jnp.ndarray) -> jnp.ndarray:
    """Sampler wrap of integer texel coords to [0, size):
    mode 0 = REPEAT, 1 = CLAMP_TO_EDGE, 2 = MIRRORED_REPEAT."""
    size = jnp.maximum(size.astype(jnp.int32), 1)
    repeat = jnp.mod(jnp.mod(coord, size) + size, size)
    clamp = jnp.clip(coord, 0, size - 1)
    per = jnp.mod(jnp.mod(coord, 2 * size) + 2 * size, 2 * size)
    mirror = jnp.where(per < size, per, 2 * size - 1 - per)
    return jnp.where(mode == 1, clamp, jnp.where(mode == 2, mirror, repeat))


@partial(jax.jit, static_argnames=("bilinear",))
def sample_texture(tex: Textures, idx: jnp.ndarray, uv: jnp.ndarray,
                   bilinear: bool = True) -> jnp.ndarray:
    """Sample texture `idx` (u32, NO_TEXTURE = miss) at `uv` → RGBA f32.

    Lanes with idx == NO_TEXTURE (or out of range) return opaque white
    (1,1,1,1) so the caller can multiply unconditionally — the standard
    "no texture = identity factor" convention.
    """
    valid = idx != NO_TEXTURE
    safe = jnp.where(valid, idx, 0).astype(jnp.uint32)
    safe = jnp.minimum(safe, jnp.uint32(max(tex.count - 1, 0)))

    w = tex.width[safe].astype(jnp.int32)
    h = tex.height[safe].astype(jnp.int32)
    mode = tex.wrap[safe].astype(jnp.int32)
    u = uv[..., 0] * w.astype(jnp.float32)
    v = uv[..., 1] * h.astype(jnp.float32)

    if bilinear:
        # Texel centers at integer+0.5 (the reference's wgpu sampler is
        # linear, src/renderer.rs:483-491).
        uf = u - 0.5
        vf = v - 0.5
        x0 = jnp.floor(uf).astype(jnp.int32)
        y0 = jnp.floor(vf).astype(jnp.int32)
        fx = (uf - x0.astype(jnp.float32))[..., None]
        fy = (vf - y0.astype(jnp.float32))[..., None]
        c00 = _fetch_texel(tex, safe, _wrap(x0, w, mode), _wrap(y0, h, mode))
        c10 = _fetch_texel(tex, safe, _wrap(x0 + 1, w, mode),
                           _wrap(y0, h, mode))
        c01 = _fetch_texel(tex, safe, _wrap(x0, w, mode),
                           _wrap(y0 + 1, h, mode))
        c11 = _fetch_texel(tex, safe, _wrap(x0 + 1, w, mode),
                           _wrap(y0 + 1, h, mode))
        top = c00 * (1.0 - fx) + c10 * fx
        bot = c01 * (1.0 - fx) + c11 * fx
        rgba = top * (1.0 - fy) + bot * fy
    else:
        x = _wrap(jnp.floor(u).astype(jnp.int32), w, mode)
        y = _wrap(jnp.floor(v).astype(jnp.int32), h, mode)
        rgba = _fetch_texel(tex, safe, x, y)

    return jnp.where(valid[..., None], rgba, 1.0)


def interpolate_uv(tri_uv: jnp.ndarray, tri_idx: jnp.ndarray,
                   bu: jnp.ndarray, bv: jnp.ndarray) -> jnp.ndarray:
    """Barycentric UV interpolation: tri_uv [Tp,3,2] (leaf order), tri_idx
    [N] winner ids (clipped by caller), bu/bv [N] the Möller-Trumbore
    barycentrics (weights of v1 and v2)."""
    uvs = tri_uv[tri_idx]                     # [N,3,2]
    w0 = (1.0 - bu - bv)[:, None]
    return uvs[:, 0] * w0 + uvs[:, 1] * bu[:, None] + uvs[:, 2] * bv[:, None]


def sphere_uv(normal: jnp.ndarray) -> jnp.ndarray:
    """Spherical (equirectangular) UV from the unit outward normal — the
    conventional mapping; the reference defines none (spheres carry no UVs)."""
    u = 0.5 + jnp.arctan2(normal[..., 2], normal[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(normal[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], axis=-1)
