"""Fused MXU texture-shade kernel (ops/pallas/texshade.py) vs the XLA
shade_deferred reference — field-identical shading through one-hot matmul
texture fetches on the guard-band atlas."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.models.geometry import Textures
from gpu_raytracer_tpu.models.material import MaterialBuilder
from gpu_raytracer_tpu.models.scene import build_default_scene, prepare_scene
from gpu_raytracer_tpu.ops.shading import shade_deferred
from gpu_raytracer_tpu.ops.pallas.texshade import (
    pallas_texture_shade, texshade_eligible)


def _textured_scene(rng, n_mats=6, degenerate_glass=False):
    mb = MaterialBuilder()
    imgs, wraps = [], []
    for i in range(3):
        imgs.append(rng.integers(0, 256, size=(5 + 3 * i, 9 + 11 * i, 4),
                                 dtype=np.uint8))
        wraps.append(i)  # one of each wrap mode
    for i in range(n_mats):
        ti = np.full(8, 0xFFFFFFFF, np.uint32)
        if i % 2 == 0:
            ti[0] = i % 3
        if i % 3 == 0:
            ti[1] = (i + 1) % 3
            ti[3] = (i + 2) % 3
            ti[4] = i % 3
        ior = 1.0 + 0.5 * (i % 3)
        trans = 0.5 * (i % 2)
        if not degenerate_glass and trans > 0.0 and ior == 1.0:
            ior = 1.3  # ior=1 transmissive is 0/0 in the reference formula
        mb.add(albedo=rng.uniform(0.2, 1.0, 3), metallic=float(i % 2),
               roughness=0.5, emission=rng.uniform(0, 0.3, 3),
               ior=ior, transmission=trans, texture_indices=ti)
    tex = Textures.from_images(imgs, wrap=wraps)
    base = build_default_scene()
    return prepare_scene(base.camera, base.spheres, base.mesh, mb.build(),
                         base.lights, textures=tex)


def _random_gbuffer(rng, B=2, sub=64, n_mats=6):
    N = B * sub * 128
    light = rng.uniform(0, 3, (N, 3)).astype(np.float32)
    mat_id = rng.integers(-1, n_mats + 2, N).astype(np.int32)  # miss+invalid
    uv = rng.uniform(-1.5, 2.5, (N, 2)).astype(np.float32)
    lam = np.zeros((N, 1), np.float32)     # mip footprint plane (level 0)
    out7 = np.concatenate([light, mat_id[:, None].astype(np.float32), uv,
                           lam], axis=1)
    return (out7.reshape(B, sub, 128, 7).transpose(0, 3, 1, 2),
            light, mat_id, uv)


def test_texshade_parity_full():
    """All wrap modes, all four map slots, miss/invalid lanes, dispersion."""
    rng = np.random.default_rng(0)
    scene = _textured_scene(rng)
    assert texshade_eligible(scene)
    out6, light, mat_id, uv = _random_gbuffer(rng)
    want = np.asarray(shade_deferred(scene, jnp.asarray(light),
                                     jnp.asarray(mat_id), jnp.asarray(uv),
                                     sky_color=(0.1, 0.2, 0.3)))
    got = np.asarray(pallas_texture_shade(scene, jnp.asarray(out6),
                                          sky=(0.1, 0.2, 0.3),
                                          interpret=True))
    assert np.isfinite(want).all()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_texshade_nan_parity_degenerate_glass():
    """ior=1 transmissive materials are 0/0 in the reference dispersion
    formula — the kernel must NaN in exactly the same lanes."""
    rng = np.random.default_rng(1)
    scene = _textured_scene(rng, degenerate_glass=True)
    out6, light, mat_id, uv = _random_gbuffer(rng)
    want = np.asarray(shade_deferred(scene, jnp.asarray(light),
                                     jnp.asarray(mat_id), jnp.asarray(uv)))
    got = np.asarray(pallas_texture_shade(scene, jnp.asarray(out6),
                                          interpret=True))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_texshade_many_materials():
    """A 256-material textured scene stays on the fused path."""
    rng = np.random.default_rng(2)
    scene = _textured_scene(rng, n_mats=256)
    assert texshade_eligible(scene)
    out6, light, mat_id, uv = _random_gbuffer(rng, B=1, n_mats=256)
    want = np.asarray(shade_deferred(scene, jnp.asarray(light),
                                     jnp.asarray(mat_id), jnp.asarray(uv)))
    got = np.asarray(pallas_texture_shade(scene, jnp.asarray(out6),
                                          interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_deferred_render_uses_texshade():
    """End-to-end: pallas_render_deferred routes through the fused shade and
    matches the chunked XLA pipeline on a textured frame."""
    from gpu_raytracer_tpu.ops.pallas.render import (
        pallas_render_deferred, fused_deferred_eligible)
    from gpu_raytracer_tpu.engine.renderer import render_chunk
    from gpu_raytracer_tpu.ops.packet_trace import tiled_pixel_order

    from gpu_raytracer_tpu.models.geometry import Spheres

    rng = np.random.default_rng(3)
    scene = _textured_scene(rng)
    # mesh-only: the deferred kernel has no in-kernel sphere UVs (no atan2)
    scene = prepare_scene(scene.camera, Spheres.from_rows([]), scene.mesh,
                          scene.materials, scene.lights,
                          textures=scene.textures)
    W = H = 128
    px, py = tiled_pixel_order(W, H, tile=64)
    px, py = jnp.asarray(px), jnp.asarray(py)
    assert fused_deferred_eligible(scene, sphere_uv_ok=True)
    got = np.asarray(pallas_render_deferred(scene, px, py, W, H,
                                            packet_size=1024,
                                            interpret=True))
    want = np.asarray(render_chunk(scene, px, py, W, H))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_texshade_windowed_fetch_parity():
    """Atlases larger than BLOCK_WINDOW_ROWS take the windowed fetch:
    coherent blocks contract the sampling matmul over a 128-aligned
    window around the block's min tap row; blocks that straddle it fall
    back to the per-group full-K loop. Tight / medium / wide UV spreads
    over a 512x512 map exercise the window and the fallback; results
    must equal the XLA reference exactly as before."""
    from gpu_raytracer_tpu.ops.pallas.texshade import BLOCK_WINDOW_ROWS

    rng = np.random.default_rng(7)
    mb = MaterialBuilder()
    imgs = [rng.integers(0, 256, size=(512, 512, 4), dtype=np.uint8),
            rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)]
    for i in range(4):
        ti = np.full(8, 0xFFFFFFFF, np.uint32)
        ti[0] = i % 2
        mb.add(albedo=rng.uniform(0.2, 1.0, 3), metallic=float(i % 2),
               roughness=0.5, emission=(0.0, 0.0, 0.0), ior=1.3,
               transmission=0.0, texture_indices=ti)
    tex = Textures.from_images(imgs, wrap=[0, 1], mips=1)
    base = build_default_scene()
    scene = prepare_scene(base.camera, base.spheres, base.mesh, mb.build(),
                          base.lights, textures=tex)
    assert texshade_eligible(scene)
    assert scene.textures.data_u32.shape[0] // 128 > BLOCK_WINDOW_ROWS

    # groups rotate through: tight UV clusters (finest window), medium
    # spread (the coarser middle tier), wide spread across the whole map
    # (full-K fallback) with mixed materials
    B, sub = 1, 16
    N = B * sub * 128
    light = rng.uniform(0, 3, (N, 3)).astype(np.float32)
    mat_id = rng.integers(0, 4, N).astype(np.int32)
    uv = np.empty((N, 2), np.float32)
    for g in range(N // 128):
        s = slice(g * 128, (g + 1) * 128)
        if g % 3 == 0:
            c = rng.uniform(0.1, 0.9, 2)
            uv[s] = c + rng.uniform(-0.01, 0.01, (128, 2))
            mat_id[s] = g % 4          # single material -> coherent rows
        elif g % 3 == 1:
            # ~0.2 of the v range = ~400 of the 2048 atlas rows: straddles
            # the 256-row window but fits the 1024-row tier
            c = rng.uniform(0.2, 0.7, 2)
            uv[s] = c + rng.uniform(-0.1, 0.1, (128, 2))
            mat_id[s] = 0
        else:
            uv[s] = rng.uniform(-1.5, 2.5, (128, 2))
    lam = np.zeros((N, 1), np.float32)
    out7 = np.concatenate([light, mat_id[:, None].astype(np.float32),
                           uv.astype(np.float32), lam], axis=1)
    out7 = out7.reshape(B, sub, 128, 7).transpose(0, 3, 1, 2)

    want = np.asarray(shade_deferred(scene, jnp.asarray(light),
                                     jnp.asarray(mat_id),
                                     jnp.asarray(uv)))
    got = np.asarray(pallas_texture_shade(scene, jnp.asarray(out7),
                                          interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)
