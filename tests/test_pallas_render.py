"""Fused render kernel parity (interpret mode on CPU).

pallas_render_primary (raygen → spheres → BVH → shade in one program) must
match the chunked XLA pipeline, which is itself oracle'd against the NumPy
reference tracer."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.engine.renderer import render_chunk
from gpu_raytracer_tpu.models.scene import build_default_scene
from gpu_raytracer_tpu.ops.packet_trace import tiled_pixel_order
from gpu_raytracer_tpu.ops.pallas.render import (
    fused_render_eligible, pallas_render_primary)
from gpu_raytracer_tpu.utils.procgen import make_courtyard_scene


def _coords(W, H):
    px, py = tiled_pixel_order(W, H, 32)
    return jnp.asarray(px), jnp.asarray(py)


@pytest.mark.parametrize("shadows", [False, True])
@pytest.mark.parametrize("scene_fn", [build_default_scene,
                                      lambda: make_courtyard_scene(2000, seed=1)])
def test_fused_matches_xla_pipeline(scene_fn, shadows):
    scene = scene_fn()
    assert fused_render_eligible(scene)
    W = H = 32
    px, py = _coords(W, H)
    ref = render_chunk(scene, px, py, W, H, shadows=shadows, use_bvh=True,
                       leaf_size=8, sky=(0.0, 0.0, 0.0))
    got = pallas_render_primary(scene, px, py, W, H, shadows=shadows,
                                packet_size=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sky_color():
    scene = build_default_scene()
    W = H = 32
    px, py = _coords(W, H)
    got = np.asarray(pallas_render_primary(
        scene, px, py, W, H, sky=(0.25, 0.5, 0.75), packet_size=1024,
        interpret=True))
    ref = np.asarray(render_chunk(scene, px, py, W, H, shadows=False,
                                  use_bvh=True, leaf_size=8,
                                  sky=(0.25, 0.5, 0.75)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_eligibility_gates():
    from gpu_raytracer_tpu.models.geometry import Textures
    from gpu_raytracer_tpu.utils.pytree import replace
    import numpy as onp

    scene = build_default_scene()
    assert fused_render_eligible(scene)
    textured = replace(scene, textures=Textures.from_images(
        [onp.full((2, 2, 4), 255, onp.uint8)]))
    assert not fused_render_eligible(textured)
