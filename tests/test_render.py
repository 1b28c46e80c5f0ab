"""End-to-end render parity vs the NumPy oracle (SURVEY.md §7 P1)."""

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu import render_image
from gpu_raytracer_tpu.engine.renderer import render_chunk
from gpu_raytracer_tpu.reference import cpu_tracer as oracle
from gpu_raytracer_tpu.utils.image import rmse, to_u8, write_png, write_ppm


def test_default_scene_matches_oracle(default_scene):
    W = H = 48
    img = render_image(default_scene, W, H)
    ref = oracle.render(oracle.scene_dict_from(default_scene), W, H)
    assert img.shape == (H, W, 3)
    e = rmse(img, ref)
    assert e < 1e-5, f"RMSE {e}"
    # something actually rendered
    assert img.max() > 0.05


def test_render_hits_expected_objects(default_scene):
    """Centre pixel looks at the red diffuse sphere at (0,0,-1)."""
    W = H = 64
    img = render_image(default_scene, W, H)
    c = img[H // 2, W // 2]
    assert c[0] > c[2] > 0.0  # red-dominant
    # corner pixels are sky (black in legacy mode)
    assert (img[0, 0] == 0).all()


def test_shadows_darken(default_scene):
    W = H = 32
    plain = render_image(default_scene, W, H)
    shadowed = render_image(default_scene, W, H, shadows=True)
    assert shadowed.sum() <= plain.sum() + 1e-6
    # shading still bounded and finite
    assert np.isfinite(shadowed).all()


def test_chunked_equals_whole(default_scene):
    from gpu_raytracer_tpu import RaytracerConfig, Renderer

    W = H = 32
    whole = render_image(default_scene, W, H)
    small = Renderer(default_scene, W, H,
                     config=RaytracerConfig(ray_batch_size=128)).render()
    # whole-frame goes through packet traversal, small chunks through the
    # per-ray path — same math, fusion-level fp differences allowed
    np.testing.assert_allclose(whole, small, atol=1e-6)


def test_brute_equals_bvh_path(default_scene):
    W = H = 32
    py, px = np.mgrid[0:H, 0:W]
    px = jnp.asarray(px.reshape(-1))
    py = jnp.asarray(py.reshape(-1))
    a = render_chunk(default_scene, px, py, W, H, use_bvh=True)
    b = render_chunk(default_scene, px, py, W, H, use_bvh=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_image_io(tmp_path, default_scene):
    img = render_image(default_scene, 16, 16)
    p1 = tmp_path / "out.png"
    p2 = tmp_path / "out.ppm"
    write_png(str(p1), img)
    write_ppm(str(p2), img)
    assert p1.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    u8 = to_u8(img)
    assert u8.dtype == np.uint8 and u8.shape == (16, 16, 3)


def test_srgb_transfer_curve():
    """Pin the exact piecewise IEC 61966-2-1 transfer at the display
    boundary (the reference's sRGB swapchain, renderer.rs:128-133): known
    values, continuity at the breakpoint, round-trip inverse, and that
    to_u8 defaults to the encode while srgb=False stays linear."""
    from gpu_raytracer_tpu.utils.image import (linear_to_srgb, srgb_to_linear,
                                               to_u8)

    # exact knots of the standard
    assert linear_to_srgb(np.float64(0.0)) == 0.0
    np.testing.assert_allclose(linear_to_srgb(np.float64(1.0)), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(linear_to_srgb(np.float64(0.0031308)),
                               0.04045, atol=1e-6)
    np.testing.assert_allclose(linear_to_srgb(np.float64(0.5)),
                               0.7353569830524495, atol=1e-9)
    np.testing.assert_allclose(srgb_to_linear(np.float64(0.5)),
                               0.21404114048223255, atol=1e-9)
    # continuity across the breakpoint
    eps = 1e-7
    lo = linear_to_srgb(np.float64(0.0031308 - eps))
    hi = linear_to_srgb(np.float64(0.0031308 + eps))
    assert abs(hi - lo) < 1e-5
    # round-trip
    x = np.linspace(0.0, 1.0, 257)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x,
                               atol=1e-6)
    # device (jnp) and host (np) encodes agree
    import jax.numpy as jnp
    d = np.asarray(linear_to_srgb(jnp.asarray(x, jnp.float32), xp=jnp))
    np.testing.assert_allclose(d, linear_to_srgb(x), atol=1e-5)
    # to_u8 default is the display encode; srgb=False is raw linear
    img = np.full((2, 2, 3), 0.5, np.float32)
    assert to_u8(img)[0, 0, 0] == 188          # round(0.73536*255)
    assert to_u8(img, srgb=False)[0, 0, 0] == 128
