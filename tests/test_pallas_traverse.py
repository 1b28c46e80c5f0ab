"""Pallas traversal kernel parity (interpret mode on CPU).

The kernels (ops/pallas/traverse.py) are validated against the XLA packet
traversal, which is itself oracle'd against brute force — so agreement here
chains back to the NumPy reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import RaytracerConfig
from gpu_raytracer_tpu.ops.camera_rays import generate_rays
from gpu_raytracer_tpu.ops.packet_trace import packet_traverse, tiled_pixel_order
from gpu_raytracer_tpu.ops.pallas.traverse import (
    pallas_packet_traverse, scene_vmem_bytes)
from gpu_raytracer_tpu.utils.procgen import make_courtyard_scene

MAX_T = np.float32(3.4028235e38 - 2.0)


@pytest.fixture(scope="module")
def courtyard():
    return make_courtyard_scene(2000, seed=1)


@pytest.fixture(scope="module")
def rays(courtyard):
    W = H = 32
    px, py = tiled_pixel_order(W, H, 32)
    o, d = generate_rays(courtyard.camera, W, H,
                         jnp.asarray(px), jnp.asarray(py))
    return o, d, jnp.full((o.shape[0],), MAX_T, jnp.float32)


@pytest.fixture(scope="module")
def xla_result(courtyard, rays):
    o, d, mt = rays
    s = courtyard
    return packet_traverse(s.bvh, s.tri_v0, s.tri_e1, s.tri_e2, o, d, mt,
                           tri_mat=s.tri_mat, leaf_size=s.bvh.max_leaf,
                           packet_size=1024)


@pytest.mark.parametrize("ordered", [False, True])
def test_parity_with_xla_packet(courtyard, rays, xla_result, ordered):
    o, d, mt = rays
    s = courtyard
    t_x, tri_x, hit_x, n_x, m_x, uv_x = xla_result
    t_p, tri_p, hit_p, n_p, m_p, uv_p = pallas_packet_traverse(
        s.bvh, s.tri_v0, s.tri_e1, s.tri_e2, o, d, mt,
        tri_mat=s.tri_mat, interpret=True, ordered=ordered)
    hx = np.asarray(hit_x)
    np.testing.assert_array_equal(hx, np.asarray(hit_p))
    assert hx.sum() > 100
    # closest t is visit-order invariant; winner ids can differ only on
    # exact-t ties (none in this random soup)
    np.testing.assert_array_equal(np.asarray(tri_x), np.asarray(tri_p))
    np.testing.assert_allclose(np.asarray(t_x)[hx], np.asarray(t_p)[hx],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_p))
    np.testing.assert_allclose(np.asarray(n_x)[hx], np.asarray(n_p)[hx],
                               atol=1e-5)


def test_uv_interpolation_matches_xla(courtyard, rays):
    """UV tracked in-kernel equals the XLA path's interpolate_uv.

    uv tracking requires the 8-slot (16-lane) leaf format, which scene prep
    picks for TEXTURED scenes — rebuild the courtyard with an 8-aligned BVH
    to exercise it."""
    import numpy as onp
    from gpu_raytracer_tpu.models.bvh import align_leaves, build_bvh
    from gpu_raytracer_tpu.models.scene import prepare_scene

    o, d, mt = rays
    c = courtyard
    res = align_leaves(build_bvh(onp.asarray(c.mesh.vertices),
                                 onp.asarray(c.mesh.indices), leaf_size=8),
                       8)
    s = prepare_scene(c.camera, c.spheres, c.mesh, c.materials, c.lights,
                      bvh_result=res)
    assert s.bvh.leaf_align == 8
    from gpu_raytracer_tpu.ops.texture import interpolate_uv
    t_x, tri_x, hit_x, n_x, m_x, bary = packet_traverse(
        s.bvh, s.tri_v0, s.tri_e1, s.tri_e2, o, d, mt,
        tri_mat=s.tri_mat, leaf_size=8, packet_size=1024)
    ti = jnp.clip(tri_x, 0, s.tri_v0.shape[0] - 1)
    uv_ref = np.asarray(interpolate_uv(s.tri_uv, ti, bary[:, 0], bary[:, 1]))
    _, _, hit_p, _, _, uv_p = pallas_packet_traverse(
        s.bvh, s.tri_v0, s.tri_e1, s.tri_e2, o, d, mt,
        tri_mat=s.tri_mat, tri_uv=s.tri_uv, interpret=True, ordered=True)
    h = np.asarray(hit_x)
    np.testing.assert_allclose(uv_ref[h], np.asarray(uv_p)[h], atol=1e-5)


def test_vmem_budget_formula():
    # 8 records per 128-lane f32 row, one node table + leaf rows
    assert scene_vmem_bytes(8, 8) == 2 * 128 * 4
    assert scene_vmem_bytes(9, 16) == (2 + 2) * 128 * 4


@pytest.mark.parametrize("per_row_forced", [False, True])
def test_bvh8_traversal_parity(courtyard, rays, xla_result, per_row_forced,
                               monkeypatch):
    """Width-8 overlay (config.bvh_width=8) traverses to the same hits as
    the XLA oracle — in both the full-row and packed (2 nodes/row,
    lax.switch) layouts."""
    import gpu_raytracer_tpu.ops.pallas.traverse as T
    from gpu_raytracer_tpu.models.scene import prepare_scene

    if per_row_forced:
        monkeypatch.setattr(T, "FULL_ROW_QUAD_BUDGET", 0)
    o, d, mt = rays
    c = courtyard
    s = prepare_scene(c.camera, c.spheres, c.mesh, c.materials, c.lights,
                      config=RaytracerConfig(bvh_width=8))
    assert s.bvh.q_child.shape[1] == 8
    assert T.quad_per_row(s.bvh, s.tri_v0.shape[0]) == (2 if per_row_forced
                                                        else 1)
    t_x, tri_x, hit_x, n_x, m_x, _ = xla_result
    t_p, tri_p, hit_p, n_p, m_p, _ = pallas_packet_traverse(
        s.bvh, s.tri_v0, s.tri_e1, s.tri_e2, o, d, mt,
        tri_mat=s.tri_mat, interpret=True, ordered=True)
    hx = np.asarray(hit_x)
    np.testing.assert_array_equal(hx, np.asarray(hit_p))
    np.testing.assert_allclose(np.asarray(t_x)[hx], np.asarray(t_p)[hx],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_x), np.asarray(m_p))


def test_den_code_round_trip_and_packing():
    """The mat+den lane-9 packing (traverse.py DEN_SCALE): the 14-bit
    density code decodes within 2^-7 relative, survives the
    mat * 2^14 + code f32 lane exactly for every mat < 1024, and the
    encode is pure integer+bitcast so every backend decodes the identical
    value."""
    import jax.numpy as jnp
    from gpu_raytracer_tpu.ops.pallas.traverse import (
        DEN_SCALE, den_decode, uv_density_code)

    # random triangles with uv — den spans a wide dynamic range
    rng = np.random.default_rng(0)
    T = 512
    v0 = rng.standard_normal((T, 3)).astype(np.float32)
    e1 = rng.standard_normal((T, 3)).astype(np.float32) * 10.0 ** rng.uniform(
        -3, 3, (T, 1))
    e2 = rng.standard_normal((T, 3)).astype(np.float32) * 10.0 ** rng.uniform(
        -3, 3, (T, 1))
    uv = rng.uniform(-4, 4, (T, 3, 2)).astype(np.float32)
    code = np.asarray(uv_density_code(jnp.asarray(e1), jnp.asarray(e2),
                                      jnp.asarray(uv)))
    assert code.min() >= 0 and code.max() < 16384
    dec = np.asarray(den_decode(jnp.asarray(code)))
    # reference density and relative quantisation error <= 2^-7 (6-bit
    # mantissa, round-to-nearest)
    cn = np.cross(e1, e2)
    n2 = np.maximum((cn * cn).sum(1), 1e-30)
    cruv = ((uv[:, 1, 0] - uv[:, 0, 0]) * (uv[:, 2, 1] - uv[:, 0, 1])
            - (uv[:, 2, 0] - uv[:, 0, 0]) * (uv[:, 1, 1] - uv[:, 0, 1]))
    den = np.sqrt(np.abs(cruv) / np.sqrt(n2))
    nz = den > 1e-30
    rel = np.abs(dec[nz] - den[nz]) / den[nz]
    assert rel.max() <= 2.0 ** -7 + 1e-6

    # the combined lane value mat * 2^14 + code is an exact-int f32 and
    # splits back exactly for the full mat range
    mat = rng.integers(0, 1024, T)
    lane = (mat * DEN_SCALE + code).astype(np.float32)
    matf = np.floor(lane / DEN_SCALE)
    code2 = lane - matf * DEN_SCALE
    np.testing.assert_array_equal(matf.astype(np.int64), mat)
    np.testing.assert_array_equal(code2.astype(np.int64), code)

    # degenerate uv -> code 0 -> decodes to exactly 0.0
    z = np.asarray(uv_density_code(jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                                   jnp.zeros((1, 3, 2))))
    assert z[0] == 0 and float(den_decode(jnp.asarray(z))[0]) == 0.0
