"""Multi-chip rendering via shard_map.

Two orthogonal strategies (composable in principle, exposed separately):

* **Ray sharding** (data-parallel analogue): the pixel/ray batch is split
  along the mesh's ray axis; the scene pytree is replicated. No collectives
  in the hot loop — each chip traces its own rays, the framebuffer comes back
  ray-sharded. This is the scaling mode for the tile/fly-through configs.

* **Geometry sharding** (tensor-parallel analogue): the expanded triangle
  arrays are split across chips; every chip brute-force-intersects the full
  ray batch against its triangle shard and the per-ray closest hit is
  combined with a min-reduction over ICI (an argmin-style psum pattern).
  This is the mode for scenes too big for one chip's HBM.

The reference has no multi-device path at all (SURVEY.md §2.4: "Multi-chip:
absent in reference"); this layer is the TPU-native extension.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.scene import Scene
from ..ops.intersect import MISS_T, closest_select, triangle_intersect, sphere_intersect
from ..ops.shading import shade
from ..ops.trace import trace, Hit, SPHERE, TRIANGLE
from ..ops.camera_rays import generate_rays
from ..ops.linalg import cross, normalize
from .mesh import RAY_AXIS


def render_rays_sharded(scene: Scene, px: jnp.ndarray, py: jnp.ndarray,
                        width: int, height: int, mesh: Mesh,
                        leaf_size: int = 4, use_bvh: bool = True,
                        sky=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Full trace+shade with the ray batch sharded across the mesh.

    px/py length must divide by the mesh size (pad at the caller).
    Returns RGB [N,3], ray-sharded.
    """

    def shard_fn(scene_rep, pxs, pys):
        o, d = generate_rays(scene_rep.camera, width, height, pxs, pys)
        hit = trace(scene_rep, o, d, leaf_size=leaf_size, use_bvh=use_bvh)
        return shade(scene_rep, hit, sky_color=sky)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS), check_vma=False,
    )
    return jax.jit(fn)(scene, px, py)


def trace_geometry_sharded(scene: Scene, orig: jnp.ndarray, dirn: jnp.ndarray,
                           mesh: Mesh) -> Hit:
    """Closest hit with triangles sharded across chips.

    Each chip tests all rays against its triangle shard (dense brute force —
    MXU/VPU-friendly), then the global winner is reduced over ICI:
    min over shards of (t, shard-local argmin), with the reference tie rule
    (lower global triangle index wins at equal t) preserved by keying the
    reduction on (t, global_index).
    """
    n_dev = mesh.devices.size
    Tp = scene.tri_v0.shape[0]
    pad = (-Tp) % n_dev
    v0 = jnp.pad(scene.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(scene.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(scene.tri_e2, ((0, pad), (0, 0)))
    shard_size = (Tp + pad) // n_dev

    def shard_fn(orig_rep, dirn_rep, v0s, e1s, e2s):
        idx = jax.lax.axis_index(RAY_AXIS)
        t, hit = triangle_intersect(orig_rep, dirn_rep, v0s, e1s, e2s,
                                    MISS_T - 2.0)
        t_best, i_local, any_hit = closest_select(t, hit)
        gidx = idx * shard_size + i_local
        # combine via all-gather (n_dev is small) then argmin; argmin's
        # first-occurrence tie rule = lowest shard = lowest global index,
        # matching the reference's sequential strict-< loop
        ts = jax.lax.all_gather(t_best, RAY_AXIS)          # [D,N]
        gs = jax.lax.all_gather(gidx, RAY_AXIS)            # [D,N]
        hs = jax.lax.all_gather(any_hit, RAY_AXIS)         # [D,N]
        order = jnp.argmin(jnp.where(hs, ts, MISS_T), axis=0)
        take = lambda a: jnp.take_along_axis(a, order[None, :], axis=0)[0]
        return take(ts), take(gs), jnp.any(hs, axis=0)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(), P(), P()), check_vma=False,
    )
    tri_t, tri_i, tri_hit = jax.jit(fn)(orig, dirn, v0, e1, e2)

    # sphere pass is tiny: replicated
    N = orig.shape[0]
    s_t, s_hit = sphere_intersect(orig, dirn, scene.spheres.center,
                                  scene.spheres.radius, MISS_T - 2.0)
    sph_t, sph_i, sph_any = closest_select(s_t, s_hit)
    use_tri = tri_hit & (~sph_any | (tri_t < sph_t))
    t = jnp.where(use_tri, tri_t, jnp.where(sph_any, sph_t, MISS_T))
    hit = use_tri | sph_any
    point = orig + dirn * t[:, None]
    ti = jnp.clip(tri_i, 0, Tp - 1)
    tri_n = normalize(cross(scene.tri_e1[ti], scene.tri_e2[ti]))
    sc = scene.spheres.center[jnp.clip(sph_i, 0, scene.spheres.count - 1)]
    normal = jnp.where(use_tri[:, None], tri_n, normalize(point - sc))
    mat = jnp.where(use_tri, scene.tri_mat[ti],
                    scene.spheres.material_id.astype(jnp.int32)[
                        jnp.clip(sph_i, 0, scene.spheres.count - 1)])
    from ..ops.trace import _mt_bary
    from ..ops.texture import interpolate_uv, sphere_uv
    bu, bv = _mt_bary(orig, dirn, scene.tri_v0[ti], scene.tri_e1[ti],
                      scene.tri_e2[ti])
    uv = jnp.where(use_tri[:, None],
                   interpolate_uv(scene.tri_uv, ti, bu, bv),
                   sphere_uv(normalize(point - sc)))
    return Hit(
        t=jnp.where(hit, t, MISS_T), hit=hit,
        prim_kind=jnp.where(use_tri, TRIANGLE, SPHERE).astype(jnp.int32),
        prim_id=jnp.where(use_tri, ti, sph_i).astype(jnp.int32),
        point=jnp.where(hit[:, None], point, 0.0),
        normal=jnp.where(hit[:, None], normal, 0.0),
        material_id=jnp.where(hit, mat, -1).astype(jnp.int32),
        uv=jnp.where(hit[:, None], uv, 0.0),
    )


def render_frame_multichip(scene: Scene, width: int, height: int, mesh: Mesh,
                           leaf_size: int = 4, use_bvh: bool = True) -> np.ndarray:
    """Whole frame with ray sharding; pads N to the mesh size."""
    n = width * height
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    pyg, pxg = np.mgrid[0:height, 0:width]
    px = np.concatenate([pxg.reshape(-1), np.zeros(pad, np.int64)])
    py = np.concatenate([pyg.reshape(-1), np.zeros(pad, np.int64)])
    rgb = render_rays_sharded(scene, jnp.asarray(px, jnp.int32),
                              jnp.asarray(py, jnp.int32), width, height, mesh,
                              leaf_size=leaf_size, use_bvh=use_bvh)
    return np.asarray(rgb)[:n].reshape(height, width, 3)


def render_frame_fused_multichip(scene, width: int, height: int, mesh,
                                 shadows: bool = False,
                                 interpret: bool = False) -> np.ndarray:
    """Whole frame through the fused raygen→trace→shade Pallas kernel
    (ops/pallas/render.py), ray-sharded over the mesh: every chip holds the
    replicated scene tables and renders its slice of the tile-ordered pixel
    stream — the data-parallel layout where the only collective is the
    implicit output gather (ICI-friendly; no cross-chip traffic during the
    frame). `interpret=True` runs the kernel in the Pallas interpreter for
    virtual-CPU-mesh validation."""
    from ..ops.packet_trace import tiled_pixel_order
    from ..ops.pallas.render import pallas_render_primary

    n_dev = mesh.devices.size
    px, py = tiled_pixel_order(width, height, tile=64)
    n = px.shape[0]
    pad = (-n) % (n_dev * 128)
    if pad:
        px = np.concatenate([px, np.full(pad, width - 1, np.int32)])
        py = np.concatenate([py, np.full(pad, height - 1, np.int32)])
    per_dev = px.shape[0] // n_dev
    packet = max(k for k in (8192, 4096, 1024, 512, 256, 128)
                 if per_dev % k == 0)

    def shard_fn(scene, pxs, pys):
        return pallas_render_primary(scene, pxs, pys, width, height,
                                     shadows=shadows, packet_size=packet,
                                     interpret=interpret)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
                       out_specs=P(RAY_AXIS), check_vma=False)
    flat = np.asarray(jax.jit(fn)(scene, jnp.asarray(px), jnp.asarray(py)))
    fb = np.zeros((height, width, 3), np.float32)
    fb[py, px] = flat
    return fb
