"""Packet (shared-cursor) BVH traversal — the TPU-fast path.

Per-ray traversal (ops/bvh_traverse.py) needs a per-lane gather of node data
every step; TPU vector units hate that. This module traverses the tree with
ONE cursor per *packet* of coherent rays instead: the packet visits a node if
ANY of its rays' slab tests pass, so per step the work is

  * a handful of scalar-per-packet gathers (node bounds, links, leaf range) —
    [B]-sized, trivial;
  * dense [B, P] AABB tests and [B, P] Möller-Trumbore leaf tests — exactly
    the shape the VPU wants, zero per-lane gathers.

Results are bit-identical to per-ray traversal: a packet visits a superset of
each ray's nodes in the same left-first DFS order (the order of the
reference's stack traversal, /root/reference/shader/src/bvh.rs:40-85), and a
triangle lies inside its leaf AABB, so a ray that would have culled the leaf
can never pass the triangle's own precise test; strict-< closest updates make
extra tests no-ops and preserve the tie rule.

Packet coherence comes from the renderer feeding pixels in tile order
(Morton-ish 32x32 tiles): rays in a packet share origin and near-parallel
directions, so the union of visited nodes stays close to a single ray's set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bvh import Bvh
from .intersect import MIN_T, MISS_T


@partial(jax.jit, static_argnames=("leaf_size", "packet_size", "any_hit"))
def packet_traverse(
    bvh: Bvh,
    tri_v0: jnp.ndarray,
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    max_t: jnp.ndarray,
    leaf_size: int = 4,
    packet_size: int = 1024,
    any_hit: bool = False,
):
    """Closest-hit (or any-hit) for N rays in packets of `packet_size`.

    N must be a multiple of packet_size (renderer pads).
    Returns (best_t [N], best_tri [N] leaf-order id or -1, hit [N]).
    """
    N = orig.shape[0]
    P = packet_size
    assert N % P == 0, f"ray count {N} not a multiple of packet size {P}"
    B = N // P
    Tp = tri_v0.shape[0]
    num_nodes = bvh.left.shape[0]
    max_iters = jnp.int32(num_nodes + 4)

    o = orig.reshape(B, P, 3)
    d = dirn.reshape(B, P, 3)
    inv_d = 1.0 / d
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (N,)).reshape(B, P)

    # Packed per-node record → ONE gather per step instead of eight:
    # [min.xyz, max.xyz, hit_link, miss_link, tri_start, leaf_count] with the
    # int fields bitcast into the f32 lanes; leaf_count <= 0 marks internal.
    i2f = lambda x: jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)
    node_rec = jnp.concatenate([
        bvh.node_min, bvh.node_max,
        i2f(bvh.hit_link)[:, None], i2f(bvh.miss_link)[:, None],
        i2f(bvh.tri_start)[:, None],
        i2f(jnp.where(bvh.left < 0, bvh.tri_count, 0))[:, None],
    ], axis=1)                                        # [nn, 10]
    # Packed triangles → one dynamic-slice per leaf visit.
    tri_rec = jnp.concatenate([tri_v0, tri_e1, tri_e2], axis=1)  # [Tp, 9]
    f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)

    def per_packet(o, d, inv_d, mt):
        best_t0 = mt
        best_tri0 = jnp.full((P,), -1, jnp.int32)

        def cond(state):
            cursor, _, _, it = state
            return (cursor >= 0) & (it < max_iters)

        def body(state):
            cursor, best_t, best_tri, it = state
            rec = node_rec[cursor]                 # [10], one gather
            nmin = rec[0:3]
            nmax = rec[3:6]
            t1 = (nmin[None, :] - o) * inv_d       # [P,3] dense
            t2 = (nmax[None, :] - o) * inv_d
            tmin_max = jnp.max(jnp.minimum(t1, t2), axis=-1)
            tmax_min = jnp.min(jnp.maximum(t1, t2), axis=-1)
            ray_hit = (tmax_min >= 0.0) & (tmin_max <= tmax_min) & (tmin_max <= best_t)
            if any_hit:
                ray_hit = ray_hit & (best_tri < 0)
            hit_any = jnp.any(ray_hit)

            tri_s = f2i(rec[8])
            leaf_c = f2i(rec[9])                   # 0 for internal nodes
            do_leaf = hit_any & (leaf_c > 0)

            # one contiguous fetch of the whole leaf block; the clamp can
            # shift `start` below tri_s near the array end, so lane validity
            # is membership in [tri_s, tri_s + leaf_c), not k < leaf_c
            start = jnp.clip(tri_s, 0, Tp - leaf_size)
            block = jax.lax.dynamic_slice(tri_rec, (start, 0), (leaf_size, 9))
            for k in range(leaf_size):
                v0 = block[k, 0:3]
                e1 = block[k, 3:6]
                e2 = block[k, 6:9]
                # dense Möller-Trumbore, one shared triangle vs P rays
                h = jnp.cross(d, e2[None, :])
                a = jnp.sum(e1[None, :] * h, axis=-1)
                f = 1.0 / a
                s = o - v0[None, :]
                u = f * jnp.sum(s * h, axis=-1)
                q = jnp.cross(s, e1[None, :])
                v = f * jnp.sum(d * q, axis=-1)
                t = f * jnp.sum(e2[None, :] * q, axis=-1)
                tri_ok = (
                    (jnp.abs(a) >= MIN_T)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t > MIN_T) & (t < best_t)
                )
                in_leaf = (start + k >= tri_s) & (start + k < tri_s + leaf_c)
                win = tri_ok & do_leaf & in_leaf
                if any_hit:
                    win = win & (best_tri < 0)
                best_t = jnp.where(win, t, best_t)
                best_tri = jnp.where(win, start + k, best_tri)

            nxt = jnp.where(hit_any, f2i(rec[6]), f2i(rec[7]))
            if any_hit:
                nxt = jnp.where(jnp.all(best_tri >= 0), -1, nxt)
            return nxt, best_t, best_tri, it + 1

        cursor0 = jnp.int32(0)
        _, best_t, best_tri, _ = jax.lax.while_loop(
            cond, body, (cursor0, best_t0, best_tri0, jnp.int32(0)))
        return best_t, best_tri

    best_t, best_tri = jax.vmap(per_packet)(o, d, inv_d, mt)
    best_t = best_t.reshape(N)
    best_tri = best_tri.reshape(N)
    hit = best_tri >= 0
    return jnp.where(hit, best_t, MISS_T), best_tri, hit


def tiled_pixel_order(width: int, height: int, tile: int = 32):
    """Pixel coordinates in tile-major order for packet coherence.

    Returns (px [n], py [n]) covering a tile-padded frame (n >= W*H, extra
    lanes clamp to the last pixel); callers scatter results back with
    fb[py, px] = rgb, so duplicate clamped lanes just overwrite identically.
    """
    tx = -(-width // tile)
    ty = -(-height // tile)
    gy, gx = np.mgrid[0:tile, 0:tile]
    px_list = []
    py_list = []
    for t_y in range(ty):
        for t_x in range(tx):
            px_list.append(np.minimum(t_x * tile + gx.reshape(-1), width - 1))
            py_list.append(np.minimum(t_y * tile + gy.reshape(-1), height - 1))
    return (np.concatenate(px_list).astype(np.int32),
            np.concatenate(py_list).astype(np.int32))
