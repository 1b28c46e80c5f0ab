"""Pallas TPU kernel: per-packet BVH traversal.

The XLA packet traversal (ops/packet_trace.py) vmaps one `while_loop` over
all packets in a dispatch, so every packet pays the LONGEST packet's path
(lockstep): measured on the 100k-triangle courtyard at 1080p, mean packet
path is ~380 threaded-link steps but max is ~1900 — ~5x wasted work. This
kernel runs the traversal as a Pallas grid with ONE PROGRAM PER PACKET, so
each packet retires after exactly its own path.

VMEM layout (the whole scene stays resident for the launch — constant
index_map → one HBM→VMEM load):

  * TPU VMEM rows are (sublane, 128-lane) tiles, so any table is charged 128
    lanes per row regardless of use. Data is therefore packed lane-dense:
    - `node rows`: 8 binary nodes per 128-lane f32 row, 16 lanes each
      (min.xyz, max.xyz, then hit/miss/tri_start/leaf_count links stored as
      exact small-int floats) — node i lives at row i>>3, lane group i&7;
    - `leaf rows`: ONE LEAF = ONE ROW — 8 slots x 16 lanes (v0, e1, e2,
      mat, 3 corner uvs) for textured scenes, or 12 slots x 10 lanes
      (no uv) for large untextured ones (TRI_FORMATS).
      models/bvh.py::align_leaves pads every leaf's range to a slot-count
      boundary with zero-edge degenerates, so a leaf test is one row read
      + slot-count dense Möller-Trumbore tests, no membership masks, no
      straddling.
  * rays are [B, 3, sub, 128]: component planes of (sub,128) f32 VPU tiles.

Each traversal step: one 16-lane dynamic-slice from the node table + dense
(sub,128) slab test; leaf steps run the 8 triangle tests inline (no
collect/flush — there is no lockstep to amortise within one packet's
program), tracking the winner's t/slot/normal/material/uv as vector carries
so closest-hit needs zero per-lane gathers anywhere.

Two kernels: `_kernel` follows the reference's left-first DFS exactly
(threaded hit/miss links — same visit order as the stack traversal in
/root/reference/shader/src/bvh.rs:40-85, identical winner records);
`_kernel_ordered` (default) visits the near child first with a per-packet
stack, which tightens best_t early and culls far subtrees — same closest
hit, winners may differ only on exact-t ties (degenerate shared-edge
geometry).

ops/trace.py falls back to the XLA path when the scene exceeds the VMEM
budget, the BVH is not leaf-aligned, or the batch is not packet-shaped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.bvh import Bvh
from ..intersect import MIN_T, MISS_T

_MIN_T = float(MIN_T)  # Python scalar: jnp consts can't be captured in kernels

SUB = 8          # sublanes per packet tile
LANES = 128      # lanes per packet tile
PACKET = SUB * LANES
GROUP = 16       # lanes per node record (8 nodes per 128-lane row)
ROW = 128 // GROUP  # node records per row
# Triangle slot formats: ONE LEAF = ONE 128-lane ROW either way.
#   textured   — 8 slots x 16 lanes (v0,e1,e2, mat, uv0,uv1,uv2)
#   untextured — 12 slots x 10 lanes (v0,e1,e2, mat): 1.5x more triangles
#                per VMEM byte (the Sponza-class headroom)
TRI_FORMATS = {8: 16, 12: 10}  # leaf_align/slots -> lanes per slot

# Mat+den lane packing (16-lane textured format only): lane 9 carries
# material id AND the triangle's uv density as mat * 2^14 + code, both
# exact small ints (mat < 1024 = texshade MAX_TABLE_MATERIALS, code < 2^14,
# sum <= 2^24 - 1 so the f32 lane is exact). The uv density
# sqrt(uv_area/world_area) is a PER-TRIANGLE constant; computing it in-kernel
# (rounds <= 4) let Mosaic's sqrt lowering (~2e-4 relative vs XLA:TPU's)
# flip nearest-mip LOD picks at iso-LOD boundaries between the Pallas
# kernels and their XLA twins (BENCH_r04 parity_deferred mean 1.35e-3).
# Pre-encoding it to a 14-bit float (8-bit exponent, 6-bit mantissa,
# round-to-nearest) makes every pipeline decode the identical value with
# integer ops + bitcast — exact in Mosaic, XLA:TPU, XLA:CPU and NumPy.
DEN_SCALE = 16384.0  # 2^14


def uv_density_code(tri_e1, tri_e2, tri_uv) -> jnp.ndarray:
    """Per-triangle mip uv density -> 14-bit float code [T] i32.

    density = sqrt(|uv cross| / |e1 x e2|) (texels per world unit at unit
    texture size); code = top 14 bits of the f32 (sign dropped — density is
    non-negative), round-to-nearest, clipped below the inf/nan boundary.
    Degenerate uv or geometry -> code 0 -> decodes to exactly 0.0."""
    cn = jnp.cross(tri_e1, tri_e2)
    n2 = jnp.maximum(jnp.sum(cn * cn, axis=1), 1e-30)
    cruv = ((tri_uv[:, 1, 0] - tri_uv[:, 0, 0])
            * (tri_uv[:, 2, 1] - tri_uv[:, 0, 1])
            - (tri_uv[:, 2, 0] - tri_uv[:, 0, 0])
            * (tri_uv[:, 1, 1] - tri_uv[:, 0, 1]))
    den = jnp.sqrt(jnp.abs(cruv) * jax.lax.rsqrt(n2)).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(den, jnp.int32)
    return jnp.clip((bits + 0x10000) >> 17, 0, (254 << 6) | 63)


def den_decode(code):
    """code (f32 exact-int or i32) -> density f32: bits = code << 17."""
    ci = code.astype(jnp.int32) if code.dtype != jnp.int32 else code
    return jax.lax.bitcast_convert_type(ci << 17, jnp.float32)

# VMEM budget for the resident tables. v5e has 128 MB of VMEM; the Mosaic
# default scoped limit is only 16 MB, so kernels pass an explicit
# vmem_limit_bytes sized to the tables + pipeline headroom.
VMEM_TABLE_BUDGET = 100 * 1024 * 1024
VMEM_HEADROOM = 16 * 1024 * 1024  # ray blocks, carries, double-buffering


def scene_vmem_bytes(num_nodes: int, num_tris: int, slots: int = 8) -> int:
    """Resident bytes: node table (8 nodes/row) + leaf rows (`slots`
    triangle slots/row), charged at full 128-lane f32 rows."""
    node_rows = -(-num_nodes // ROW)
    tri_rows = -(-num_tris // slots)
    return (node_rows + tri_rows) * 128 * 4


def pallas_scene_ok(bvh, num_tris: int, want_uv: bool = False) -> bool:
    """Static check: BVH leaf-aligned to a known slot format (uv needs the
    16-lane 8-slot format) and the packed tables fit the VMEM budget."""
    if bvh.leaf_align not in TRI_FORMATS:
        return False
    if want_uv and bvh.leaf_align != 8:
        return False
    if bvh.has_wide:
        # wide node table packed at 128 // (8*width) nodes per row —
        # ~3x smaller than binary at width 4, smaller still at width 8
        w = bvh.q_child.shape[1]
        node_rows = -(-bvh.q_child.shape[0] // (128 // (8 * w)))
        tri_rows = -(-num_tris // bvh.leaf_align)
        return (node_rows + tri_rows) * 512 <= VMEM_TABLE_BUDGET
    return (scene_vmem_bytes(bvh.num_nodes, num_tris, bvh.leaf_align)
            <= VMEM_TABLE_BUDGET)


STACK = 128  # per-packet DFS stack bound (reference uses 64, bvh.rs:35-38)


def pack_node_rows(bvh: Bvh, ordered: bool = True) -> jnp.ndarray:
    """Pack the BVH into lane-dense [R,128] f32 node rows (8 nodes/row,
    16 lanes each): min.xyz, max.xyz, then links/leaf info as exact
    small-int floats. Ordered layout stores (left, right, tri_start,
    leaf_count, code) with code = 2*split_axis + (left child centre lower
    on that axis); threaded stores (hit_link, miss_link, tri_start,
    leaf_count). Shared by every Pallas kernel that traverses."""
    nn = bvh.left.shape[0]
    nn_pad = (-nn) % ROW
    leaf_count = jnp.where(bvh.left < 0, bvh.tri_count, 0)
    asf = lambda a: a.astype(jnp.float32)[:, None]
    if ordered:
        lc = jnp.clip(bvh.left, 0, nn - 1)
        rc = jnp.clip(bvh.right, 0, nn - 1)
        diff = ((bvh.node_min[rc] + bvh.node_max[rc])
                - (bvh.node_min[lc] + bvh.node_max[lc]))      # [nn,3]
        axis = jnp.argmax(jnp.abs(diff), axis=1)
        left_lower = jnp.take_along_axis(diff, axis[:, None], 1)[:, 0] >= 0
        code = (axis * 2 + left_lower).astype(jnp.int32)
        zf = jnp.zeros((nn, GROUP - 11), jnp.float32)
        node = jnp.concatenate(
            [bvh.node_min, bvh.node_max, asf(bvh.left), asf(bvh.right),
             asf(bvh.tri_start), asf(leaf_count), asf(code), zf], axis=1)
    else:
        zf = jnp.zeros((nn, GROUP - 10), jnp.float32)
        node = jnp.concatenate(
            [bvh.node_min, bvh.node_max,
             asf(bvh.hit_link), asf(bvh.miss_link),
             asf(bvh.tri_start), asf(leaf_count), zf], axis=1)
    if nn_pad:
        node = jnp.concatenate(
            [node, jnp.zeros((nn_pad, GROUP), jnp.float32)])
    return node.reshape(-1, 128)


def pack_tri_rows(tri_v0, tri_e1, tri_e2, tri_mat=None, tri_uv=None,
                  slots: int = 8) -> jnp.ndarray:
    """Pack leaf-ordered expanded triangles into [Tp/slots,128] f32 leaf
    rows, slot j at lanes j*tg: v0.xyz, e1.xyz, e2.xyz, material (exact
    small-int f32)[, uv0, uv1, uv2 in the 16-lane format]."""
    Tp = tri_v0.shape[0]
    tg = TRI_FORMATS[slots]
    if tri_mat is None:
        tri_mat = jnp.zeros((Tp,), jnp.int32)
    matf = tri_mat.astype(jnp.float32)
    if tg == 16 and tri_uv is not None:
        # lane 9 = mat * 2^14 + den code (see DEN_SCALE note above)
        matf = matf * DEN_SCALE + uv_density_code(
            tri_e1, tri_e2, tri_uv).astype(jnp.float32)
    parts = [tri_v0, tri_e1, tri_e2, matf[:, None]]
    if tg == 16:
        parts.append(tri_uv.reshape(Tp, 6) if tri_uv is not None
                     else jnp.zeros((Tp, 6), jnp.float32))
        return jnp.concatenate(parts, axis=1).reshape(-1, 128)
    assert tri_uv is None, "uv tracking needs the 16-lane (8-slot) format"
    flat = jnp.concatenate(parts, axis=1).reshape(-1, slots * tg)
    return jnp.concatenate(
        [flat, jnp.zeros((flat.shape[0], 128 - slots * tg),
                         jnp.float32)], axis=1)


def _leaf_test(tri_ref, tri_s, ox, oy, oz, dx, dy, dz, carry, with_uv,
               any_hit=False, slots=8):
    """One leaf row (8 dense Möller-Trumbore tests) against the packet,
    tracking winner t/slot/normal/material (+uv and uv-density — texels per
    world unit, the mip-LOD driver — when the scene is textured) — shared
    by both kernels. any_hit mode records the first blocker and skips
    attribute tracking."""
    best_t, best_tri, bnx, bny, bnz, bm, buvx, buvy, bden = carry
    tg = TRI_FORMATS[slots]
    leaf_row = tri_s // slots
    # Leaves share rows (models/bvh.py::align_leaves first-fit packing), so
    # slot ids are row-based — and slots outside this leaf's range hold a
    # NEIGHBOUR leaf's real triangles, which the dense test covers
    # harmlessly (extra true candidates never break strict-< closest-hit
    # or any-hit).
    row_base = leaf_row * slots
    tr = tri_ref[pl.ds(leaf_row, 1), :]                # [1,128] f32
    for j in range(slots):
        g = j * tg
        v0x, v0y, v0z = tr[0, g + 0], tr[0, g + 1], tr[0, g + 2]
        e1x, e1y, e1z = tr[0, g + 3], tr[0, g + 4], tr[0, g + 5]
        e2x, e2y, e2z = tr[0, g + 6], tr[0, g + 7], tr[0, g + 8]
        # h = d x e2 (one shared triangle vs the packet's rays; degenerate
        # padding slots have zero edges → det 0 → no hit)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        # u <= 1 is implied by (v >= 0) & (u + v <= 1); dropping it saves
        # two VPU ops per slot with an identical accept set
        ok = ((jnp.abs(a) >= _MIN_T)
              & (u >= 0.0)
              & (v >= 0.0) & (u + v <= 1.0)
              & (t > _MIN_T) & (t < best_t))
        if any_hit:
            best_tri = jnp.where(ok, row_base + j, best_tri)
            continue
        # winner attributes are the shared triangle's own scalars —
        # geometric normal from e1 x e2 (scalar math), material id
        # (exact small-int float, lane 9), interpolated TEXCOORD (corner
        # uvs in lanes 10-15) — closest-hit needs ZERO per-lane gathers.
        # The carried normal is UNNORMALIZED: one rsqrt+3 muls per slot
        # deferred to a single _normalize_best at the end of the traversal.
        cnx = e1y * e2z - e1z * e2y
        cny = e1z * e2x - e1x * e2z
        cnz = e1x * e2y - e1y * e2x
        best_t = jnp.where(ok, t, best_t)
        best_tri = jnp.where(ok, row_base + j, best_tri)
        bnx = jnp.where(ok, cnx, bnx)
        bny = jnp.where(ok, cny, bny)
        bnz = jnp.where(ok, cnz, bnz)
        matden = tr[0, g + 9]
        if with_uv:
            # lane 9 = mat * 2^14 + den code (pack_tri_rows): split with
            # exact integer math — mat * 2^-14 is an exact product, floor
            # recovers the id. The winner carries the raw CODE; the single
            # vector bitcast decode happens once per ray in
            # _normalize_best (Mosaic only bitcasts vectors, and the loop
            # here works on per-slot scalars). No transcendental touches
            # the mip footprint (see DEN_SCALE).
            matf = jnp.floor(matden * (1.0 / DEN_SCALE))
            den = matden - matf * DEN_SCALE          # 14-bit float code
            bm = jnp.where(ok, matf, bm)
            w0 = 1.0 - u - v
            uvx = (tr[0, g + 10] * w0 + tr[0, g + 12] * u
                   + tr[0, g + 14] * v)
            uvy = (tr[0, g + 11] * w0 + tr[0, g + 13] * u
                   + tr[0, g + 15] * v)
            buvx = jnp.where(ok, uvx, buvx)
            buvy = jnp.where(ok, uvy, buvy)
            bden = jnp.where(ok, den, bden)
        else:
            bm = jnp.where(ok, matden, bm)
    return best_t, best_tri, bnx, bny, bnz, bm, buvx, buvy, bden


def _normalize_best(best, any_hit=False):
    """Normalize the winner's deferred (unnormalized) geometric normal —
    the per-slot `cn * rsqrt(cn.cn)` moved out of the leaf loop. Bit-exact
    vs the per-slot form (same cn, same formula). any_hit carries no
    attributes; miss lanes hold cn = 0 -> stay exactly 0."""
    if any_hit:
        return best
    t, tri, nx, ny, nz, m, uvx, uvy, den = best
    rl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    # den carries the winner's 14-bit uv-density CODE (see _leaf_test):
    # decode with one vector bitcast — miss lanes hold 0 -> exactly 0.0
    return t, tri, nx * rl, ny * rl, nz * rl, m, uvx, uvy, den_decode(den)


def _ordered_traverse(node_ref, tri_ref, stack_ref, ox, oy, oz, dx, dy, dz,
                      mt0, max_iters, with_uv, any_hit=False, slots=8):
    """Near-child-first DFS with a per-packet SMEM stack → best tuple
    (t, tri_slot, nx, ny, nz, mat_f32, uvx, uvy), all packet-tile vectors.

    Visiting the closer child first makes best_t tighten early, so the far
    subtree is often culled by the slab test's `tmin <= best_t` — the classic
    ordered-traversal win the reference's fixed left-first stack order
    (shader/src/bvh.rs:74-83) leaves on the table. `near` is picked from the
    packet's majority direction sign along the node's stored split axis
    (exact for coherent tiles; a heuristic, never a correctness issue, for
    incoherent packets). Winner selection keeps strict-< closest updates, so
    results differ from the left-first kernels only on exact-t ties."""
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    s0 = jnp.sum(dx) >= 0.0
    s1 = jnp.sum(dy) >= 0.0
    s2 = jnp.sum(dz) >= 0.0

    def step(state):
        cursor, sp, it, best = state
        best_t = best[0]
        row = cursor // ROW

        def pick(g):
            def f():
                b = node_ref[pl.ds(row, 1), g * GROUP:(g + 1) * GROUP]
                return (b[0, 0], b[0, 1], b[0, 2], b[0, 3], b[0, 4], b[0, 5],
                        b[0, 6], b[0, 7], b[0, 8], b[0, 9], b[0, 10])
            return f
        (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
         left_f, right_f, tri_f, leaf_f, code_f) = jax.lax.switch(
            cursor % ROW, [pick(g) for g in range(ROW)])
        tri_s = tri_f.astype(jnp.int32)
        leaf_c = leaf_f.astype(jnp.int32)
        code = code_f.astype(jnp.int32)

        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        # entry distance clamped to 0: hits can't occur at t < 0, so this
        # prunes strictly more (and lets max_t=0 dead lanes reject even
        # boxes that CONTAIN the ray origin, where tmin < 0). ce <= tmax
        # subsumes both tmax >= 0 and tmin <= tmax (two fewer VPU ops,
        # identical accept set incl. NaN rejects from d-component zeros).
        ce = jnp.maximum(tmin, 0.0)
        ray_hit = (ce <= tmax) & (ce < best_t)
        if any_hit:
            ray_hit = ray_hit & (best[1] < 0)  # blocked lanes stop traversing
        hit_any = jnp.any(ray_hit)

        is_leaf = leaf_c > 0
        best = jax.lax.cond(
            hit_any & is_leaf,
            lambda c: _leaf_test(tri_ref, tri_s, ox, oy, oz, dx, dy, dz, c,
                                 with_uv, any_hit, slots),
            lambda c: c, best)

        descend = hit_any & ~is_leaf
        axis = code >> 1
        left_lower = (code & 1) == 1
        dirpos = jnp.where(axis == 0, s0, jnp.where(axis == 1, s1, s2))
        near_is_left = dirpos == left_lower
        left_i = left_f.astype(jnp.int32)
        right_i = right_f.astype(jnp.int32)
        near = jnp.where(near_is_left, left_i, right_i)
        far = jnp.where(near_is_left, right_i, left_i)

        @pl.when(descend)
        def _():
            stack_ref[jnp.minimum(sp, STACK - 1)] = far

        # sp is clamped so a deeper-than-STACK tree cannot read out of
        # bounds (it would drop far subtrees — builders stay well under 128)
        sp2 = jnp.minimum(sp + descend.astype(jnp.int32), STACK)
        new_sp = jnp.where(descend, sp2, jnp.maximum(sp2 - 1, 0))
        popped = stack_ref[jnp.minimum(new_sp, STACK - 1)]
        cursor = jnp.where(descend, near,
                           jnp.where(sp2 > 0, popped, jnp.int32(-1)))
        return cursor, new_sp, it + 1, best

    def cond(state):
        cursor, _, it = state[0], state[1], state[2]
        go = (cursor >= 0) & (it < max_iters)
        if any_hit:
            go = go & ~jnp.all(state[3][1] >= 0)
        return go

    tile = mt0.shape
    zero = jnp.zeros(tile, jnp.float32)
    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
            (mt0, jnp.full(tile, -1, jnp.int32),
             zero, zero, zero, jnp.full(tile, -1.0, jnp.float32),
             zero, zero, zero))
    _, _, _, best = jax.lax.while_loop(cond, step, init)
    return _normalize_best(best, any_hit)


ROW4 = 4      # quad nodes per 128-lane row (packed layout, width 4)
GROUP4 = 32   # lanes per quad node record (width 4; width w uses 8*w)
# Full-row wide layout: ONE node per 128-lane row (trailing lanes unused).
# More VMEM bytes, but the per-step fetch becomes a single dynamic-row
# slice with STATIC lanes — no lax.switch per traversal step. Used
# whenever the full-row table still fits the VMEM budget
# (pallas_scene_ok gates).
FULL_ROW_QUAD_BUDGET = 48 * 1024 * 1024

# Scalar sorting networks for the order_mode-2 entry-distance child sort
# (comparator pairs; Batcher odd-even mergesort at width 8).
SORT_NETWORKS = {
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)),
}


def wide_width(bvh: Bvh) -> int:
    """Children per wide node (4 or 8) — static, from the overlay shape."""
    return int(bvh.q_child.shape[1]) if bvh.has_wide else 4


def quad_per_row(bvh: Bvh, num_tris: int) -> int:
    """Nodes per 128-lane row for the wide table: 1 (switch-free fetch)
    when the full-row table + leaf rows fit comfortably, else the densest
    packing (4 nodes/row at width 4, 2 at width 8)."""
    if not bvh.has_wide:
        return 4
    w = wide_width(bvh)
    Q = bvh.q_child.shape[0]
    tri_rows = -(-num_tris // max(bvh.leaf_align, 1))
    if (Q + tri_rows) * 512 <= FULL_ROW_QUAD_BUDGET:
        return 1
    return 128 // (8 * w)


def pack_node4_rows(bvh: Bvh, per_row: int = 4) -> jnp.ndarray:
    """Pack the wide overlay (models/bvh.py::collapse4, width w = 4 or 8)
    into lane-dense [R,128] f32 rows, `per_row` nodes x 8w lanes each: per
    child (min.xyz, max.xyz) (lanes 0..6w-1), child links (6w..7w-1), leaf
    counts (7w..8w-1, lane 7w also carrying the child-sort axis as
    +16*axis)."""
    Q, w = bvh.q_child.shape
    group = 8 * w
    lc = bvh.q_leafc.astype(jnp.float32)
    lc0 = lc[:, 0:1] + 16.0 * bvh.q_axis.astype(jnp.float32)[:, None]
    bounds = jnp.concatenate(
        [jnp.concatenate([bvh.q_min[:, c], bvh.q_max[:, c]], axis=1)
         for c in range(w)], axis=1)                        # [Q,6w]
    node = jnp.concatenate(
        [bounds, bvh.q_child.astype(jnp.float32),
         lc0, lc[:, 1:]], axis=1)                           # [Q,8w]
    pad = (-Q) % per_row
    if pad:
        filler = jnp.zeros((pad, group), jnp.float32)
        filler = filler.at[:, 6 * w:7 * w].set(-1.0)
        node = jnp.concatenate([node, filler])
    if per_row * group == 128:
        return node.reshape(-1, 128)
    grouped = node.reshape(-1, per_row * group)
    return jnp.pad(grouped, ((0, 0), (0, 128 - per_row * group)))


def _ordered_traverse4(node_ref, tri_ref, stack_ref, ox, oy, oz, dx, dy, dz,
                       mt0, max_iters, with_uv, any_hit=False, slots=8,
                       per_row=4, unroll=1, order_mode=0, width=4):
    """Wide (BVH4/BVH8) near-first DFS — the wide sibling of
    _ordered_traverse with the SAME carry/result tuple. One step fetches an
    8w-lane node record and slab-tests all `width` children, so the per-step
    scalar overhead (switch fetch, stack ops, loop bookkeeping) is paid once
    per `width` boxes; the visit order walks the pre-sorted children forward
    or backward by the packet's majority sign along the stored sort axis.
    per_row=1 (the full-row layout) trades node-table VMEM for a
    switch-free fetch."""
    group = 8 * width
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    s0 = jnp.sum(dx) >= 0.0
    s1 = jnp.sum(dy) >= 0.0
    s2 = jnp.sum(dz) >= 0.0

    def step(state):
        cursor, sp, it, best = state
        best_t = best[0]
        # unrolled bodies may run past retirement: dead steps (cursor < 0)
        # read node 0 harmlessly and are masked out of every update below
        live = cursor >= 0
        cursor = jnp.maximum(cursor, 0)

        if per_row == 1:
            b = node_ref[pl.ds(cursor, 1), 0:group]
            vals = tuple(b[0, j] for j in range(group))
        else:
            row = cursor // per_row

            def pick(g):
                def f():
                    b = node_ref[pl.ds(row, 1), g * group:(g + 1) * group]
                    return tuple(b[0, j] for j in range(group))
                return f
            vals = jax.lax.switch(cursor % per_row,
                                  [pick(g) for g in range(per_row)])

        childf = [vals[6 * width + c] for c in range(width)]
        axis = jnp.floor(vals[7 * width] * (1.0 / 16.0))
        lcs = ([vals[7 * width] - 16.0 * axis]
               + [vals[7 * width + c] for c in range(1, width)])
        fwd = jnp.where(axis == 0.0, s0, jnp.where(axis == 1.0, s1, s2))

        rhs, ces = [], []
        for c in range(width):
            t1x = (vals[6 * c + 0] - ox) * ix
            t1y = (vals[6 * c + 1] - oy) * iy
            t1z = (vals[6 * c + 2] - oz) * iz
            t2x = (vals[6 * c + 3] - ox) * ix
            t2y = (vals[6 * c + 4] - oy) * iy
            t2z = (vals[6 * c + 5] - oz) * iz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            # ce <= tmax subsumes tmax >= 0 and tmin <= tmax (see
            # _ordered_traverse) — two fewer VPU ops per child
            ce = jnp.maximum(tmin, 0.0)
            rh = (ce <= tmax) & (ce < best_t)
            if any_hit:
                rh = rh & (best[1] < 0)
            rhs.append(rh)
            ces.append(ce)

        if order_mode == 2:
            # true per-packet entry ordering: each child's scalar key is the
            # packet-min clamped entry distance over lanes that hit it (BIG
            # when no lane does). The min-reduction SUBSUMES the any-
            # reduction (any = key < BIG), and a sorting network on the
            # `width` (key, child, leafc) scalar tuples runs on the scalar
            # core. Chip A/B: majority-sign ordering is 2.2x better than
            # static order at bounce depth 2 — entry ordering is the exact
            # version of that heuristic.
            BIG = jnp.float32(3.0e38)
            items = []
            for c in range(width):
                key_c = jnp.min(jnp.where(rhs[c], ces[c], BIG))
                items.append((key_c, childf[c], lcs[c]))
            for i, j in SORT_NETWORKS[width]:
                swap = items[j][0] < items[i][0]
                a, b = items[i], items[j]
                items[i] = tuple(jnp.where(swap, y, x) for x, y in zip(a, b))
                items[j] = tuple(jnp.where(swap, x, y) for x, y in zip(a, b))
            hits = [(items[k][0] < BIG) & live for k in range(width)]
            sel_ch = lambda k: items[k][1]
            sel_lc = lambda k: items[k][2]
        else:
            # any-reductions packed in pairs: per-lane counts of children
            # (2c, 2c+1) share one int32 sum (tile <= 8192 lanes < 2^14, so
            # a 14-bit shift keeps both counts exact); the scalar decode is
            # scalar-core work, off the VPU critical path
            anys = []
            for c in range(0, width, 2):
                s = jnp.sum(rhs[c].astype(jnp.int32)
                            + (rhs[c + 1].astype(jnp.int32) << 14))
                anys.append(((s & 16383) > 0) & live)
                anys.append(((s >> 14) > 0) & live)
            # near-order view k=0..width-1 (forward or reversed children)
            if order_mode == 1:
                sel = lambda arr, k: arr[k]
            else:
                sel = lambda arr, k: jnp.where(fwd, arr[k],
                                               arr[width - 1 - k])
            hits = [sel(anys, k) for k in range(width)]
            sel_ch = lambda k: sel(childf, k)
            sel_lc = lambda k: sel(lcs, k)

        wants, pushes = [], []
        seen = None
        for k in range(width):
            hit_k = hits[k]
            lc_k = sel_lc(k)
            ch_k = sel_ch(k)
            is_leaf = lc_k > 0.0
            tri_s = ch_k.astype(jnp.int32)
            best = jax.lax.cond(
                hit_k & is_leaf,
                lambda c, t=tri_s: _leaf_test(tri_ref, t, ox, oy, oz,
                                              dx, dy, dz, c, with_uv,
                                              any_hit, slots),
                lambda c: c, best)
            w = hit_k & (lc_k == 0.0) & (ch_k >= 0.0)
            wants.append(w)
            # push only if a NEARER internal child is already descending
            pushes.append(w & seen if seen is not None else w & False)
            seen = w if seen is None else (seen | w)

        descend = wants[0]
        for k in range(1, width):
            descend = descend | wants[k]
        cnext = jnp.int32(-1)
        for k in reversed(range(width)):
            cnext = jnp.where(wants[k], sel_ch(k).astype(jnp.int32),
                              cnext)

        spc = sp
        for k in reversed(range(1, width)):  # far-to-near: nearest pops first
            @pl.when(pushes[k])
            def _(k=k, spc=spc):
                stack_ref[jnp.minimum(spc, STACK - 1)] = \
                    sel_ch(k).astype(jnp.int32)
            spc = spc + pushes[k].astype(jnp.int32)

        sp2 = jnp.minimum(spc, STACK)
        new_sp = jnp.where(descend, sp2, jnp.maximum(sp2 - 1, 0))
        popped = stack_ref[jnp.minimum(new_sp, STACK - 1)]
        nxt = jnp.where(descend, cnext,
                        jnp.where(sp2 > 0, popped, jnp.int32(-1)))
        cursor = jnp.where(live, nxt, jnp.int32(-1))
        new_sp = jnp.where(live, new_sp, sp)
        return cursor, new_sp, it + 1, best

    def body(state):
        for _ in range(unroll):
            state = step(state)
        return state

    def cond(state):
        cursor, _, it = state[0], state[1], state[2]
        go = (cursor >= 0) & (it < max_iters)
        if any_hit:
            go = go & ~jnp.all(state[3][1] >= 0)
        return go

    tile = mt0.shape
    zero = jnp.zeros(tile, jnp.float32)
    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
            (mt0, jnp.full(tile, -1, jnp.int32),
             zero, zero, zero, jnp.full(tile, -1.0, jnp.float32),
             zero, zero, zero))
    _, _, _, best = jax.lax.while_loop(cond, body, init)
    return _normalize_best(best, any_hit)


def traverse_best(node_ref, tri_ref, stack_ref, ox, oy, oz, dx, dy, dz,
                  mt0, *, max_iters, with_uv, any_hit=False, slots=8,
                  wide=False, per_row=4, unroll=1, order_mode=0, width=4):
    """Closest/any-hit traversal over the packed node table — dispatches to
    the wide kernel when the table was packed wide (pack_node4_rows)."""
    if wide:
        return _ordered_traverse4(node_ref, tri_ref, stack_ref, ox, oy, oz,
                                  dx, dy, dz, mt0, max_iters, with_uv,
                                  any_hit, slots, per_row, unroll,
                                  order_mode=order_mode, width=width)
    return _ordered_traverse(node_ref, tri_ref, stack_ref, ox, oy, oz,
                             dx, dy, dz, mt0, max_iters, with_uv, any_hit,
                             slots)


def _kernel_ordered(node_ref, tri_ref, o_ref, d_ref, mt_ref,
                    t_ref, tri_out_ref, n_ref, m_ref, uv_ref, stack_ref,
                    *, max_iters, with_uv, any_hit=False, slots=8,
                    wide=False, per_row=4, width=4):
    ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
    dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    best = traverse_best(node_ref, tri_ref, stack_ref,
                         ox, oy, oz, dx, dy, dz, mt_ref[0],
                         max_iters=max_iters, with_uv=with_uv,
                         any_hit=any_hit, slots=slots, wide=wide,
                         per_row=per_row, width=width)
    t_ref[0] = best[0]
    tri_out_ref[0] = best[1]
    n_ref[0, 0] = best[2]
    n_ref[0, 1] = best[3]
    n_ref[0, 2] = best[4]
    m_ref[0] = best[5]
    uv_ref[0, 0] = best[6]
    uv_ref[0, 1] = best[7]


def _kernel(node_ref, tri_ref, o_ref, d_ref, mt_ref,
            t_ref, tri_out_ref, n_ref, m_ref, uv_ref, *, max_iters, with_uv,
            any_hit=False, slots=8):
    ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]        # [8,128] each
    dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    def step(state):
        cursor, it, best = state
        best_t = best[0]
        row = cursor // ROW
        # Mosaic requires static lane offsets (dynamic starts must be
        # 128-multiples), so the 16-lane group is picked with an 8-way
        # switch over static slices. Slices stay 2D — 1D vector values
        # crash Mosaic's layout inference. Links/leaf info are stored as
        # exact small-int f32 values (< 2^24) so the whole record is one
        # slice of one table.
        def pick(g):
            def f():
                b = node_ref[pl.ds(row, 1), g * GROUP:(g + 1) * GROUP]
                return (b[0, 0], b[0, 1], b[0, 2], b[0, 3], b[0, 4], b[0, 5],
                        b[0, 6], b[0, 7], b[0, 8], b[0, 9])
            return f
        (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
         hit_f, miss_f, tri_f, leaf_f) = jax.lax.switch(
            cursor % ROW, [pick(g) for g in range(ROW)])
        hit_l = hit_f.astype(jnp.int32)
        miss_l = miss_f.astype(jnp.int32)
        tri_s = tri_f.astype(jnp.int32)
        leaf_c = leaf_f.astype(jnp.int32)

        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        # entry distance clamped to 0: hits can't occur at t < 0, so this
        # prunes strictly more (and lets max_t=0 dead lanes reject even
        # boxes that CONTAIN the ray origin, where tmin < 0); ce <= tmax
        # subsumes tmax >= 0 and tmin <= tmax (see _ordered_traverse)
        ce = jnp.maximum(tmin, 0.0)
        ray_hit = (ce <= tmax) & (ce < best_t)
        if any_hit:
            ray_hit = ray_hit & (best[1] < 0)  # blocked lanes stop traversing
        hit_any = jnp.any(ray_hit)

        is_leaf_hit = hit_any & (leaf_c > 0)
        best = jax.lax.cond(
            is_leaf_hit,
            lambda c: _leaf_test(tri_ref, tri_s, ox, oy, oz, dx, dy, dz, c,
                                 with_uv, any_hit, slots),
            lambda c: c, best)

        cursor = jnp.where(hit_any, hit_l, miss_l)
        return cursor, it + 1, best

    def cond(state):
        cursor, it = state[0], state[1]
        go = (cursor >= 0) & (it < max_iters)
        if any_hit:
            go = go & ~jnp.all(state[2][1] >= 0)
        return go

    tile = mt_ref.shape[1:]                                     # (sub, 128)
    zero = jnp.zeros(tile, jnp.float32)
    init = (jnp.int32(0), jnp.int32(0),
            (mt_ref[0],                                         # best_t
             jnp.full(tile, -1, jnp.int32),                     # best_tri
             zero, zero, zero,                                  # normal
             jnp.full(tile, -1.0, jnp.float32),                 # material
             zero, zero, zero))                                 # uv, density
    _, _, best = jax.lax.while_loop(cond, step, init)
    best = _normalize_best(best, any_hit)

    t_ref[0] = best[0]
    tri_out_ref[0] = best[1]
    n_ref[0, 0] = best[2]
    n_ref[0, 1] = best[3]
    n_ref[0, 2] = best[4]
    m_ref[0] = best[5]
    uv_ref[0, 0] = best[6]
    uv_ref[0, 1] = best[7]


@partial(jax.jit, static_argnames=("interpret", "packet_size", "ordered",
                                   "any_hit"))
def pallas_packet_traverse(
    bvh: Bvh,
    tri_v0: jnp.ndarray,
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    max_t: jnp.ndarray,
    tri_mat: jnp.ndarray | None = None,
    tri_uv: jnp.ndarray | None = None,
    interpret: bool = False,
    packet_size: int = PACKET,
    ordered: bool = True,
    any_hit: bool = False,
):
    """Closest-hit for N rays (N a multiple of 1024)
    → (t, tri, hit, normal [N,3], mat [N] i32, uv [N,2]).

    Requires bvh.leaf_align == 8 (models/bvh.py::align_leaves) and the
    leaf-aligned expanded triangle arrays. tri is the slot id of the winner
    (-1 miss); normal is its geometric unit normal, mat its material id, uv
    the barycentric-interpolated TEXCOORD — all extracted in-kernel, zero
    gathers.
    """
    N = orig.shape[0]
    sub = packet_size // LANES
    assert packet_size % LANES == 0 and sub >= 8, "packet must be k*128, k>=8"
    assert N % packet_size == 0, "ray count must divide into packets"
    slots = bvh.leaf_align
    assert slots in TRI_FORMATS, "pallas traversal needs a leaf-aligned BVH"
    tg = TRI_FORMATS[slots]
    assert not (tri_uv is not None and tg < 16), \
        "uv tracking needs the 16-lane (8-slot) leaf format"
    B = N // packet_size
    Tp = tri_v0.shape[0]
    nn = bvh.left.shape[0]
    wide = ordered and bvh.has_wide
    qpr = quad_per_row(bvh, Tp) if wide else 4
    node_rows = (pack_node4_rows(bvh, per_row=qpr) if wide
                 else pack_node_rows(bvh, ordered=ordered))
    tri_rows = pack_tri_rows(tri_v0, tri_e1, tri_e2, tri_mat, tri_uv, slots)

    o = orig.reshape(B, sub, LANES, 3).transpose(0, 3, 1, 2)
    d = dirn.reshape(B, sub, LANES, 3).transpose(0, 3, 1, 2)
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (N,))
    mt = mt.reshape(B, sub, LANES)

    out_shape = (
        jax.ShapeDtypeStruct((B, sub, LANES), jnp.float32),   # t
        jax.ShapeDtypeStruct((B, sub, LANES), jnp.int32),     # tri slot
        jax.ShapeDtypeStruct((B, 3, sub, LANES), jnp.float32),  # normal
        jax.ShapeDtypeStruct((B, sub, LANES), jnp.float32),   # material
        jax.ShapeDtypeStruct((B, 2, sub, LANES), jnp.float32),  # uv
    )
    resident = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    per_packet = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    kernel = (partial(_kernel_ordered, max_iters=nn + 4,
                      with_uv=tri_uv is not None, any_hit=any_hit,
                      slots=slots, wide=wide, per_row=qpr,
                      width=wide_width(bvh) if wide else 4)
              if ordered else
              partial(_kernel, max_iters=nn + 4,
                      with_uv=tri_uv is not None, any_hit=any_hit,
                      slots=slots))
    t, tri_id, n, m, uvo = pl.pallas_call(
        kernel,
        grid=(B,),
        scratch_shapes=([pltpu.SMEM((STACK,), jnp.int32)] if ordered else []),
        in_specs=[
            resident(node_rows.shape),
            resident(tri_rows.shape),
            per_packet((1, 3, sub, LANES)),
            per_packet((1, 3, sub, LANES)),
            per_packet((1, sub, LANES)),
        ],
        out_specs=(
            per_packet((1, sub, LANES)),
            per_packet((1, sub, LANES)),
            per_packet((1, 3, sub, LANES)),
            per_packet((1, sub, LANES)),
            per_packet((1, 2, sub, LANES)),
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(node_rows.shape[0] + tri_rows.shape[0]) * 512
            + VMEM_HEADROOM),
        interpret=interpret,
    )(node_rows, tri_rows, o, d, mt)

    t = t.reshape(N)
    tri_id = tri_id.reshape(N)
    hit = tri_id >= 0
    normal = n.transpose(0, 2, 3, 1).reshape(N, 3)
    uv = uvo.transpose(0, 2, 3, 1).reshape(N, 2)
    mat = jnp.where(hit, m.reshape(N).astype(jnp.int32), -1)
    return (jnp.where(hit, t, MISS_T), tri_id, hit,
            jnp.where(hit[:, None], normal, 0.0), mat,
            jnp.where(hit[:, None], uv, 0.0))
