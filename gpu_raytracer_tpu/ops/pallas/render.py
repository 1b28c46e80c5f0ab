"""Fused primary-render Pallas kernel: raygen → spheres → BVH → shade.

The chunked XLA pipeline materialises a full Hit record (t, point, normal,
material, uv — ~15 arrays of 2M rays) between trace and shade, then streams
it back through ~50 elementwise passes of direct lighting; measured at 1080p
that plumbing costs ~28 ms against ~8 ms of actual traversal. This kernel is
the reference's megakernel idea (`main_cs`, /root/reference/shader/src/
lib.rs:25-89) rebuilt for TPU: one program per ray packet computes camera
rays from pixel coordinates, runs the exhaustive sphere pass and the ordered
BVH traversal (ops/pallas/traverse.py), shades — ambient + punctual lights +
dispersion, the reference's exact formulas (shader/src/lighting.rs,
material.rs, lib.rs:299-349) — and writes only the final RGB. Per-ray HBM
traffic is 8 bytes in (pixel coords), 12 out.

Per-lane material parameters come from a static loop over the material table
(mask-select against the winner's id — no gathers); lights and spheres are
static loops over small VMEM tables. Shadow rays (a reference gap we fill)
re-run the traversal in any-hit mode per light inside the same program.

Falls back (engine/renderer.py) whenever a static precondition fails:
textured scene, material/light/sphere counts over the loop bounds, VMEM
budget, non-TPU backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.scene import Scene
from ..f16 import unpack_f16_high, unpack_f16_low
from .traverse import (
    GROUP, LANES, ROW, STACK, TRI_FORMATS, VMEM_HEADROOM,
    _ordered_traverse, pallas_scene_ok, scene_vmem_bytes,
)

_MIN_T = 1e-5
_MAX_SEED = 3.4028235e38 - 2.0   # f32::MAX - 2.0 (shader lib.rs:183)
MAX_MATERIALS = 32               # static mask-select loop bound
MAX_LIGHTS = 8
MAX_SPHERES = 8

# Cauchy-motivated dispersion offsets (shader/src/material.rs:48-53) and the
# transmitted base colour (lib.rs:330).
_DISPERSION = (-0.018, 0.0, 0.035)
_TRANS_BASE = (0.2, 0.2, 0.3)


def fused_render_eligible(scene: Scene) -> bool:
    """Static preconditions for the fused kernel (checked at trace time)."""
    return (scene.textures.data_u32.shape[0] <= 1
            and 1 <= scene.materials.count <= MAX_MATERIALS
            and scene.lights.count <= MAX_LIGHTS
            and scene.spheres.count <= MAX_SPHERES
            and pallas_scene_ok(scene.bvh, scene.tri_v0.shape[0]))


def _max0(x):
    return jnp.where(x > 0.0, x, 0.0)  # Rust f32::max(0.0): NaN -> 0


def _kernel(node_ref, tri_ref, cam_ref, mat_ref, light_ref, sph_ref,
            px_ref, py_ref, rgb_ref, stack_ref, *,
            max_iters, width, height, n_mats, n_lights, n_spheres,
            shadows, sky, slots):
    # ---- camera rays (ray.rs:22-53; pixel centres, unnormalised basis) ----
    cam = cam_ref[0:1, :]
    posx, posy, posz = cam[0, 0], cam[0, 1], cam[0, 2]
    fwx, fwy, fwz = cam[0, 3], cam[0, 4], cam[0, 5]
    upx, upy, upz = cam[0, 6], cam[0, 7], cam[0, 8]
    fov_scale = cam[0, 9]
    rx = fwy * upz - fwz * upy          # right = forward x up
    ry = fwz * upx - fwx * upz
    rz = fwx * upy - fwy * upx
    tx = ry * fwz - rz * fwy            # true_up = right x forward
    ty = rz * fwx - rx * fwz
    tz = rx * fwy - ry * fwx

    u = (px_ref[0].astype(jnp.float32) + 0.5) * (1.0 / width)
    v = (py_ref[0].astype(jnp.float32) + 0.5) * (1.0 / height)
    cxs = (u * 2.0 - 1.0) * (width / height) * fov_scale
    cys = (1.0 - v * 2.0) * fov_scale
    dx = fwx + rx * cxs + tx * cys
    dy = fwy + ry * cxs + ty * cys
    dz = fwz + rz * cxs + tz * cys
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
    ox = jnp.broadcast_to(posx, dx.shape)
    oy = jnp.broadcast_to(posy, dx.shape)
    oz = jnp.broadcast_to(posz, dx.shape)

    # ---- spheres, exhaustive with strict < (lib.rs:252-269) ----
    tile = dx.shape
    sph_t = jnp.full(tile, jnp.float32(_MAX_SEED))
    sph_m = jnp.full(tile, -1.0, jnp.float32)
    scx = jnp.zeros(tile, jnp.float32)
    scy = jnp.zeros(tile, jnp.float32)
    scz = jnp.zeros(tile, jnp.float32)
    for k in range(n_spheres):
        row = sph_ref[k:k + 1, :]
        cx_, cy_, cz_, rad, mid = (row[0, 0], row[0, 1], row[0, 2],
                                   row[0, 3], row[0, 4])
        ocx, ocy, ocz = ox - cx_, oy - cy_, oz - cz_
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 > _MIN_T, t1, t2)
        ok = (disc >= 0.0) & (t > _MIN_T) & (t < sph_t)
        sph_t = jnp.where(ok, t, sph_t)
        sph_m = jnp.where(ok, mid, sph_m)
        scx = jnp.where(ok, cx_, scx)
        scy = jnp.where(ok, cy_, scy)
        scz = jnp.where(ok, cz_, scz)
    sph_any = sph_m >= 0.0

    # ---- triangles: ordered BVH traversal pruned at the sphere t
    # (strict < keeps the sphere on exact ties, lib.rs:183-248) ----
    best = _ordered_traverse(node_ref, tri_ref, stack_ref,
                             ox, oy, oz, dx, dy, dz, sph_t,
                             max_iters, with_uv=False, slots=slots)
    tri_t, tri_id = best[0], best[1]
    use_tri = tri_id >= 0
    hit = use_tri | sph_any

    t = jnp.where(use_tri, tri_t, sph_t)
    px_hit = ox + dx * t
    py_hit = oy + dy * t
    pz_hit = oz + dz * t
    # normals: triangle carries its own; sphere normal = normalize(p - c)
    snx = px_hit - scx
    sny = py_hit - scy
    snz = pz_hit - scz
    snl = jax.lax.rsqrt(jnp.maximum(snx * snx + sny * sny + snz * snz, 1e-30))
    nx = jnp.where(use_tri, best[2], snx * snl)
    ny = jnp.where(use_tri, best[3], sny * snl)
    nz = jnp.where(use_tri, best[4], snz * snl)
    mat_id = jnp.where(use_tri, best[5], sph_m)

    # ---- per-lane material params: static mask-select over the table ----
    alb_r = jnp.zeros(tile, jnp.float32)
    alb_g = jnp.zeros(tile, jnp.float32)
    alb_b = jnp.zeros(tile, jnp.float32)
    emi_r = jnp.zeros(tile, jnp.float32)
    emi_g = jnp.zeros(tile, jnp.float32)
    emi_b = jnp.zeros(tile, jnp.float32)
    metal = jnp.zeros(tile, jnp.float32)
    iorv = jnp.ones(tile, jnp.float32)
    trans = jnp.zeros(tile, jnp.float32)
    for m in range(n_mats):
        row = mat_ref[m:m + 1, :]
        sel = mat_id == float(m)
        alb_r = jnp.where(sel, row[0, 0], alb_r)
        alb_g = jnp.where(sel, row[0, 1], alb_g)
        alb_b = jnp.where(sel, row[0, 2], alb_b)
        emi_r = jnp.where(sel, row[0, 3], emi_r)
        emi_g = jnp.where(sel, row[0, 4], emi_g)
        emi_b = jnp.where(sel, row[0, 5], emi_b)
        metal = jnp.where(sel, row[0, 6], metal)
        iorv = jnp.where(sel, row[0, 7], iorv)
        trans = jnp.where(sel, row[0, 8], trans)

    # ---- direct lighting (lighting.rs:20-139) ----
    tot_r = alb_r * 0.1
    tot_g = alb_g * 0.1
    tot_b = alb_b * 0.1
    is_metal = (metal > 0.5).astype(jnp.float32)
    brdf = is_metal * 0.5 + (1.0 - is_metal) * (1.0 / 3.14159265358979)
    for li in range(n_lights):
        row = light_ref[li:li + 1, :]
        lpx, lpy, lpz = row[0, 0], row[0, 1], row[0, 2]
        ltype = row[0, 3]
        lcr, lcg, lcb = row[0, 4], row[0, 5], row[0, 6]
        lint = row[0, 7]
        ldx, ldy, ldz = row[0, 8], row[0, 9], row[0, 10]  # pre-normalised

        dir_dot = -(nx * ldx + ny * ldy + nz * ldz)
        dir_I = _max0(dir_dot) * lint

        tlx, tly, tlz = lpx - px_hit, lpy - py_hit, lpz - pz_hit
        dist2 = tlx * tlx + tly * tly + tlz * tlz
        dist = jnp.sqrt(dist2)
        inv_dist = 1.0 / dist
        plx, ply, plz = tlx * inv_dist, tly * inv_dist, tlz * inv_dist
        atten = (1.0 / (1.0 + dist2 * 0.01))
        # f16 round-trip (lighting.rs:125-127) via RTNE bit-twiddling —
        # Mosaic can't lower f32<->f16 converts. Exact for f16-normal values
        # (attenuation >= 2^-14, i.e. lights within ~400 units); below that
        # true f16 goes subnormal and this keeps slightly more precision.
        ui = jax.lax.bitcast_convert_type(atten, jnp.int32)
        ui = (ui + (0x0FFF + ((ui >> 13) & 1))) & ~0x1FFF
        atten = jax.lax.bitcast_convert_type(ui, jnp.float32)
        pdot = nx * plx + ny * ply + nz * plz
        point_I = _max0(pdot) * lint * atten
        sdot = -(ldx * plx + ldy * ply + ldz * plz)
        spot_I = point_I * _max0(sdot)

        I = (dir_I * (ltype == 0.0) + point_I * (ltype == 1.0)
             + spot_I * (ltype == 2.0))

        if shadows:
            # shadow ray from the offset hit point toward the light; any-hit
            # traversal in the same program (a reference gap — its lighting
            # never occludes, SURVEY.md §2.2)
            sdx = jnp.where(ltype == 0.0, -ldx, plx)
            sdy = jnp.where(ltype == 0.0, -ldy, ply)
            sdz = jnp.where(ltype == 0.0, -ldz, plz)
            smax = jnp.where(ltype == 0.0, jnp.float32(3.0e38), dist - 1e-3)
            smax = jnp.where(hit & (I > 0.0), smax, 0.0)
            sb = _ordered_traverse(
                node_ref, tri_ref, stack_ref,
                px_hit + nx * 1e-3, py_hit + ny * 1e-3, pz_hit + nz * 1e-3,
                sdx, sdy, sdz, smax, max_iters, with_uv=False, any_hit=True,
                slots=slots)
            blocked = (sb[1] >= 0).astype(jnp.float32)
            # sphere occluders (tiny count, test directly)
            for k in range(n_spheres):
                srow = sph_ref[k:k + 1, :]
                kcx, kcy, kcz, rad = (srow[0, 0], srow[0, 1], srow[0, 2],
                                      srow[0, 3])
                ocx = px_hit + nx * 1e-3 - kcx
                ocy = py_hit + ny * 1e-3 - kcy
                ocz = pz_hit + nz * 1e-3 - kcz
                a = sdx * sdx + sdy * sdy + sdz * sdz
                b = 2.0 * (ocx * sdx + ocy * sdy + ocz * sdz)
                c = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-b - sq) / (2.0 * a)
                t2 = (-b + sq) / (2.0 * a)
                st = jnp.where(t1 > _MIN_T, t1, t2)
                occ = (disc >= 0.0) & (st > _MIN_T) & (st < smax)
                blocked = jnp.maximum(blocked, occ.astype(jnp.float32))
            I = I * (1.0 - blocked)

        gate = (I > 0.0).astype(jnp.float32)
        w = brdf * I * gate
        tot_r = tot_r + alb_r * w * lcr
        tot_g = tot_g + alb_g * w * lcg
        tot_b = tot_b + alb_b * w * lcb

    tot_r = tot_r + emi_r
    tot_g = tot_g + emi_g
    tot_b = tot_b + emi_b

    # ---- transmission blend with per-channel dispersion (lib.rs:322-337) ----
    trans_c = jnp.clip(trans, 0.0, 1.0)
    inv_den = 1.0 / (iorv - 1.0)
    has_trans = trans_c > 0.0
    out = []
    for c, (disp_off, tb) in enumerate(zip(_DISPERSION, _TRANS_BASE)):
        dispf = (iorv + disp_off - 1.0) * inv_den
        transmitted = tb * dispf
        tot = (tot_r, tot_g, tot_b)[c]
        blended = tot * (1.0 - trans_c) + transmitted * trans_c
        out.append(jnp.where(has_trans, blended, tot))

    # invalid material → magenta (lib.rs:307-309); miss → sky
    invalid = hit & ((mat_id < 0.0) | (mat_id >= float(n_mats)))
    magenta = (1.0, 0.0, 1.0)
    for c in range(3):
        col = jnp.where(invalid, magenta[c], out[c])
        rgb_ref[0, c] = jnp.where(hit, col, jnp.float32(sky[c]))


@partial(jax.jit, static_argnames=("width", "height", "shadows", "sky",
                                   "packet_size", "interpret"))
def pallas_render_primary(
    scene: Scene,
    px: jnp.ndarray,
    py: jnp.ndarray,
    width: int,
    height: int,
    shadows: bool = False,
    sky: tuple = (0.0, 0.0, 0.0),
    packet_size: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-frame fused render → RGB [N,3] in the given ray order.

    px/py: i32 pixel coords, N a multiple of packet_size (tile-ordered for
    packet coherence)."""
    N = px.shape[0]
    sub = packet_size // LANES
    assert N % packet_size == 0
    B = N // packet_size
    nn = scene.bvh.left.shape[0]
    Tp = scene.tri_v0.shape[0]
    nn_pad = (-nn) % ROW

    # node/tri tables: identical layout to pallas_packet_traverse(ordered)
    bvh = scene.bvh
    leaf_count = jnp.where(bvh.left < 0, bvh.tri_count, 0)
    asf = lambda a: a.astype(jnp.float32)[:, None]
    lc = jnp.clip(bvh.left, 0, nn - 1)
    rc = jnp.clip(bvh.right, 0, nn - 1)
    diff = ((bvh.node_min[rc] + bvh.node_max[rc])
            - (bvh.node_min[lc] + bvh.node_max[lc]))
    axis = jnp.argmax(jnp.abs(diff), axis=1)
    left_lower = jnp.take_along_axis(diff, axis[:, None], 1)[:, 0] >= 0
    code = (axis * 2 + left_lower).astype(jnp.int32)
    zf = jnp.zeros((nn, GROUP - 11), jnp.float32)
    node = jnp.concatenate(
        [bvh.node_min, bvh.node_max, asf(bvh.left), asf(bvh.right),
         asf(bvh.tri_start), asf(leaf_count), asf(code), zf], axis=1)
    if nn_pad:
        node = jnp.concatenate(
            [node, jnp.zeros((nn_pad, GROUP), jnp.float32)])
    node_rows = node.reshape(-1, 128)
    slots = scene.bvh.leaf_align
    tg = TRI_FORMATS[slots]
    parts = [scene.tri_v0, scene.tri_e1, scene.tri_e2,
             scene.tri_mat.astype(jnp.float32)[:, None]]
    if tg == 16:
        parts.append(jnp.zeros((Tp, 6), jnp.float32))
        tri_rows = jnp.concatenate(parts, axis=1).reshape(-1, 128)
    else:
        flat = jnp.concatenate(parts, axis=1).reshape(-1, slots * tg)
        tri_rows = jnp.concatenate(
            [flat, jnp.zeros((flat.shape[0], 128 - slots * tg),
                             jnp.float32)], axis=1)

    # camera row: pos, forward, up, fov_scale
    cam = scene.camera
    fov_scale = jnp.tan(cam.fov * jnp.float32(0.5) * jnp.pi / 180.0)
    cam_row = jnp.concatenate(
        [cam.position, cam.direction, cam.up, fov_scale[None],
         jnp.zeros((6,), jnp.float32)]).reshape(1, 16)

    # material rows: albedo, emission, metallic, ior, transmission
    m = scene.materials
    metallic = unpack_f16_low(m.metallic_roughness_f16)
    ior = unpack_f16_low(m.ior_transmission_f16)
    trans = unpack_f16_high(m.ior_transmission_f16)
    mat_rows = jnp.concatenate(
        [m.albedo, m.emission, metallic[:, None], ior[:, None],
         trans[:, None], jnp.zeros((m.count, 7), jnp.float32)], axis=1)

    # light rows: position, type, color, intensity, normalised direction
    L = scene.lights
    dlen = jnp.sqrt(jnp.sum(L.direction * L.direction, axis=1, keepdims=True))
    ldir = L.direction / dlen  # NaN for zero dirs -> max0 silences (parity)
    light_rows = jnp.concatenate(
        [L.position, L.light_type.astype(jnp.float32)[:, None], L.color,
         L.intensity[:, None], ldir,
         jnp.zeros((L.count, 5), jnp.float32)], axis=1)

    # sphere rows: center, radius, material
    S = scene.spheres
    sph_rows = jnp.concatenate(
        [S.center, S.radius[:, None],
         S.material_id.astype(jnp.float32)[:, None],
         jnp.zeros((S.count, 11), jnp.float32)], axis=1)
    # radius-0 guard sphere rows divide by r: keep 1/r finite via the row
    # radius (reference empty scenes use r=0 spheres that never hit; the
    # normal path is unreachable for them but 1/0 inf*0 = NaN, so clamp)
    sph_rows = sph_rows.at[:, 3].set(jnp.maximum(sph_rows[:, 3], 1e-30))

    pxb = px.reshape(B, sub, LANES)
    pyb = py.reshape(B, sub, LANES)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    per_packet = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    kernel = partial(
        _kernel, max_iters=nn + 4, width=float(width), height=float(height),
        n_mats=m.count, n_lights=L.count, n_spheres=S.count,
        shadows=shadows, sky=tuple(float(x) for x in sky), slots=slots)
    rgb = pl.pallas_call(
        kernel,
        grid=(B,),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        in_specs=[
            resident(node_rows.shape),
            resident(tri_rows.shape),
            resident(cam_row.shape),
            resident(mat_rows.shape),
            resident(light_rows.shape),
            resident(sph_rows.shape),
            per_packet((1, sub, LANES)),
            per_packet((1, sub, LANES)),
        ],
        out_specs=per_packet((1, 3, sub, LANES)),
        out_shape=jax.ShapeDtypeStruct((B, 3, sub, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scene_vmem_bytes(nn, Tp, slots) + VMEM_HEADROOM),
        interpret=interpret,
    )(node_rows, tri_rows, cam_row, mat_rows, light_rows, sph_rows, pxb, pyb)

    return rgb.transpose(0, 2, 3, 1).reshape(N, 3)
