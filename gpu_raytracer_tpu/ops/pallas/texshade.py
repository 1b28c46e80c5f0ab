"""Pallas TPU kernel: fused deferred texture shading.

Phase 2 of the two-phase textured render (phase 1 is the fused trace in
ops/pallas/render.py::pallas_render_deferred, which emits per-ray
(light_sum, material_id, uv)). The XLA formulation of this phase gathers
material rows and texture taps with arbitrary-index 1-D gathers, which XLA
lowers to ~80M lanes/s on TPU regardless of table size — 270+ ms/frame at
1080p, 25x the cost of the traversal it follows. This kernel replaces every
gather with MXU one-hot matmuls against VMEM-resident tables:

* material lookup: `mtableT [C, M] @ onehot [M, 1024rays] -> [C, 1024]` —
  ONE matmul per block delivers albedo/emission/metallic/ior/transmission
  AND the per-map texture metadata (atlas row, stride, size, wrap,
  presence) for all 1024 rays;
* texture fetch: thanks to the guard-band atlas (models/geometry.py), the
  bilinear quad is the address square (row, row+srows) x (lane, lane+1), so
  one matmul per channel `plane [128lanes, K] @ rowhot [K, 2048] ->
  [128, 2048]` fetches both tap rows for the whole BLOCK, an f32 vertical
  lerp blends them, and a weighted lane one-hot reduces the horizontal pair
  — numerically exact f32 bilinear (one-hots are exact 0/1 in bf16, texel
  bytes 0..255 are exact in bf16, accumulation is f32).

Rays ride the LANE axis throughout (the weight matrices put rays on the
matmul's free dimension): the whole 1024-ray block computes FLAT in
[1, 1024] lane space — round 5 chip profiling showed the earlier
PER-128-ray-GROUP formulation was MXU-ISSUE-bound (frame time flat in
window size 256..2048), so batching 8 groups into each matmul is worth
~2x on many-material scenes (48-material zoo: 179 -> 107 ms with 4 map
slots, 39 ms base-only). The kernel consumes the trace kernel's native
[B, 7, sub, 128] output layout directly — the [N, 7] transpose boundary
of the XLA path disappears too.

Shading semantics are identical to ops/shading.py::shade_deferred
(lighting.rs:20-47 + material.rs:76-83 refactored over the light sum,
dispersion blend of shader/src/lib.rs:322-337, magenta invalid-material
sentinel of lib.rs:307-309).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.geometry import TEX_CHUNK
from ...models.material import (
    NO_TEXTURE, TEX_BASE_COLOR, TEX_EMISSIVE, TEX_METALLIC_ROUGHNESS,
    TEX_OCCLUSION)
from ...models.scene import Scene
from ..f16 import unpack_f16_high, unpack_f16_low
from ..shading import DISPERSION, MAGENTA, TRANSMITTED_BASE

# Python-scalar copies of the shading constants (taking them from the jnp
# arrays inside the kernel would stage a traced op under jit).
import numpy as _np
_DISP = tuple(float(x) for x in _np.asarray(DISPERSION))
_TBASE = tuple(float(x) for x in _np.asarray(TRANSMITTED_BASE))
_MAGENTA = tuple(float(x) for x in _np.asarray(MAGENTA))

LANES = 128
GROUPS_PER_BLOCK = 8          # 8 sublane groups = 1024 rays per grid step

# Eligibility caps: the atlas byte-planes and material table must stay VMEM
# resident. 4096 atlas rows = 512K texels = 4 MB of bf16 planes.
MAX_ATLAS_ROWS = 4096
MAX_TABLE_MATERIALS = 1024

# Samplable map slots and which RGBA byte-planes each needs.
_MAPS = (
    (TEX_BASE_COLOR, (0, 1, 2)),
    (TEX_METALLIC_ROUGHNESS, (2,)),     # B channel scales metallic
    (TEX_OCCLUSION, (0,)),              # R channel scales ambient
    (TEX_EMISSIVE, (0, 1, 2)),
)


def texshade_eligible(scene: Scene) -> bool:
    """Static check: textured scene whose atlas planes + material table fit
    the kernel's VMEM budget."""
    if scene.textures.data_u32.shape[0] <= 1:
        return False
    return (scene.textures.data_u32.shape[0] // 128 <= MAX_ATLAS_ROWS
            and scene.materials.count <= MAX_TABLE_MATERIALS)


META_PER_MAP = 7  # has, offset_row, srows, w, h, wrap, levels


def _map_meta_cols(scene: Scene):
    """Per-samplable-map metadata columns (META_PER_MAP each): texture
    presence, level-0 atlas address/shape, wrap mode and mip-chain length.
    Integers are exact small-int floats (< 2^24)."""
    m = scene.materials
    tex = scene.textures
    cols = []
    for slot, _ in _MAPS:
        ti = m.texture_indices[:, slot]
        has = (ti != NO_TEXTURE) & (ti < tex.count)
        safe = jnp.where(has, ti, 0).astype(jnp.int32)
        f = lambda a: jnp.where(has, a[safe].astype(jnp.float32), 0.0)[:, None]
        cols += [has.astype(jnp.float32)[:, None], f(tex.offset_row),
                 f(tex.srows), f(tex.width), f(tex.height), f(tex.wrap),
                 jnp.maximum(f(tex.levels), 1.0)]
    return cols


def _material_table(scene: Scene):
    """[40, Mp] f32: albedo(3) emission(3) metallic ior transmission, then
    per samplable map META_PER_MAP metadata columns."""
    m = scene.materials
    cols = [
        m.albedo,
        m.emission,
        unpack_f16_low(m.metallic_roughness_f16)[:, None],
        unpack_f16_low(m.ior_transmission_f16)[:, None],
        jnp.clip(unpack_f16_high(m.ior_transmission_f16), 0.0, 1.0)[:, None],
    ] + _map_meta_cols(scene)
    table = jnp.concatenate(cols, axis=1)                        # [M, 37]
    table = jnp.pad(table, ((0, (-table.shape[0]) % 8),
                            (0, 40 - table.shape[1])))
    return table.T                                               # [40, Mp]


def _atlas_planes(scene: Scene):
    """[4, 128, Rp] bf16 RGBA byte-planes, texel lanes on the sublane axis
    (the matmul LHS layout), atlas rows padded to a multiple of 128."""
    d = scene.textures.data_u32.reshape(-1, 128)                 # [R,128]
    d = jnp.pad(d, ((0, (-d.shape[0]) % 128), (0, 0)))
    return jnp.stack([
        ((d >> (8 * c)) & 0xFF).astype(jnp.bfloat16).T for c in range(4)])


def _wrap_f(x, size, mode):
    """f32 sampler wrap of integer-valued coords to [0, size) on (1,128)
    tiles; mode 0=REPEAT 1=CLAMP 2=MIRRORED (per-lane).

    The +0.5 margin before each floor(x/size): x is integer-valued, so
    floor((x+0.5)/size) == floor(x/size) exactly — but XLA:TPU lowers fdiv
    as an approximation whose ~1-ulp error around exact-integer quotients
    flips a bare floor (measured: 27% of a 512x384 chip probe fetched a
    texel a whole chunk away vs the XLA twin's integer '//'). The margin
    puts the quotient >= 0.5/size away from every integer boundary, far
    beyond the division error, on every backend."""
    size = jnp.maximum(size, 1.0)
    repeat = x - size * jnp.floor((x + 0.5) / size)
    clamp = jnp.clip(x, 0.0, size - 1.0)
    per = x - (2.0 * size) * jnp.floor((x + 0.5) / (2.0 * size))
    mirror = jnp.where(per < size, per, 2.0 * size - 1.0 - per)
    return jnp.where(mode == 1.0, clamp,
                     jnp.where(mode == 2.0, mirror, repeat))


def _tap_setup(u, v, meta):
    """Per-lane bilinear tap base in the guard-band atlas →
    (rowA, lane, srows, fx, fy), all (1,128) f32. Mirrors
    ops/texture.py::tap_base (incl. the MIRRORED flip and CLAMP low-edge
    collapse)."""
    has, off_row, srows, w, h, mode = meta
    uf = u * w - 0.5
    vf = v * h - 0.5
    x0 = jnp.floor(uf)
    y0 = jnp.floor(vf)
    fx = uf - x0
    fy = vf - y0

    def axis(c0, f, size):
        cw = _wrap_f(c0, size, mode)
        f = jnp.where((mode == 1.0) & (c0 < 0.0), 0.0, f)
        # +0.5 margin: see _wrap_f (approximate-fdiv-safe exact floor)
        per = c0 - (2.0 * size) * jnp.floor((c0 + 0.5) / (2.0 * size))
        flip = (mode == 2.0) & (per >= size)
        f = jnp.where(flip, jnp.where(cw == 0.0, 0.0, 1.0 - f), f)
        cw = jnp.where(flip, jnp.maximum(cw - 1.0, 0.0), cw)
        return cw, f

    xw, fx = axis(x0, fx, w)
    yw, fy = axis(y0, fy, h)
    # reciprocal-mul with the same +0.5 margin: xw is integer-valued in
    # [0, size), so the quotient stays >= 0.5/127 from every integer —
    # one correctly-rounded mul cannot cross it (a bare xw/127 fdiv on
    # XLA:TPU can, fetching lane 127 of the wrong chunk)
    k = jnp.floor((xw + 0.5) * (1.0 / float(TEX_CHUNK)))
    lane = xw - k * TEX_CHUNK
    rowA = off_row + yw * srows + k
    return rowA, lane, srows, fx, fy


def _walk_meta(meta, lod, n_levels):
    """Walk the contiguous mip chain to per-lane level `lod` →
    (has, off_row, srows, w, h, wrap). Level addresses are DERIVED
    (models/geometry.py::Textures layout): off_{l+1} = off_l +
    (h_l+1)*ceil(w_l/127), sizes halving — a static n_levels-step loop of
    masked selects, no per-level tables."""
    has, off, srows, w, h, mode, _lv = meta
    sw, sh, soff, ssr = w, h, off, srows
    wl, hl, offl, srl = w, h, off, srows
    for l in range(1, n_levels):
        offl = offl + (hl + 1.0) * srl
        wl = jnp.maximum(jnp.floor(wl * 0.5), 1.0)
        hl = jnp.maximum(jnp.floor(hl * 0.5), 1.0)
        srl = jnp.floor((wl + 126.0) * (1.0 / 127.0))
        m = lod >= float(l)   # lod clamped to the chain: last pass wins
        sw = jnp.where(m, wl, sw)
        sh = jnp.where(m, hl, sh)
        soff = jnp.where(m, offl, soff)
        ssr = jnp.where(m, srl, ssr)
    return has, soff, ssr, sw, sh, mode


def _mip_meta(meta, lam, n_levels):
    """Per-lane NEAREST mip selection → level-l metadata.

    LOD from the linear footprint `lam` (texels per pixel at unit texture
    size, from the trace kernel's t x pixel-angle x uv-density):
    lod = round(log2(lam*w)), computed exactly as floor(log2(x*sqrt2)) via
    f32 exponent extraction (Mosaic-safe, no transcendental), clamped to
    the texture's resident chain."""
    has, off, srows, w, h, mode, lv = meta
    foot = jnp.maximum(lam * w, 1e-20)
    bits = jax.lax.bitcast_convert_type(foot * 1.4142135, jnp.int32)
    lod = jnp.clip(((bits >> 23) - 127).astype(jnp.float32), 0.0, lv - 1.0)
    return _walk_meta(meta, lod, n_levels)


def _mip_lod_frac(meta, lam):
    """Continuous LOD split for trilinear: (floor level l0, blend frac) —
    exponent+mantissa piecewise-linear log2 (max error 0.086, exactly 0 at
    level boundaries so the blend is continuous across them). frac is 0
    when magnifying or when l0+1 runs past the resident chain."""
    _has, _off, _srows, w, _h, _mode, lv = meta
    foot = jnp.maximum(lam * w, 1e-20)
    bits = jax.lax.bitcast_convert_type(foot, jnp.int32)
    e = ((bits >> 23) - 127).astype(jnp.float32)
    mant = (bits & 0x7FFFFF).astype(jnp.float32) * (2.0 ** -23)
    l0 = jnp.clip(e, 0.0, lv - 1.0)
    frac = jnp.where((e >= 0.0) & (e < lv - 1.0), mant, 0.0)
    return l0, frac


# Block-level window rows: the flat kernel fetches all 1024 rays of a
# block with ONE matmul per channel when their taps fit this many
# 128-aligned atlas rows (8 groups of tile-adjacent rays usually do);
# straddling blocks fall back to the per-group full-K loop. Chip A/B on
# the 48-material zoo (see _kernel): per-group issue overhead dominated
# at 85-180 ms/frame regardless of window size — batching the issues is
# what pays, not shrinking K.
BLOCK_WINDOW_ROWS = 1024


def _sample_map_block(plane_ref, rows_pad, meta, u, v, channels, lam=None,
                      n_levels=1, trilinear=False, fixed_lod=0.0):
    """_sample_map over a FLAT [1, n] block (n = 1024 rays): one tap
    matmul per channel for the whole block when the union window fits
    BLOCK_WINDOW_ROWS; per-128-lane-group full-K loop otherwise (small
    resident fallback body — a block-wide full-K wstack would be
    [Rp, 2n] bf16 ≈ 16 MB of VMEM for a branch that rarely runs).
    Bit-identical to the per-group path: the one-hot rows select the
    same texels."""
    n = u.shape[1]

    def fetch(meta6):
        rowA, lane, srows, fx, fy = _tap_setup(u, v, meta6)   # (1,n) each

        def tapped(base, k_rows, plane_of, sl=slice(None)):
            la, f_x, f_y = lane[:, sl], fx[:, sl], fy[:, sl]
            rA, sr = rowA[:, sl], srows[:, sl]
            m = la.shape[1]
            lit = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1),
                                           0).astype(jnp.float32)
            hl = ((lit == la).astype(jnp.float32) * (1.0 - f_x)
                  + (lit == la + 1.0).astype(jnp.float32) * f_x)  # [128,m]
            rit = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1),
                                           0).astype(jnp.float32)
            w0 = (rit == rA - base).astype(jnp.bfloat16)          # [K,m]
            w1 = (rit == rA + sr - base).astype(jnp.bfloat16)
            wstack = jnp.concatenate([w0, w1], axis=1)            # [K,2m]
            out = {}
            for c in channels:
                res = jax.lax.dot_general(
                    plane_of(c), wstack, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [128,2m]
                col = res[:, :m] * (1.0 - f_y) + res[:, m:] * f_y
                out[c] = jnp.sum(col * hl, axis=0,
                                 keepdims=True) * (1.0 / 255.0)
            return out

        T = BLOCK_WINDOW_ROWS
        if rows_pad <= T:
            return tapped(0.0, rows_pad, lambda c: plane_ref[c])
        has = meta6[0] > 0.0
        BIGF = jnp.float32(3.0e38)
        rmin = jnp.min(jnp.where(has, rowA, BIGF))
        rmax = jnp.max(jnp.where(has, rowA + srows, -BIGF))
        base_raw = jnp.floor(rmin * (1.0 / 128.0)) * 128.0
        base_f = jnp.maximum(jnp.minimum(base_raw, float(rows_pad - T)),
                             0.0)
        base_i = pl.multiple_of(base_f.astype(jnp.int32), 128)

        def win(_):
            d = tapped(base_f, T, lambda c: plane_ref[c, :, pl.ds(base_i, T)])
            return tuple(d[c] for c in channels)

        def full(_):
            outs = []
            for g in range(n // LANES):
                sl = slice(g * LANES, (g + 1) * LANES)
                d = tapped(0.0, rows_pad, lambda c: plane_ref[c], sl)
                outs.append(d)
            return tuple(
                jnp.concatenate([d[c] for d in outs], axis=1)
                for c in channels)

        outs = jax.lax.cond(rmax < base_f + float(T), win, full, 0)
        return dict(zip(channels, outs))

    if lam is not None and n_levels > 1 and trilinear:
        lv = meta[6]
        l0, frac = _mip_lod_frac(meta, lam)
        s0 = fetch(_walk_meta(meta, l0, n_levels))
        s1 = fetch(_walk_meta(meta, jnp.minimum(l0 + 1.0, lv - 1.0),
                              n_levels))
        return tuple(s0[c] * (1.0 - frac) + s1[c] * frac for c in channels)
    if lam is not None and n_levels > 1:
        out = fetch(_mip_meta(meta, lam, n_levels))
    elif fixed_lod > 0.0 and n_levels > 1:
        lodv = jnp.minimum(jnp.float32(fixed_lod), meta[6] - 1.0)
        out = fetch(_walk_meta(meta, lodv, n_levels))
    else:
        out = fetch(meta[:6])
    return tuple(out[c] for c in channels)


def _kernel(in_ref, planes_ref, mtable_ref, out_ref, *,
            n_mats, mats_pad, rows_pad, present, sky, n_levels=1,
            trilinear=False):
    """One BLOCK (8 groups = 1024 rays) per grid step, computed FLAT in
    [1, 1024] lane space: one Precision.HIGHEST table matmul and one tap
    matmul per channel per map for the whole block. The per-group
    formulation issued 8x the matmuls; chip-measured on the 48-material
    zoo its cost was ISSUE-bound (frame time flat in window size
    256..2048), so batching issues is the lever — 179 -> ~35 ms/frame
    (4 maps), courtyard unchanged-or-better."""
    G = GROUPS_PER_BLOCK
    n = G * LANES
    flat = lambda a: a.reshape(1, n)
    ls = [flat(in_ref[0, c]) for c in range(3)]
    matf = flat(in_ref[0, 3])
    u = flat(in_ref[0, 4])
    v = flat(in_ref[0, 5])
    lam = flat(in_ref[0, 6]) if n_levels > 1 else None

    live = matf >= 0.0
    skyv = tuple(jnp.full((1, n), float(sky[c]), jnp.float32)
                 for c in range(3))

    def shade(_):
        mid = jnp.clip(matf, 0.0, float(n_mats - 1))
        mit = jax.lax.broadcasted_iota(jnp.int32, (mats_pad, 1),
                                       0).astype(jnp.float32)
        ohm = (mit == mid).astype(jnp.float32)           # [Mp,n]
        # Precision.HIGHEST is REQUIRED: the default TPU f32 dot rounds
        # the value operand to ONE bf16 pass, corrupting the exact-int
        # atlas metadata in the table (chip measured: off_row
        # 1033 -> 1032, 3401 -> 3408) and quantising albedo to an 8-bit
        # mantissa.
        mrow = jax.lax.dot_general(
            mtable_ref[...], ohm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [40,n]

        alb = [mrow[c:c + 1, :] for c in range(3)]
        emi = [mrow[3 + c:4 + c, :] for c in range(3)]
        metal = mrow[6:7, :]
        ior = mrow[7:8, :]
        trans = mrow[8:9, :]
        occ = None

        for mi, (slot, channels) in enumerate(_MAPS):
            if slot not in present:
                continue
            meta = tuple(
                mrow[9 + META_PER_MAP * mi + j:
                     10 + META_PER_MAP * mi + j, :]
                for j in range(META_PER_MAP))
            has = meta[0] > 0.0
            # skip the matmuls when no lane of the block has this map
            ones = tuple(jnp.ones((1, n), jnp.float32) for _ in channels)
            s = jax.lax.cond(
                jnp.any(has),
                lambda _: _sample_map_block(planes_ref, rows_pad, meta,
                                            u, v, channels, lam=lam,
                                            n_levels=n_levels,
                                            trilinear=trilinear),
                lambda _: ones, 0)
            pick = {c: jnp.where(has, s[i], 1.0)
                    for i, c in enumerate(channels)}
            if slot == TEX_BASE_COLOR:
                alb = [alb[c] * pick[c] for c in range(3)]
            elif slot == TEX_EMISSIVE:
                emi = [emi[c] * pick[c] for c in range(3)]
            elif slot == TEX_METALLIC_ROUGHNESS:
                metal = metal * pick[2]
            elif slot == TEX_OCCLUSION:
                occ = pick[0]

        # shade_deferred's formula: albedo*(0.1*occ + brdf*S) + emission
        is_metal = (metal > 0.5).astype(jnp.float32)
        brdf = (is_metal * 0.5
                + (1.0 - is_metal) * (1.0 / 3.141592653589793))
        amb = 0.1 if occ is None else 0.1 * occ
        rgb = [alb[c] * (amb + brdf * ls[c]) + emi[c] for c in range(3)]

        # dispersion blend (shader/src/lib.rs:322-337)
        denom = ior - 1.0
        for c in range(3):
            wl_ior = ior + _DISP[c]
            transmitted = _TBASE[c] * (wl_ior - 1.0) / denom
            blended = rgb[c] * (1.0 - trans) + transmitted * trans
            rgb[c] = jnp.where(trans > 0.0, blended, rgb[c])

        invalid = matf >= float(n_mats)
        return tuple(
            jnp.where(live, jnp.where(invalid, _MAGENTA[c], rgb[c]),
                      float(sky[c])) for c in range(3))

    # all-sky blocks (tile-coherent rays make them common) skip the
    # whole shade including every matmul
    rgb = jax.lax.cond(jnp.any(live), shade, lambda _: skyv, 0)
    for c in range(3):
        out_ref[0, c] = rgb[c].reshape(G, LANES)


@partial(jax.jit, static_argnames=("sky", "interpret", "trilinear"))
def pallas_texture_shade(scene: Scene, out7: jnp.ndarray,
                         sky: tuple = (0.0, 0.0, 0.0),
                         interpret: bool = False,
                         trilinear: bool = False) -> jnp.ndarray:
    """Fused texture shading of the deferred trace output
    `out7 [B, 7, sub, 128]` (light_sum rgb, material_id, uv, mip footprint)
    → RGB [N, 3] in ray order."""
    B, seven, sub, lanes = out7.shape
    assert seven == 7 and lanes == LANES and sub % GROUPS_PER_BLOCK == 0
    planes = _atlas_planes(scene)                    # [4,128,Rp]
    mtable = _material_table(scene)                  # [40,Mp]
    rows_pad = planes.shape[2]
    mats_pad = mtable.shape[1]
    present = tuple(
        slot for slot, _ in _MAPS
        if scene.materials.present_slots is None
        or slot in scene.materials.present_slots)

    blocks_per_packet = sub // GROUPS_PER_BLOCK
    kernel = partial(_kernel, n_mats=scene.materials.count,
                     mats_pad=mats_pad, rows_pad=rows_pad,
                     present=present, sky=tuple(float(x) for x in sky),
                     n_levels=scene.textures.n_levels,
                     trilinear=trilinear)
    grid = (B * blocks_per_packet,)
    in_map = lambda i: (i // blocks_per_packet, 0, i % blocks_per_packet, 0)
    rgb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 7, GROUPS_PER_BLOCK, LANES), in_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(planes.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mtable.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, GROUPS_PER_BLOCK, LANES), in_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, sub, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(planes.size * 2 + mtable.size * 4
                              + 32 * 1024 * 1024)),
        interpret=interpret,
    )(out7, planes, mtable)
    return rgb.transpose(0, 2, 3, 1).reshape(-1, 3)


def material_table_full(scene: Scene):
    """[40, Mp] f32 transposed material+texture-metadata table for the
    textured bounce: albedo(3) emission(3) metallic roughness ior
    transmission, then per samplable map META_PER_MAP metadata columns —
    the bounce twin of _material_table (adds roughness, which the deferred
    shade does not need but the BSDF fuzz does)."""
    m = scene.materials
    cols = [
        m.albedo,
        m.emission,
        unpack_f16_low(m.metallic_roughness_f16)[:, None],
        unpack_f16_high(m.metallic_roughness_f16)[:, None],
        unpack_f16_low(m.ior_transmission_f16)[:, None],
        unpack_f16_high(m.ior_transmission_f16)[:, None],
    ] + _map_meta_cols(scene)
    table = jnp.concatenate(cols, axis=1)                        # [M, 38]
    table = jnp.pad(table, ((0, (-table.shape[0]) % 8),
                            (0, 40 - table.shape[1])))
    return table.T


def sample_materials_tiles(planes_ref, mtable_ref, uvx, uvy, mat_id, *,
                        n_mats, mats_pad, rows_pad, present, lam=None,
                        n_levels=1, fixed_lod=0.0):
    """Per-lane textured material parameters → 11 (sub,128) tiles
    (alb rgb, emi rgb, metal, rough, ior, trans, ambient-occ).

    Works one FLAT 8-group block (1024 rays) at a time, like _kernel: one
    Precision.HIGHEST table matmul and one _sample_map_block call per
    present map per block — the per-128-ray-group formulation issued 8x
    the matmuls and was MXU-issue-bound on chip (see _kernel's note); a
    full bounce packet (sub = 64) drops from 64 to 8 lookup matmuls.
    Block results reshape back into full packet tiles. `lam`
    ((sub,128) footprint tile) + n_levels > 1 enables per-lane
    nearest-mip sampling."""
    sub = uvx.shape[0]
    bs = 8 if sub % 8 == 0 else 1           # groups per flat block
    rows = {k: [] for k in range(11)}
    for b in range(sub // bs):
        sl = slice(b * bs, (b + 1) * bs)
        n = bs * LANES
        u = uvx[sl].reshape(1, n)
        v = uvy[sl].reshape(1, n)
        lamg = (lam[sl].reshape(1, n)
                if (lam is not None and n_levels > 1) else None)
        mid = jnp.clip(mat_id[sl].reshape(1, n), 0.0, float(n_mats - 1))
        mit = jax.lax.broadcasted_iota(jnp.int32, (mats_pad, 1),
                                       0).astype(jnp.float32)
        ohm = (mit == mid).astype(jnp.float32)               # [Mp,n]
        # Precision.HIGHEST: exact table extraction (see _kernel — the
        # default single-bf16-pass dot corrupts atlas row offsets)
        mrow = jax.lax.dot_general(
            mtable_ref[...], ohm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # [40,n]
        vals = [mrow[c:c + 1, :] for c in range(10)]
        occ = jnp.ones((1, n), jnp.float32)
        for mi, (slot, channels) in enumerate(_MAPS):
            if slot not in present:
                continue
            if slot == TEX_METALLIC_ROUGHNESS:
                # The bounce BSDF needs roughness too: sample G (roughness)
                # alongside B (metallic), matching the XLA twin
                # (ops/wavefront.py xla_bounce: metallic*=mr[:,2],
                # roughness*=mr[:,1]). The deferred-shade kernel keeps the
                # metallic-only _MAPS entry — it never evaluates roughness.
                channels = (1, 2)
            meta = tuple(
                mrow[10 + META_PER_MAP * mi + j:
                     11 + META_PER_MAP * mi + j, :]
                for j in range(META_PER_MAP))
            has = meta[0] > 0.0
            smp = jax.lax.cond(
                jnp.any(has),
                lambda _: _sample_map_block(planes_ref, rows_pad, meta,
                                            u, v, channels, lam=lamg,
                                            n_levels=n_levels,
                                            fixed_lod=fixed_lod),
                lambda _: tuple(jnp.ones((1, n), jnp.float32)
                                for _ in channels), 0)
            pick = {c: jnp.where(has, smp[i], 1.0)
                    for i, c in enumerate(channels)}
            if slot == TEX_BASE_COLOR:
                vals[0] = vals[0] * pick[0]
                vals[1] = vals[1] * pick[1]
                vals[2] = vals[2] * pick[2]
            elif slot == TEX_EMISSIVE:
                vals[3] = vals[3] * pick[0]
                vals[4] = vals[4] * pick[1]
                vals[5] = vals[5] * pick[2]
            elif slot == TEX_METALLIC_ROUGHNESS:
                vals[6] = vals[6] * pick[2]   # B scales metallic
                vals[7] = vals[7] * pick[1]   # G scales roughness
            elif slot == TEX_OCCLUSION:
                occ = pick[0]
        for k in range(10):
            rows[k].append(vals[k].reshape(bs, LANES))
        rows[10].append(occ.reshape(bs, LANES))
    return tuple(jnp.concatenate(rows[k], axis=0) for k in range(11))
