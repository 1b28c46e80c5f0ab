"""Frame renderer: ray-batch pipeline over the whole image.

TPU-native replacement for the reference's dispatch machinery
(/root/reference/src/compute.rs:12-251): instead of per-tile × per-channel
compute dispatches writing 3 storage textures recombined by a fragment shader
(src/renderer.rs:778-818), one jitted function traces a ray batch and shades
all three wavelength channels at once (see ops/shading.py for why that is
exactly equivalent). The image is processed in fixed-size ray chunks so the
traversal working set (per-ray BVH stacks) stays bounded; chunks reuse one
compiled executable.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RaytracerConfig
from ..models.camera import Camera
from ..models.scene import Scene
from ..ops.camera_rays import generate_rays
from ..ops.linalg import normalize
from ..ops.shading import shade
from ..ops.trace import trace, occluded


def _shadow_mask(scene: Scene, hit, leaf_size: int, use_bvh: bool):
    """[N,L] visibility: 1 where the light is reachable from the hit point.

    Shadow-ray semantics per WavefrontRay::shadow_ray
    (/root/reference/shared/src/lib.rs:934-956): origin offset by t_min=0.001
    along the surface normal, t_max = distance to the light. The reference
    declared but never traced these (SURVEY.md gap); here they are real.
    """
    L = scene.lights
    N = hit.point.shape[0]
    nl = L.count
    origin = hit.point + hit.normal * 1e-3                     # [N,3]

    to_light = L.position[None, :, :] - hit.point[:, None, :]  # [N,L,3]
    dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1))     # [N,L]
    pl_dir = to_light / dist[..., None]
    ldir = normalize(L.direction)[None, :, :]
    is_directional = (L.light_type[None, :] == 0)
    sdir = jnp.where(is_directional[..., None], -jnp.broadcast_to(ldir, to_light.shape), pl_dir)
    smax = jnp.where(is_directional, jnp.float32(3.0e38), dist - 1e-3)

    # light-major layout: each traversal packet serves ONE light over
    # consecutive (coherent) rays, keeping the shared cursor tight
    o = jnp.broadcast_to(origin[None, :, :], (nl, N, 3)).reshape(-1, 3)
    d = jnp.swapaxes(sdir, 0, 1).reshape(-1, 3)
    m = jnp.swapaxes(smax, 0, 1).reshape(-1)
    blocked = occluded(scene, o, d, m, leaf_size=leaf_size, use_bvh=use_bvh)
    mask = 1.0 - jnp.swapaxes(blocked.reshape(nl, N), 0, 1).astype(jnp.float32)
    # Only meaningful for actual hits; misses shade as sky anyway.
    return jnp.where(hit.hit[:, None], mask, 1.0)


@partial(jax.jit, static_argnames=("width", "height", "shadows", "use_bvh",
                                   "leaf_size", "sky", "trilinear"))
def render_chunk(scene: Scene, px: jnp.ndarray, py: jnp.ndarray,
                 width: int, height: int, shadows: bool = False,
                 use_bvh: bool = True, leaf_size: int = 4,
                 sky: tuple = (0.0, 0.0, 0.0),
                 trilinear: bool = False) -> jnp.ndarray:
    """Trace + shade one ray chunk → RGB [n,3]."""
    from ..ops.shading import hit_footprint

    orig, dirn = generate_rays(scene.camera, width, height, px, py)
    hit = trace(scene, orig, dirn, leaf_size=leaf_size, use_bvh=use_bvh)
    mask = _shadow_mask(scene, hit, leaf_size, use_bvh) if shadows else None
    # mip footprint (pyramid atlases only): same per-lane level pick as the
    # fused kernels, so fused-vs-XLA parity survives mips
    lam = (hit_footprint(scene, hit, height)
           if scene.textures.n_levels > 1 else None)
    return shade(scene, hit, shadow_mask=mask, sky_color=sky, lam=lam,
                 trilinear=trilinear)


class Renderer:
    """Whole-frame renderer with chunked execution.

    The equivalent of ComputeRenderer's legacy path
    (/root/reference/src/compute.rs:10-251) minus the wgpu plumbing; the
    progressive tile scheduler lives in engine/progressive.py.
    """

    def __init__(self, scene: Scene, width: int, height: int,
                 config: RaytracerConfig = DEFAULT_CONFIG,
                 shadows: bool = False, sky=(0.0, 0.0, 0.0),
                 interpret: bool = False):
        self.scene = scene
        self.width = width
        self.height = height
        self.config = config
        self.shadows = shadows
        self.sky = tuple(float(x) for x in sky)
        self.use_bvh = scene.bvh.num_nodes > 1
        # interpret=True runs the fused Pallas kernels in the interpreter —
        # CPU-backend validation of the exact fused path (tests, virtual
        # meshes); never set on a real chip.
        self.interpret = interpret
        # Frame counter folded into the single-sample-NEE light choice for
        # >MAX_LIGHTS scenes: callers (the Viewer) advance it per frame so
        # the per-pixel estimation noise is fresh each frame and temporal
        # averaging converges to the exact per-light sum. Frozen at 0 it
        # reproduces the deterministic single-frame behaviour.
        self.light_frame = 0
        self._chunks = None  # cached device px/py chunks

    def set_camera(self, camera: Camera) -> None:
        self.scene = self.scene.with_camera(camera)

    def _chunk_size(self, n: int) -> int:
        """One dispatch per frame on the Pallas traversal path (each packet
        already retires at its own path length, and every extra launch
        re-stages the VMEM scene tables); bounded chunks on the XLA path,
        where SMALLER dispatches cut the vmap-lockstep waste (all packets in
        a dispatch run to the longest packet's trip count)."""
        from ..ops.trace import PALLAS_PACKET, _pallas_available
        from ..ops.pallas.traverse import pallas_scene_ok

        pallas = ((_pallas_available() or self.interpret)
                  and pallas_scene_ok(self.scene.bvh,
                                      self.scene.tri_v0.shape[0]))
        if pallas:
            return max(-(-n // PALLAS_PACKET) * PALLAS_PACKET, PALLAS_PACKET)
        return min(self.config.ray_batch_size, max(n, 1024))

    def _pixel_order(self):
        """Tile-major pixel order (host arrays), padded to the chunk size."""
        from ..ops.packet_trace import tiled_pixel_order

        W, H = self.width, self.height
        # 64x64 tiles = exactly one 4096-ray packet per tile (PALLAS_PACKET)
        px, py = tiled_pixel_order(W, H, tile=64)
        n = px.shape[0]
        chunk = self._chunk_size(n)
        pad = (-n) % chunk
        if pad:
            px = np.concatenate([px, np.full(pad, W - 1, np.int32)])
            py = np.concatenate([py, np.full(pad, H - 1, np.int32)])
        return px, py, chunk

    def _device_chunks(self):
        """Per-chunk device px/py arrays, uploaded once (the coordinates
        never change per resolution — re-uploading 16 MB per frame through
        the tunnel would dwarf the render)."""
        if self._chunks is None:
            px, py, chunk = self._pixel_order()
            self._chunks = [
                (jnp.asarray(px[s:s + chunk]), jnp.asarray(py[s:s + chunk]))
                for s in range(0, px.shape[0], chunk)]
        return self._chunks

    def _use_fused(self) -> bool:
        """Fused raygen→trace→shade Pallas kernel (ops/pallas/render.py):
        ~3.5x over the chunked XLA pipeline (no Hit materialisation, no
        HBM round-trips between stages)."""
        from ..ops.trace import _pallas_available
        from ..ops.pallas.render import fused_render_eligible

        return ((_pallas_available() or self.interpret) and self.use_bvh
                and fused_render_eligible(self.scene))

    def _use_deferred(self) -> bool:
        """Two-phase fused kernel (trace + light sums in Pallas, material /
        texture apply in one XLA gather pass) — textured scenes and
        unbounded material counts stay off the slow chunked path."""
        from ..ops.trace import _pallas_available
        from ..ops.pallas.render import fused_deferred_eligible

        if not ((_pallas_available() or self.interpret) and self.use_bvh):
            return False
        return fused_deferred_eligible(self.scene)

    def _light_u(self, n: int, salt: int):
        """Per-lane uniforms for the fused kernels' single-sample NEE
        (>MAX_LIGHTS scenes): keyed on (light_frame, salt) so every frame —
        and every chunk/tile within a frame — draws fresh light choices.
        None for exact-loop scenes (≤MAX_LIGHTS), where the kernels take no
        light_u operand at all."""
        from ..ops.pallas.render import MAX_LIGHTS

        if self.scene.lights.count <= MAX_LIGHTS:
            return None
        key = jax.random.fold_in(jax.random.PRNGKey(self.light_frame), salt)
        return jax.random.uniform(key, (n,), jnp.float32)

    def render_rays(self, px: jnp.ndarray, py: jnp.ndarray,
                    light_salt: int = 0) -> jnp.ndarray:
        """Trace + shade one pixel batch through the best available path
        (fused Pallas → deferred Pallas → chunked XLA) → device RGB [n,3].

        The packet-granular entry point for interactive schedulers (the
        Viewer feeds 128x128-tile batches here — the reference redraws the
        same way, one dispatch per progressive tile,
        /root/reference/src/compute.rs:169-191). Fused paths need
        n % PALLAS_PACKET == 0; anything else falls back to the XLA chunk.
        """
        from ..ops.trace import PALLAS_PACKET

        W, H = self.width, self.height
        n = int(px.shape[0])
        if n % PALLAS_PACKET == 0:
            textured = self.scene.textures.data_u32.shape[0] > 1
            # Textured scenes prefer the TWO-phase pipeline: the dedicated
            # texshade kernel skips all-sky lane groups at block granularity
            # and measured ~6% faster than in-kernel sampling interleaved
            # with traversal (30.7 vs 32.5 ms at 1080p).
            if self._use_fused() and not textured:
                from ..ops.pallas.render import pallas_render_primary

                return pallas_render_primary(self.scene, px, py, W, H,
                                             shadows=self.shadows,
                                             sky=self.sky,
                                             interpret=self.interpret,
                                             light_u=self._light_u(
                                                 n, light_salt))
            if self._use_deferred():
                from ..ops.pallas.render import pallas_render_deferred

                return pallas_render_deferred(self.scene, px, py, W, H,
                                              shadows=self.shadows,
                                              sky=self.sky,
                                              interpret=self.interpret,
                                              trilinear=self.config
                                              .texture_trilinear,
                                              light_u=self._light_u(
                                                  n, light_salt))
        return render_chunk(self.scene, px, py, W, H, shadows=self.shadows,
                            use_bvh=self.use_bvh,
                            leaf_size=self.config.bvh_leaf_size, sky=self.sky,
                            trilinear=self.config.texture_trilinear)

    def render_device(self) -> jnp.ndarray:
        """Render the full frame, leaving it in HBM → device f32 [Npad,3] in
        tile-major ray order (see `_pixel_order`).

        Pixels are fed in 64x64-tile order so ray packets stay coherent for
        the packet traversal. The frame stays in ray order on device — the
        pixel-order shuffle happens host-side after readback, because a
        2M-row device scatter is the one thing a TPU does catastrophically
        slowly. Display readback is a separate step, as in the reference
        where compute writes storage textures and present samples them
        (src/renderer.rs:778-818)."""
        W, H = self.width, self.height
        textured = self.scene.textures.data_u32.shape[0] > 1
        if self._use_fused() and not textured:   # see render(): textured
            from ..ops.pallas.render import pallas_render_primary

            out = [pallas_render_primary(
                self.scene, pxs, pys, W, H, shadows=self.shadows,
                sky=self.sky, interpret=self.interpret,
                light_u=self._light_u(pxs.shape[0], i))
                for i, (pxs, pys) in enumerate(self._device_chunks())]
            return jnp.concatenate(out) if len(out) > 1 else out[0]
        if self._use_deferred():
            from ..ops.pallas.render import pallas_render_deferred

            out = [pallas_render_deferred(
                self.scene, pxs, pys, W, H, shadows=self.shadows,
                sky=self.sky, interpret=self.interpret,
                trilinear=self.config.texture_trilinear,
                light_u=self._light_u(pxs.shape[0], i))
                for i, (pxs, pys) in enumerate(self._device_chunks())]
            return jnp.concatenate(out) if len(out) > 1 else out[0]
        out = []
        for pxs, pys in self._device_chunks():
            rgb = render_chunk(
                self.scene, pxs, pys,
                W, H, shadows=self.shadows, use_bvh=self.use_bvh,
                leaf_size=self.config.bvh_leaf_size, sky=self.sky,
                trilinear=self.config.texture_trilinear)
            out.append(rgb)
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    def _to_image(self, flat: np.ndarray) -> np.ndarray:
        px, py, _ = self._pixel_order()
        fb = np.zeros((self.height, self.width) + flat.shape[1:], flat.dtype)
        fb[py, px] = flat
        return fb

    def render(self) -> np.ndarray:
        """Full frame → host float32 [H,W,3] (single device→host readback,
        host-side pixel reorder)."""
        return self._to_image(np.asarray(self.render_device()))

    def render_u8(self, srgb: bool = True) -> np.ndarray:
        """Full frame quantised to display u8 ON DEVICE before readback —
        the present path. sRGB-encoded by default (the reference presents
        through an sRGB swapchain, src/renderer.rs:128-133; srgb=False is
        the raw linear rgba8 storage-texture write, shader/src/lib.rs:86-88)
        and 4x cheaper to pull off-chip than f32."""
        from ..utils.image import linear_to_srgb
        fb = self.render_device()
        if srgb:
            fb = linear_to_srgb(fb, xp=jnp)
        u8 = (jnp.clip(fb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return self._to_image(np.asarray(u8))


def render_image(scene: Scene, width: int, height: int, *,
                 shadows: bool = False, sky=(0.0, 0.0, 0.0),
                 config: RaytracerConfig = DEFAULT_CONFIG) -> np.ndarray:
    """One-shot convenience wrapper."""
    return Renderer(scene, width, height, config=config,
                    shadows=shadows, sky=sky).render()
