"""Engine configuration.

TPU-native re-design of the reference's compile-time constant block
(`/root/reference/shared/src/lib.rs:17-35`, struct `RaytracerConfig`) promoted
to a real runtime dataclass + CLI, per SURVEY.md §5 ("config").

The reference hard-codes everything; we keep its *values* as defaults so that
parity tests agree, but every field is overridable at runtime.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class RaytracerConfig:
    # --- values mirrored from /root/reference/shared/src/lib.rs:20-34 ---
    tile_size: int = 128                 # TILE_SIZE
    camera_move_speed: float = 0.1       # CAMERA_MOVE_SPEED
    camera_rotate_sensitivity: float = 0.005  # CAMERA_ROTATE_SENSITIVITY
    min_ray_distance: float = 1e-5       # MIN_RAY_DISTANCE
    performance_stats_interval: int = 60  # PERFORMANCE_STATS_INTERVAL (frames)
    camera_pitch_clamp: float = 0.99     # CAMERA_PITCH_CLAMP

    # --- TPU-native knobs (no reference equivalent: wgpu limits don't apply) ---
    # Ray batch processed per device step. Multiple of 8*128 VPU lanes.
    ray_batch_size: int = 128 * 1024
    # BVH traversal stack depth (reference uses 64, shader/src/bvh.rs:35-38).
    bvh_stack_depth: int = 64
    # Max triangles referenced by one BVH leaf (static unroll bound on
    # device). 8 fills the Pallas kernel's one-leaf-per-128-lane-row layout
    # exactly (ops/pallas/traverse.py) and halves the node count.
    bvh_leaf_size: int = 8
    # Children per wide-BVH node in the host-built overlay (4 or 8). The
    # Pallas wide kernels fetch one 8*width-lane node record per traversal
    # step, so a wider node amortises the per-step scalar overhead (fetch,
    # stack ops, loop bookkeeping) over more slab tests at the cost of more
    # wasted tests in deep, incoherent regions. Device-refit overlays
    # (ops/lbvh.py) are always width 4.
    bvh_width: int = 4
    # Wavefront path tracing.
    max_bounce_depth: int = 4            # PushConstants::new default (shared/src/lib.rs:1088)
    russian_roulette_start: int = 2      # rays ENTERING this bounce depth
                                         # are rouletted (PBRT start-of-
                                         # bounce semantics)
    # Samples traced per PathTracer.step() in ONE pooled wavefront: >1 makes
    # the pool spp-times larger, amortising launch/sort overhead and packing
    # same-pixel bounce rays into denser traversal packets
    # (engine/pathtracer.py::_sample_chunk).
    pathtrace_samples_per_step: int = 1
    # Bounce texture-LOD bias (ray-cone style): depth-d wavefront pools
    # sample the mip pyramid at level bias*d (clamped per texture; depth 0 —
    # directly visible surfaces — always samples level 0 / full sharpness).
    # Incoherent secondary-bounce tap groups then land inside the coarse-mip
    # rows, so the fused bounce kernel's windowed texture fetch fits where
    # level-0 taps straddled (full-atlas matmul), and the prefiltered texel
    # is the physically better estimate for a widened secondary ray cone.
    # 0.0 = off (level-0 everywhere, the pre-round-4 behavior).
    bounce_lod_bias: float = 0.0
    # Texture mip pyramid: max levels built at scene load (1 = off). With
    # mips on, the atlas is clamped to the fused kernels' VMEM row budget by
    # dropping the finest level of every texture until it fits, and samplers
    # pick a per-lane nearest mip from the primary hit footprint — arbitrary
    # source texture sets stay fused AND minification stops aliasing.
    texture_mips: int = 8
    # SBVH-style chopped spatial splits in the host builder: duplicates
    # straddling triangle references across leaves with clipped bounds,
    # cutting node overlap on content with large spanning triangles. Costs
    # build time + up to ~35% more leaf-table slots; off by default.
    bvh_spatial_splits: bool = False
    # Trilinear mip filtering (two-level lerp) in the deferred texture
    # shade + XLA sampler: kills nearest-mip level-boundary banding at the
    # cost of a second fetch per map (doubles the sampling matmuls in the
    # texshade kernel). Off by default.
    texture_trilinear: bool = False
    # Rendering precision for the compute path.
    dtype: str = "float32"
    # Use the Pallas kernels where available (falls back to pure XLA if not).
    use_pallas: bool = True

    def replace(self, **kw) -> "RaytracerConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = RaytracerConfig()


def add_config_args(parser: argparse.ArgumentParser) -> None:
    """Register every config field as a CLI flag (--tile-size etc.)."""
    for f in dataclasses.fields(RaytracerConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(flag, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=f.default)
        else:
            parser.add_argument(flag, type=type(f.default), default=f.default)


def config_from_args(args: argparse.Namespace) -> RaytracerConfig:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(RaytracerConfig)
          if hasattr(args, f.name)}
    return RaytracerConfig(**kw)
