"""Interactive application shell (headless).

The TPU equivalent of the reference's winit app (/root/reference/src/main.rs):
a `Viewer` owns the scene, camera controller, progressive tile scheduler and
perf counters, and exposes the same interaction surface — WASD movement,
mouse-drag look, Space to re-render, L to load a glTF scene with
fall-back-to-current-scene error handling (main.rs:150-219) — driven
programmatically (or from a terminal loop) instead of a window event loop.
Every frame: run_compute (progressive tiles into the persistent framebuffer)
then "present" (the framebuffer is available as an array / PNG), mirroring
the redraw path (main.rs:278-286).
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RaytracerConfig
from ..models.camera import CameraController
from ..models.scene import Scene
from .perf import PerformanceState, ProgressiveTiming, Timer, block_on
from .progressive import ProgressiveState
from .renderer import render_chunk


class Viewer:
    def __init__(self, scene: Scene, width: int = 1280, height: int = 720,
                 config: RaytracerConfig = DEFAULT_CONFIG,
                 shadows: bool = False, verbose: bool = True):
        self.config = config
        self.width = width
        self.height = height
        self.shadows = shadows
        self.verbose = verbose
        self.scene = scene
        self.controller = CameraController(scene.camera, config)
        self.progressive = ProgressiveState(width, height, config)
        self.perf = PerformanceState(config.performance_stats_interval, verbose)
        self.timing = ProgressiveTiming()
        self.framebuffer = np.zeros((height, width, 3), np.float32)
        self.should_quit = False
        ts = config.tile_size
        gy, gx = np.mgrid[0:ts, 0:ts]
        self._tile_gx = gx.reshape(-1).astype(np.int32)
        self._tile_gy = gy.reshape(-1).astype(np.int32)

    # ---- interaction surface (main.rs:150-197, input.rs) ----

    def handle_key(self, key: str) -> None:
        key = key.lower()
        if key == "w":
            self.controller.move(forward=1.0)
        elif key == "s":
            self.controller.move(forward=-1.0)
        elif key == "a":
            self.controller.move(strafe=-1.0)
        elif key == "d":
            self.controller.move(strafe=1.0)
        elif key == " " or key == "space":
            pass  # fallthrough to recompute below
        elif key == "l":
            self.load_gltf("model.gltf")
            return
        elif key == "escape":
            self.should_quit = True
            return
        else:
            return
        self._apply_camera()

    def handle_mouse_drag(self, dx: float, dy: float) -> None:
        self.controller.rotate(dx, dy)
        self._apply_camera()

    def _apply_camera(self) -> None:
        self.scene = self.scene.with_camera(self.controller.camera())
        self.progressive.trigger_recompute()
        self.timing = ProgressiveTiming()

    def load_gltf(self, path: str) -> None:
        """ContentManager::load_gltf semantics (main.rs:63-72): replace the
        scene, keep the current one on failure, full re-render either way."""
        from ..models.gltf import scene_from_gltf

        try:
            new_scene = scene_from_gltf(path, config=self.config)
        except Exception as e:  # reference formats and continues (main.rs:203-219)
            if self.verbose:
                print(f"Failed to load glTF scene '{path}': {e}")
            return
        self.scene = new_scene
        self.controller = CameraController(new_scene.camera, self.config)
        self.progressive.trigger_recompute()
        self.timing = ProgressiveTiming()

    # ---- frame loop (run_compute + render, main.rs:136-144, 278-286) ----

    def run_compute(self) -> int:
        """Render this frame's share of tiles into the framebuffer.
        Returns the number of tiles rendered (0 once complete — idle frames,
        compute.rs:85-100)."""
        tiles = self.progressive.next_tiles()
        ts = self.config.tile_size
        for t in tiles:
            x0, y0, w, h = self.progressive.tile_rect(t, self.width, self.height)
            # full-tile launch with edge clamping (is_pixel_in_bounds,
            # shader/src/lib.rs:152-163: OOB lanes compute but don't land)
            px = np.minimum(x0 + self._tile_gx, self.width - 1)
            py = np.minimum(y0 + self._tile_gy, self.height - 1)
            with Timer() as timer:
                rgb = render_chunk(
                    self.scene, jnp.asarray(px), jnp.asarray(py),
                    self.width, self.height, shadows=self.shadows,
                    leaf_size=self.config.bvh_leaf_size,
                    use_bvh=self.scene.bvh.num_nodes > 1)
                block_on(rgb)
            self.timing.record_tile(timer.ms)
            tile_img = np.asarray(rgb).reshape(ts, ts, 3)
            self.framebuffer[y0:y0 + h, x0:x0 + w] = tile_img[:h, :w]
        if tiles and self.progressive.complete and self.verbose:
            self.timing.print_summary()
        return len(tiles)

    def frame(self) -> np.ndarray:
        """One event-loop turn: compute + present."""
        self.run_compute()
        self.perf.update_frame_count()
        return self.framebuffer

    def render_to_completion(self, max_frames: int = 100000) -> np.ndarray:
        while not self.progressive.complete and max_frames > 0:
            self.frame()
            max_frames -= 1
        return self.framebuffer

    def fly_through(self, script: list[tuple], frames_per_step: int = 1) -> list[np.ndarray]:
        """Scripted interactive session: script entries are ('key', k) or
        ('mouse', dx, dy). Returns the framebuffer after each step."""
        out = []
        for action in script:
            if action[0] == "key":
                self.handle_key(action[1])
            elif action[0] == "mouse":
                self.handle_mouse_drag(action[1], action[2])
            for _ in range(frames_per_step):
                self.frame()
            out.append(self.framebuffer.copy())
            if self.should_quit:
                break
        return out
