"""Headline benchmark + correctness record, run on the real TPU chip.

Prints ONE JSON line to stdout. The primary metric keeps the round-1
contract (Mrays/s on the Sponza-scale courtyard at 1080p); the same line
carries the later-round additions as extra keys so every BENCH_r*.json is a
combined perf + correctness record:

  * pathtrace_spp_per_s       — BASELINE config 3: 1024², depth 4, shadowed
                                progressive path tracing (spectral
                                channel-cycled), samples/pixel per second
  * pathtrace_64spp_s         — projected seconds for the full 64 spp config
  * viewer_fps_1080p          — BASELINE config 5: the interactive Viewer
                                loop, camera moving every frame
  * refit_fps_1080p           — per-frame on-device LBVH rebuild + frame
  * textured_mrays_per_s      — BASELINE config 4 class: the SAME courtyard
                                with procedural RGBA8 atlases through the
                                two-phase fused path (textures sampled for
                                real — the reference bound but never read
                                them, /root/reference/shader/src/lib.rs:34-35)
  * parity_fused_vs_xla       — max |fused − chunked-XLA| over a packet of
                                real-Mosaic output (the on-TPU correctness
                                check; CPU tests only exercise interpret mode)
  * parity_deferred_vs_xla    — same for the two-phase textured kernel
                                (+ _mean). Expected ≲1e-1 max / ~1e-3 mean:
                                Mosaic-vs-XLA transcendental rounding moves
                                the nearest-mip LOD boundary ~2e-4 relative,
                                flipping isolated checker pixels; rounds ≤3
                                probed a sky-only corner and printed 0.0
  * gltf_load_s / gltf_parity_vs_procedural — BASELINE config 4 through the
                                ACTUAL loader: the courtyard exported as a
                                .glb, ingested by scene_from_gltf at scale,
                                rendered, compared to the procedurally built
                                scene (VERDICT r3 #3)
  * error                     — "" on success; exception text otherwise

The record ALWAYS reaches stdout (VERDICT r3 #1: round 3's record was lost
to a transient pool outage at backend init): init + first fetch retry with
exponential backoff for BENCH_INIT_MAX_WAIT_S (default 600 s), every metric
key is pre-seeded at 0.0/-1.0, the JSON line is printed from a finally
block, and SIGTERM flushes it early.

Ray accounting uses the reference's throughput definition (BASELINE.md:
1 tile = 128x128 px x 3 channel passes => rays = pixels x 3): the reference
dispatches 3 channel passes per pixel to produce one RGB frame; we produce
the identical frame in one pass, so one benchmark frame counts W*H*3
reference-equivalent rays. vs_baseline is against the 200 Mrays/s/chip
target (BASELINE.json; the reference itself publishes no numbers).

Budget discipline (VERDICT r2 #1): sections run in METRIC-PRIORITY order
(headline → pathtrace → viewer/refit → textured → display/parity), every
section logs absolute elapsed stamps to stderr, the soft budget clock starts
AFTER backend init (the axon tunnel connect can block for many minutes under
pool contention — r2 lost ~20 min there and skipped the flagship sections),
and the persistent compilation cache amortises compiles across rounds.

Extra diagnostics go to stderr only.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the primary/textured/pathtrace compiles cost
# 20-40 s each cold; across driver rounds they are identical programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

_T0 = time.time()


def log(*a):
    print(f"[t={time.time()-_T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def measure_frame(render_fn, fetch_probe, rpc_lat, K=8, reps=3):
    """Best-of burst timing: dispatch K frames, one fetch, subtract the
    tunnel's RPC latency once, divide by K (see memory: block_until_ready
    returns at dispatch under axon; only a value fetch proves execution)."""
    def burst():
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = render_fn()
        fetch_probe(out)
        return (time.perf_counter() - t0 - rpc_lat) / K

    burst()  # warm
    times = [burst() for _ in range(reps)]
    return max(min(times), 1e-5), sorted(times)[len(times) // 2]


def _clear_failed_backends():
    """Drop JAX's cached backend-init FAILURE so the next jax.devices()
    genuinely retries the tunnel instead of replaying the cached error."""
    try:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
        return
    except Exception:
        pass
    try:
        import jax
        jax.clear_backends()
    except Exception:
        pass


def init_device_with_retry(max_wait_s: float):
    """Backend init + first value fetch under bounded exponential backoff.

    Round 3's driver bench died at `jax.devices()` with a transient
    "Unable to initialize backend 'axon': UNAVAILABLE" pool outage and the
    process exited rc=1 with NO JSON line (VERDICT r3 #1). Both the init and
    the pool-admission fetch now retry for up to `max_wait_s`; on final
    failure the caller still emits the JSON record with an error field.
    Returns (jax, jnp, rpc_lat_s)."""
    import jax
    import jax.numpy as jnp

    t0, delay, attempt = time.time(), 5.0, 0
    while True:
        attempt += 1
        try:
            log(f"devices: {jax.devices()}")   # ← backend init happens HERE
            break
        except Exception as e:
            if time.time() - t0 + delay > max_wait_s:
                raise RuntimeError(
                    f"backend init failed after {attempt} attempts / "
                    f"{time.time()-t0:.0f}s: {e}") from e
            log(f"backend init attempt {attempt} failed ({e}); "
                f"retry in {delay:.0f}s")
            time.sleep(delay)
            delay = min(delay * 2, 120.0)
            _clear_failed_backends()

    # RPC latency baseline for the tunneled TPU. The FIRST value fetch is
    # also the pool-admission fence: under contention it can block for many
    # minutes (measured 634 s once) — so the soft-budget clock starts only
    # AFTER it (r2 lost ~20 min this way and skipped the flagship sections).
    @jax.jit
    def _trivial(x):
        return x + 1

    while True:
        try:
            t0f = time.time()
            float(_trivial(jnp.float32(0)))
            log(f"first device round-trip (pool admission): "
                f"{time.time()-t0f:.1f}s")
            break
        except Exception as e:
            if time.time() - t0 + delay > max_wait_s:
                raise RuntimeError(f"first device fetch failed: {e}") from e
            log(f"first fetch failed ({e}); retry in {delay:.0f}s")
            time.sleep(delay)
            delay = min(delay * 2, 120.0)
            _clear_failed_backends()

    t0 = time.perf_counter()
    for _ in range(5):
        float(_trivial(jnp.float32(0)))
    rpc_lat = (time.perf_counter() - t0) / 5
    log(f"RPC fetch latency: {rpc_lat*1e3:.1f}ms")
    return jax, jnp, rpc_lat


def main():
    # The record ALWAYS reaches stdout — pre-seeded metrics, one json.dumps
    # in the finally block, and a SIGTERM flush (a driver-bounded run that
    # gets terminated mid-section still reports what it measured).
    result = {
        "metric": "primary_mrays_per_s_courtyard100k_1080p",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "pathtrace_spp_per_s": 0.0,
        "pathtrace_64spp_s": 0.0,
        "viewer_fps_1080p": 0.0,
        "refit_fps_1080p": 0.0,
        "pathtrace_fly_fps": 0.0,
        "pathtrace_present_ms": 0.0,
        "pathtrace_stream_fps": 0.0,
        "textured_mrays_per_s": 0.0,
        "pathtrace_textured_spp_per_s": 0.0,
        "textured_scale_mrays_per_s": 0.0,   # >=32-mat/16-tex zoo via GLB
        "textured_scale_mats": 0,
        "textured_scale_texs": 0,
        "gltf_load_s": 0.0,
        "gltf_parity_vs_procedural": -1.0,
        "parity_fused_vs_xla": -1.0,
        "parity_deferred_vs_xla": -1.0,
        "parity_deferred_vs_xla_mean": -1.0,
        "rmse_vs_oracle": -1.0,              # chip render vs the CPU oracle
        # cold-start observability (VERDICT r4 #9): compile+first-frame
        # seconds per pipeline — near-zero when the persistent cache is warm
        "compile_s_primary": 0.0,
        "compile_s_pathtrace": 0.0,
        "compile_s_textured": 0.0,
        "compile_s_fly": 0.0,
        # geometry-shard A/B controls (VERDICT r4 #4): the same ray set
        # unsharded on the production trace, and sharded sorted/unsorted
        "shard_unsharded_ms": 0.0,
        "shard_sorted_ms": 0.0,
        "shard_unsorted_ms": 0.0,
        "shard_overhead_x": 0.0,
        "error": "",
    }
    emitted = []

    def emit():
        if not emitted:
            emitted.append(True)
            print(json.dumps(result), flush=True)

    import signal

    def on_term(signum, frame):
        result["error"] = result["error"] or f"terminated by signal {signum}"
        log(f"signal {signum}: flushing bench record")
        emit()
        os._exit(3)

    try:
        signal.signal(signal.SIGTERM, on_term)
    except Exception:
        pass

    try:
        _run(result)
    except BaseException as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        result["error"] = (result["error"] + "; " if result["error"] else
                           "") + f"{type(e).__name__}: {e}"
    finally:
        emit()


def _run(result):
    # BENCH_SMOKE=1 shrinks every section (resolution, triangle count, burst
    # length) so the WHOLE record path — including the GLB export→load and
    # textured-pathtrace sections — executes in minutes on the CPU backend.
    # Used to pre-flight the driver run; the emitted JSON keeps its shape.
    SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")

    jax, jnp, rpc_lat = init_device_with_retry(
        float(os.environ.get("BENCH_INIT_MAX_WAIT_S", 600)))

    try:  # amortise compiles across rounds (harmless if unsupported)
        # the env var alone is too late: the axon sitecustomize imports jax
        # before this file runs, so set the config directly too
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from gpu_raytracer_tpu import RaytracerConfig, Renderer
    from gpu_raytracer_tpu.utils.procgen import (
        courtyard_source_images, make_courtyard_scene)

    W, H = (512, 384) if SMOKE else (1920, 1080)
    NTRI = 5_000 if SMOKE else 100_000
    PTRES = 256 if SMOKE else 1024
    MK, MR = (2, 1) if SMOKE else (8, 3)      # measure_frame burst/reps
    # Reference-class texture volume for the textured/GLB sections
    # (VERDICT r3 #3: the loader must ingest a >=16-MTexel GLB):
    # 4096^2 floor + 2x2048^2 boxes = 25.2 MTexel.
    TEXSIZE = 256 if SMOKE else 4096
    SB = 1 if SMOKE else 5                     # pathtrace spp-burst reps
    # (5 reps ~1.5 s extra: a better min estimate under pool load — the
    # 64-spp projection is min-of-bursts and the pool shows ~2.5x variance)
    VK, VR = (2, 1) if SMOKE else (8, 3)       # viewer loop frames/reps
    RFI = 2 if SMOKE else 4                    # refit iterations
    n = W * H
    config = RaytracerConfig()

    # Soft deadline for the OPTIONAL sections: the headline metric must
    # reach stdout even if the driver bounds the bench run.
    start_time = time.time()
    BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1320))

    def over_budget(section):
        dt = time.time() - start_time
        if dt > BUDGET_S:
            log(f"SKIP {section}: {dt:.0f}s over {BUDGET_S:.0f}s soft budget")
            return True
        return False

    # ---- 1. primary headline: untextured courtyard, single-phase fused ----
    t0 = time.time()
    scene = make_courtyard_scene(target_triangles=NTRI, seed=0,
                                 config=config)
    log(f"scene: {scene.num_triangles} tris, {scene.bvh.num_nodes} nodes "
        f"({time.time()-t0:.1f}s build)")
    renderer = Renderer(scene, W, H, config=config)
    t0 = time.time()
    fb = renderer.render_device()
    float(fb[-1, 0])
    result["compile_s_primary"] = round(time.time() - t0, 1)
    log(f"primary compile+first frame: {result['compile_s_primary']}s")
    best, med = measure_frame(renderer.render_device,
                              lambda fb: float(fb[-1, 0]), rpc_lat,
                              K=MK, reps=MR)
    mrays = n * 3 / best / 1e6
    log(f"primary: best={best*1e3:.1f}ms median={med*1e3:.1f}ms "
        f"-> {mrays:.1f} Mrays/s (ref-equiv)")
    result["value"] = round(mrays, 2)
    result["vs_baseline"] = round(mrays / 200.0, 4)

    # ---- 2. path tracing (BASELINE config 3): 1024², depth 4, shadows ----
    try:
        if over_budget("pathtrace"):
            raise TimeoutError("budget")
        from gpu_raytracer_tpu.engine.pathtracer import PathTracer

        # SAME scene object as the headline (scene reuse: VERDICT r2 #1)
        pt = PathTracer(scene, PTRES, PTRES, config=config, spectral=True,
                        shadows=True, antialias=True,
                        samples_per_step=config.pathtrace_samples_per_step)
        t0 = time.time()
        pt.step()
        float(pt.accum[-1, 0])
        result["compile_s_pathtrace"] = round(time.time() - t0, 1)
        log(f"pathtrace compile+first step: {result['compile_s_pathtrace']}s "
            f"({pt.samples_per_step} spp/step)")

        def spp_burst(k=2):
            t0 = time.perf_counter()
            for _ in range(k):
                pt.step()
            float(pt.accum[-1, 0])
            return ((time.perf_counter() - t0 - rpc_lat)
                    / (k * pt.samples_per_step))

        spp_burst(1)
        spp_t = min(spp_burst() for _ in range(SB))
        spp_per_s = 1.0 / spp_t
        log(f"pathtrace: {spp_t*1e3:.0f}ms/spp -> {spp_per_s:.2f} spp/s, "
            f"64 spp in {64*spp_t:.1f}s")
        result["pathtrace_spp_per_s"] = round(spp_per_s, 3)
        result["pathtrace_64spp_s"] = round(64 * spp_t, 1)
        # sampler provenance: qmc (the default) is chip-measured
        # cost-neutral vs rng with 0.72x the 64-spp MSE (courtyard) —
        # see ARCHITECTURE.md round-4 changes
        result["pathtrace_sampler"] = pt.sampler
    except Exception as e:
        log(f"PATHTRACE BENCH FAILED: {type(e).__name__}: {e}")
        result["pathtrace_spp_per_s"] = 0.0

    # ---- 3. interactive loop (BASELINE config 5): Viewer frame rate at
    # 1080p, camera moving every frame, plus per-frame on-device BVH refit
    # with animated geometry — both measured through the SAME Viewer that
    # embodies the reference's event loop (src/main.rs:278-286) ----
    try:
        if over_budget("viewer/refit"):
            raise TimeoutError("budget")
        from gpu_raytracer_tpu.engine.viewer import Viewer

        v = Viewer(scene, W, H, config=config, shadows=True, verbose=False)
        t0 = time.time()
        v.run_compute()
        float(v._fb_dev[-1, 0] if v._fb_dev is not None
              else v._fb_host[-1, -1, 0])
        log(f"viewer first frame: {time.time()-t0:.1f}s")

        def vloop(k=8):
            t0 = time.perf_counter()
            for i in range(k):
                v.handle_key("w" if i % 2 == 0 else "s")  # camera moves
                v.run_compute()
            fb = v._fb_dev if v._fb_dev is not None else None
            if fb is not None:
                float(fb[-1, 0])
            return (time.perf_counter() - t0 - rpc_lat) / k

        vloop(1 if SMOKE else 2)
        vt = min(vloop(VK) for _ in range(VR))
        result["viewer_fps_1080p"] = round(1.0 / vt, 1)
        log(f"viewer loop: {vt*1e3:.1f}ms/frame -> "
            f"{result['viewer_fps_1080p']} FPS (camera moving, shadows)")

        base_v = np.asarray(scene.mesh.vertices)
        t0 = time.time()
        v.update_geometry(base_v)       # compile the refit pipeline once
        v.run_compute()
        if v._fb_dev is not None:
            float(v._fb_dev[-1, 0])
        log(f"refit compile+first frame: {time.time()-t0:.1f}s")
        t_ref = time.perf_counter()
        for i in range(RFI):
            off = np.zeros(3, np.float32)
            off[1] = 0.05 * (i + 1)
            v.update_geometry(base_v + off)
            v.run_compute()
        if v._fb_dev is not None:
            float(v._fb_dev[-1, 0])
        rt = (time.perf_counter() - t_ref - rpc_lat) / RFI
        result["refit_fps_1080p"] = round(1.0 / rt, 1)
        log(f"refit loop (device LBVH rebuild + frame): {rt*1e3:.1f}ms -> "
            f"{result['refit_fps_1080p']} FPS")

        # ---- 3b. path-traced fly-through at 1024² (flagship
        # interactivity): every moving frame is ONE fused dispatch —
        # temporal warp + interleaved 1/m sample step + à-trous
        # reconstruction (PathTracer.fly_frame; the r4 three-dispatch
        # pipeline paid a tunnel RPC per stage AND a full-frame wavefront
        # step). Default interleave 8: 1/8 of the pixels re-sampled per
        # frame, history + denoiser reconstruct the rest (bounded-quality
        # test: tests/test_interleave.py). ----
        vp = Viewer(scene, PTRES, PTRES, config=config, shadows=True,
                    verbose=False)
        vp.handle_key("p")              # path-trace mode (temporal+denoise)
        vp.fly_interleave = 8
        t0 = time.time()
        vp.run_compute()                # static step+denoise compile
        _ = vp.framebuffer_u8
        for k in "dadaw":               # compile every interleave phase +
            vp.handle_key(k)            # both warp variants
            vp.run_compute()
        _ = vp.framebuffer_u8
        result["compile_s_fly"] = round(time.time() - t0, 1)
        log(f"pathtrace-fly compile+first frames: "
            f"{result['compile_s_fly']}s")
        PFK = 3 if SMOKE else 6

        def fly_burst(k=PFK):
            # burst-dispatch k fused frames, ONE value fetch at the end
            # (only a fetch proves execution under the axon tunnel)
            t0 = time.perf_counter()
            for i in range(k):
                vp.handle_key("d" if i % 2 == 0 else "a")
                vp.run_compute()
            float(np.asarray(vp._fb_dev.ravel()[0]))
            return (time.perf_counter() - t0 - rpc_lat) / k

        fly_burst(2)
        pf = max(min(fly_burst() for _ in range(1 if SMOKE else 3)), 1e-4)
        result["pathtrace_fly_fps"] = round(1.0 / pf, 1)
        log(f"pathtrace fly-through (fused warp+1/8-interleave+denoise, "
            f"{PTRES}²): {pf*1e3:.0f}ms/frame -> "
            f"{result['pathtrace_fly_fps']} FPS")
        t0 = time.perf_counter()
        _ = vp.framebuffer_u8           # device-quantised u8 RGB readback
        pp = time.perf_counter() - t0
        result["pathtrace_present_ms"] = round(pp * 1e3, 1)
        log(f"pathtrace u8 present readback ({PTRES}²): {pp*1e3:.0f}ms "
            f"(tunnel-bound; the packed present below halves it)")

        # ---- 3c. pipelined STREAM cadence (the server/window present
        # path): frame N-1's readback overlaps frame N's compute
        # (Viewer.present_frame_packed double-buffering, YUV 4:2:0 —
        # 1.5 bytes/px through the dev tunnel) — fully presented frames,
        # not just compute cadence ----
        pending = None
        sts = []
        for i in range(2 * PFK):
            t0 = time.perf_counter()
            vp.handle_key("d" if i % 2 == 0 else "a")
            vp.run_compute()
            nxt = vp.present_frame_packed()
            _ = vp.materialize_frame(pending if pending is not None
                                     else nxt)
            pending = nxt
            sts.append(time.perf_counter() - t0)
        sf = max(sorted(sts)[len(sts) // 2], 1e-4)
        result["pathtrace_stream_fps"] = round(1.0 / sf, 1)
        log(f"pathtrace PRESENTED stream, pipelined YUV420 ({PTRES}²): "
            f"{sf*1e3:.0f}ms/frame -> {result['pathtrace_stream_fps']} FPS "
            f"(frames: {', '.join(f'{t*1e3:.0f}' for t in sorted(sts))} ms)")
    except Exception as e:
        log(f"VIEWER BENCH FAILED: {type(e).__name__}: {e}")
        result["viewer_fps_1080p"] = 0.0

    # ---- 4. textured courtyard (BASELINE config 4 class), two-phase ----
    tex_scene = None
    tex_images = None
    try:
        if over_budget("textured"):
            raise TimeoutError("budget")
        t0 = time.time()
        tex_scene = make_courtyard_scene(target_triangles=NTRI, seed=0,
                                         config=config, textured=True,
                                         texture_size=TEXSIZE)
        # built ONCE and reused for the log + GLB export below: each
        # rebuild regenerates the rng-heavy 25-MTexel set (seconds of CPU)
        tex_images = courtyard_source_images(0, texture_size=TEXSIZE)
        mtex = sum(i.shape[0] * i.shape[1] for i in tex_images)
        log(f"textured scene build: {time.time()-t0:.1f}s "
            f"({mtex/1e6:.1f} MTexel source set)")
        tex_renderer = Renderer(tex_scene, W, H, config=config)
        assert tex_renderer._use_deferred(), "textured scene must stay fused"
        t0 = time.time()
        fb = tex_renderer.render_device()
        float(fb[-1, 0])
        result["compile_s_textured"] = round(time.time() - t0, 1)
        log(f"textured compile+first frame: "
            f"{result['compile_s_textured']}s")
        tbest, tmed = measure_frame(tex_renderer.render_device,
                                    lambda fb: float(fb[-1, 0]), rpc_lat,
                                    K=MK, reps=MR)
        tmrays = n * 3 / tbest / 1e6
        log(f"textured: best={tbest*1e3:.1f}ms median={tmed*1e3:.1f}ms "
            f"-> {tmrays:.1f} Mrays/s (ref-equiv)")
        result["textured_mrays_per_s"] = round(tmrays, 2)
    except Exception as e:  # keep the primary metric alive no matter what
        log(f"TEXTURED BENCH FAILED: {type(e).__name__}: {e}")
        result["textured_mrays_per_s"] = 0.0

    # ---- 4b. TEXTURED path tracing: the fused bounce's in-kernel matmul
    # material lookup + atlas sampling (config 4 content meets config 3) ----
    try:
        if tex_scene is None or over_budget("textured pathtrace"):
            raise TimeoutError("budget")
        from gpu_raytracer_tpu.engine.pathtracer import PathTracer

        ptt = PathTracer(tex_scene, PTRES, PTRES, config=config,
                         spectral=True, shadows=True,
                         samples_per_step=config.pathtrace_samples_per_step)
        t0 = time.time()
        ptt.step()
        float(ptt.accum[-1, 0])
        log(f"textured pathtrace compile+first step: {time.time()-t0:.1f}s")

        def spp_burst_t(k=2):
            t0 = time.perf_counter()
            for _ in range(k):
                ptt.step()
            float(ptt.accum[-1, 0])
            return ((time.perf_counter() - t0 - rpc_lat)
                    / (k * ptt.samples_per_step))

        tspp = min(spp_burst_t() for _ in range(1 if SMOKE else 2))
        log(f"textured pathtrace: {tspp*1e3:.0f}ms/spp, "
            f"64 spp in {64*tspp:.1f}s")
        result["pathtrace_textured_spp_per_s"] = round(1.0 / tspp, 3)
    except Exception as e:
        log(f"TEXTURED PATHTRACE BENCH FAILED: {type(e).__name__}: {e}")
        result["pathtrace_textured_spp_per_s"] = 0.0

    # ---- 4c. BASELINE config 4 through the ACTUAL glTF loader (VERDICT r3
    # #3): export the SAME 100k-tri textured courtyard as a real .glb, ingest
    # it with scene_from_gltf (GLB chunks → accessors → PNG decode → dedup →
    # BVH → atlas), render it fused, and compare against the procedurally
    # built scene. Matches /root/reference/src/gltf_loader.rs:55-125 at the
    # asset scale the reference targets. ----
    try:
        if (tex_scene is None or tex_images is None
                or over_budget("gltf loader at scale")):
            raise TimeoutError("budget")
        import tempfile

        from gpu_raytracer_tpu.models.gltf import scene_from_gltf
        from gpu_raytracer_tpu.models.gltf_export import export_glb

        glb_path = os.path.join(tempfile.gettempdir(), "courtyard_bench.glb")
        t0 = time.time()
        export_glb(tex_scene, glb_path, images=tex_images)
        log(f"GLB export: {time.time()-t0:.1f}s, "
            f"{os.path.getsize(glb_path)/1e6:.1f} MB")
        t0 = time.time()
        gscene = scene_from_gltf(glb_path, config=config)
        load_s = time.time() - t0
        result["gltf_load_s"] = round(load_s, 2)
        log(f"glTF load → Scene (GLB+PNG decode, dedup, BVH, atlas): "
            f"{load_s:.1f}s, {gscene.num_triangles} tris")
        gren = Renderer(gscene, W, H, config=config)
        assert gren._use_deferred(), "gltf-loaded scene must stay fused"
        fbg = gren.render_device()
        float(fbg[-1, 0])
        gbest, _ = measure_frame(gren.render_device,
                                 lambda fb: float(fb[-1, 0]), rpc_lat,
                                 K=min(MK, 4), reps=min(MR, 2))
        log(f"gltf-loaded textured frame: {gbest*1e3:.1f}ms -> "
            f"{n*3/gbest/1e6:.1f} Mrays/s")
        fbp = tex_renderer.render_device()   # same pixel order by layout
        diff = float(jnp.abs(gren.render_device() - fbp).max())
        result["gltf_parity_vs_procedural"] = diff
        log(f"gltf-loaded vs procedural parity: {diff:.2e}")
    except Exception as e:
        log(f"GLTF-AT-SCALE BENCH FAILED: {type(e).__name__}: {e}")

    # ---- 4d. texture/material-COUNT scale (VERDICT r4 #8): a 48-material
    # / 24-texture zoo (MR + spec-gloss workflows, base/mr/occlusion/
    # emissive maps) through the ACTUAL GLB writer+loader, rendered on the
    # one-hot-matmul material path whose unbounded-M claim this proves ----
    try:
        if over_budget("texture/material scale"):
            raise TimeoutError("budget")
        import tempfile

        from gpu_raytracer_tpu.models.gltf import scene_from_gltf
        from gpu_raytracer_tpu.models.gltf_export import export_glb
        from gpu_raytracer_tpu.utils.procgen import (make_zoo_scene,
                                                     zoo_source_images)

        ZN = 8_000 if SMOKE else 60_000
        zscene = make_zoo_scene(ZN, n_mats=48, n_texs=24, seed=0,
                                config=config)
        zpath = os.path.join(tempfile.gettempdir(), "zoo_bench.glb")
        export_glb(zscene, zpath, images=zoo_source_images(24, 0))
        zloaded = scene_from_gltf(zpath, config=config)
        result["textured_scale_mats"] = int(zloaded.materials.count)
        result["textured_scale_texs"] = int(zloaded.textures.count)
        zren = Renderer(zloaded, W, H, config=config)
        assert zren._use_deferred(), "zoo scene must ride the fused path"
        fbz = zren.render_device()
        float(fbz[-1, 0])
        zbest, _ = measure_frame(zren.render_device,
                                 lambda fb: float(fb[-1, 0]), rpc_lat,
                                 K=min(MK, 4), reps=min(MR, 2))
        zmrays = n * 3 / zbest / 1e6
        result["textured_scale_mrays_per_s"] = round(zmrays, 2)
        log(f"texture/material scale (48 mats / 24 texs via GLB loader): "
            f"{zbest*1e3:.1f}ms -> {zmrays:.1f} Mrays/s")
    except Exception as e:
        log(f"TEXTURE/MATERIAL SCALE BENCH FAILED: {type(e).__name__}: {e}")

    # ---- 5. display path + on-TPU parity (nice-to-haves, run last) ----
    try:
        if over_budget("display/parity"):
            raise TimeoutError("budget")
        renderer.render_u8()                 # compile warm-up
        t0 = time.perf_counter()
        renderer.render_u8()
        log(f"display path (u8 + readback, warm): "
            f"{(time.perf_counter()-t0)*1e3:.1f}ms")

        from gpu_raytracer_tpu.engine.renderer import render_chunk
        from gpu_raytracer_tpu.ops.pallas.render import (
            pallas_render_deferred, pallas_render_primary)
        from gpu_raytracer_tpu.ops.packet_trace import tiled_pixel_order

        # one 8192-ray packet, CENTRED on the frame: the top-left corner is
        # pure sky at 1080p, which made earlier rounds' deferred parity a
        # vacuous 0.0 — the centre sees lit, textured, mip-mapped content.
        # Expectation: fused ~1e-6; deferred mean ~1e-3 with isolated ~4e-2
        # pixels where a nearest-mip LEVEL flips on checker content (Mosaic
        # VPU vs XLA transcendental rounding shifts the LOD boundary by
        # ~2e-4 relative — see ARCHITECTURE.md round-4 notes).
        px, py = tiled_pixel_order(128, 64, 64)
        px, py = jnp.asarray(px) + (W - 128) // 2, jnp.asarray(py) + (H - 64) // 2
        ref = np.asarray(render_chunk(scene, px, py, W, H, shadows=True,
                                      use_bvh=True, leaf_size=8))
        got = np.asarray(pallas_render_primary(scene, px, py, W, H,
                                               shadows=True))
        result["parity_fused_vs_xla"] = float(np.abs(got - ref).max())
        log(f"on-TPU parity: fused {result['parity_fused_vs_xla']:.2e}")
        if tex_scene is not None:
            refT = np.asarray(render_chunk(tex_scene, px, py, W, H,
                                           shadows=True, use_bvh=True,
                                           leaf_size=8))
            gotT = np.asarray(pallas_render_deferred(tex_scene, px, py, W, H,
                                                     shadows=True))
            dT = np.abs(gotT - refT)
            result["parity_deferred_vs_xla"] = float(dT.max())
            result["parity_deferred_vs_xla_mean"] = float(dT.mean())
            log(f"on-TPU parity: deferred max "
                f"{result['parity_deferred_vs_xla']:.2e} / mean "
                f"{result['parity_deferred_vs_xla_mean']:.2e}")
    except Exception as e:
        log(f"PARITY CHECK FAILED: {type(e).__name__}: {e}")
        pass  # parity keys pre-seeded at -1.0

    try:
        if over_budget("oracle rmse"):
            raise TimeoutError("budget")
        # chip vs the CPU ORACLE, directly (VERDICT r4 #1b): a small
        # default-scene frame rendered on the chip RMSE'd against the
        # NumPy port of the reference's shading
        # (gpu_raytracer_tpu/reference/cpu_tracer.py) — closes the
        # fidelity chain without the transitive chip==XLA==CPU==oracle
        # inference. Oracle semantics: no shadow rays (the reference
        # never traces them, SURVEY lighting row).
        from gpu_raytracer_tpu import build_default_scene, render_image
        from gpu_raytracer_tpu.reference import cpu_tracer
        from gpu_raytracer_tpu.utils.image import rmse

        dsc = build_default_scene()
        OW = OH = 32 if SMOKE else 48
        chip_img = render_image(dsc, OW, OH, shadows=False)
        oracle_img = cpu_tracer.render(cpu_tracer.scene_dict_from(dsc),
                                       OW, OH)
        result["rmse_vs_oracle"] = float(rmse(chip_img, oracle_img))
        log(f"chip vs CPU oracle RMSE ({OW}x{OH} default scene): "
            f"{result['rmse_vs_oracle']:.2e}")
    except Exception as e:
        log(f"ORACLE RMSE FAILED: {type(e).__name__}: {e}")

    # ---- 6. geometry sharding A/B (single chip, 1-device mesh): the
    # Pallas per-shard path vs the XLA lockstep path it replaced ----
    try:
        if over_budget("geometry-shard A/B"):
            raise TimeoutError("budget")
        from gpu_raytracer_tpu.parallel.mesh import make_mesh
        from gpu_raytracer_tpu.parallel.shard import (
            GeometryShards, trace_geometry_sharded,
            trace_geometry_sharded_ring)
        from gpu_raytracer_tpu.ops.camera_rays import generate_rays

        from gpu_raytracer_tpu.ops.trace import trace as trace_single

        mesh1 = make_mesh(1)
        shards = GeometryShards(scene, 1)
        ab_n = 16 * 1024 if SMOKE else 256 * 1024
        pyg = np.random.default_rng(0)
        o = jnp.asarray(pyg.uniform(-40, 40, (ab_n, 3)).astype(np.float32))
        tg = jnp.asarray(pyg.uniform(-20, 20, (ab_n, 3)).astype(np.float32))
        d = tg - o
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

        def time_trace(fn):
            hitr = fn()
            float(hitr.t[0])
            t0 = time.perf_counter()
            for _ in range(2):
                hitr = fn()
            float(hitr.t[0])
            return (time.perf_counter() - t0 - rpc_lat) / 2

        # UNSHARDED CONTROL on the IDENTICAL (incoherent) ray set
        # (VERDICT r4 #4): the production single-chip trace — shard
        # overhead is meaningless without it
        ut = time_trace(lambda: trace_single(scene, o, d, leaf_size=8))
        result["shard_unsharded_ms"] = round(ut * 1e3, 1)
        log(f"geometry-shard CONTROL [unsharded production trace]: "
            f"{ut*1e3:.1f}ms for {ab_n/1e3:.0f}k rays -> "
            f"{ab_n/ut/1e6:.1f} Mrays/s")
        for name, fn_, up, srt in (
                ("pallas+sort", trace_geometry_sharded, True, True),
                ("pallas", trace_geometry_sharded, True, False),
                ("xla", trace_geometry_sharded, False, False),
                ("ring+sort", trace_geometry_sharded_ring, True, True)):
            dt = time_trace(lambda: fn_(scene, o, d, mesh1, shards=shards,
                                        use_pallas=up, sort=srt))
            log(f"geometry-shard trace [{name}]: {dt*1e3:.1f}ms for "
                f"{ab_n/1e3:.0f}k rays -> {ab_n/dt/1e6:.1f} Mrays/s")
            if name == "pallas+sort":
                result["shard_sorted_ms"] = round(dt * 1e3, 1)
            elif name == "pallas":
                result["shard_unsorted_ms"] = round(dt * 1e3, 1)
        if result["shard_sorted_ms"] and result["shard_unsharded_ms"]:
            result["shard_overhead_x"] = round(
                result["shard_sorted_ms"] / result["shard_unsharded_ms"], 2)
            log(f"shard overhead (sorted sharded / unsharded, D=1): "
                f"{result['shard_overhead_x']}x")
    except Exception as e:
        log(f"GEOMETRY-SHARD A/B FAILED: {type(e).__name__}: {e}")

    log(f"total bench wall-clock: {time.time()-start_time:.1f}s "
        f"(+{start_time-_T0:.1f}s backend init)")


if __name__ == "__main__":
    main()
