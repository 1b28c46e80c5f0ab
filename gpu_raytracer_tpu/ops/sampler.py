"""Low-discrepancy (quasi-Monte Carlo) sample streams for the path tracer.

The reference draws every stochastic decision from an independent per-pixel
LCG (/root/reference/shader/src/wavefront.rs:44-72 — `SimpleRng` threaded
through the wavefront shader), so its accumulated mean converges as
O(N^-1/2). This module provides an optional replacement for the
`jax.random.uniform(key, (N, 7))` stream in ops/wavefront.py with the same
shape/layout and marginally-uniform values, but stratified across the
SAMPLE index of each pixel:

  u[pixel, s, depth, dim] = frac(alpha_dim * s + rot(pixel, depth, dim))

— a rank-1 lattice advanced in s (the generalised-golden-ratio R_d
additive recurrence, Roberts 2018, "The Unreasonable Effectiveness of
Quasirandom Sequences"), decorrelated across pixels / bounce depths /
dimensions by a Cranley-Patterson rotation drawn from a PCG hash. Each
individual u is uniform on [0,1) (the rotation is equidistributed), so
every estimator stays unbiased; within one pixel the s-sequence of any
dimension equidistributes with O(log N / N) discrepancy, so the
accumulated mean converges near O(N^-1) on the smooth part of the
integrand — measurably lower MSE at the BASELINE config-3 64 spp budget
than the independent stream (see tests/test_sampler.py and the chip
numbers in ARCHITECTURE.md).

All arithmetic is exact wrapping uint32 fixed point (alpha quantised to
alpha_q = round(alpha * 2^32) | 1, odd so the orbit of s -> alpha_q*s has
period 2^32): no float frac() precision loss at large s, and the
uint32 -> f32 mapping (v >> 8) * 2^-24 matches ops/rng.py's LCG mapping
(values in [0, 1), never 1.0).

TPU notes: everything here is elementwise VPU integer work (~8 hashes +
7 fused multiply-adds per lane per depth) — cheaper than the threefry2x32
tree jax.random.uniform runs for the same (N, 7) block, and with no key
management on the host side of the jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _phi(d: int) -> float:
    """Unique positive root of x^(d+1) = x + 1 (phi_1 = golden ratio,
    phi_2 = plastic constant, ...) via Newton iteration."""
    x = 2.0
    for _ in range(64):
        x = x - (x ** (d + 1) - x - 1.0) / ((d + 1) * x ** d - 1.0)
    return x


def _alphas_q(d: int) -> np.ndarray:
    """The R_d lattice generator frac(phi_d^-(k+1)), k=0..d-1, quantised
    to odd uint32 fixed point."""
    phi = _phi(d)
    a = np.array([(1.0 / phi) ** (k + 1) % 1.0 for k in range(d)])
    q = (np.round(a * 2.0 ** 32).astype(np.uint64) | 1) & 0xFFFFFFFF
    return q.astype(np.uint32)


# 7 dims per bounce (ops/wavefront.py u layout: diffuse/fuzz xy, fuzz z,
# fresnel, roulette, channel split, light pick) and a 2-dim pair for the
# pixel AA jitter (R_2 — the plastic-constant sequence, the best-known
# additive recurrence in 2D). Kept as NUMPY arrays: this module is
# imported lazily from inside jitted bodies, and a module-level
# jnp.asarray under an active trace becomes a leaked tracer constant
# (measured: uint32[2] DynamicJaxprTracer escaping the while_loop trace).
N_DIMS = 7
_ALPHA7_Q = _alphas_q(N_DIMS)
_ALPHA2_Q = _alphas_q(2)
# hash salt tag for the jitter "depth" so it never collides with a bounce
JITTER_TAG = np.uint32(0xA11A50)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG output permutation on uint32 (Jarzynski & Olano 2020) —
    a fast, well-mixed elementwise hash."""
    x = x.astype(jnp.uint32)
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) \
        * jnp.uint32(277803737)
    return (x >> jnp.uint32(22)) ^ x


def _to_unit_f32(v: jnp.ndarray) -> jnp.ndarray:
    # same mapping as ops/rng.py lcg_next_f32: [0, 1), never 1.0
    return (v >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1 / (1 << 24))


def qmc_uniforms(pid: jnp.ndarray, s: jnp.ndarray, depth, seed,
                 alphas_q: jnp.ndarray = _ALPHA7_Q) -> jnp.ndarray:
    """[N, d] Cranley-Patterson-rotated lattice uniforms.

    pid   [N] int/uint32 — stable pixel identity (py * width + px): the
          rotation axis. Same pid => same rotation every step, which is
          what makes successive samples of one pixel stratify.
    s     [N] int/uint32 — global sample index of each lane (accumulated
          samples so far + the lane's in-step sample slot).
    depth scalar (python int or traced) — bounce depth; part of the
          rotation hash so depths decorrelate.
    seed  scalar uint32 — per-PathTracer stream seed.
    """
    pid = pid.astype(jnp.uint32)
    s = s.astype(jnp.uint32)
    # depth/seed may be python ints or traced scalars (the XLA fallback's
    # lax.while_loop carries depth as a traced int32)
    d_u = jnp.asarray(depth).astype(jnp.uint32)
    hd = pcg_hash(d_u * jnp.uint32(0x9E3779B9)
                  + jnp.asarray(seed).astype(jnp.uint32))
    h = pcg_hash(pid ^ hd)                       # [N]
    cols = []
    for k in range(alphas_q.shape[0]):
        rot = pcg_hash(h + jnp.uint32((k * 0x85EBCA6B + 0x165667B1)
                                      & 0xFFFFFFFF))
        cols.append(_to_unit_f32(alphas_q[k] * s + rot))
    return jnp.stack(cols, axis=-1)


def qmc_jitter(pid: jnp.ndarray, s: jnp.ndarray, seed) -> jnp.ndarray:
    """[N, 2] pixel-AA jitter: the R_2 lattice in s, rotated per pixel —
    each pixel's sample positions tile its footprint far more evenly than
    independent jitter (the dominant variance term on edge pixels)."""
    return qmc_uniforms(pid, s, JITTER_TAG, seed, alphas_q=_ALPHA2_Q)
