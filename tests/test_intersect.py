"""Intersection math vs the NumPy oracle (random rays, bit-level agreement)."""

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.ops.intersect import (
    MISS_T, aabb_intersect, sphere_intersect, triangle_intersect,
)
from gpu_raytracer_tpu.reference import cpu_tracer as oracle


def _rand_rays(rng, n):
    o = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_sphere_intersect_matches_oracle(rng):
    n = 256
    o, d = _rand_rays(rng, n)
    centers = rng.normal(size=(5, 3)).astype(np.float32)
    radii = rng.uniform(0.2, 1.5, size=5).astype(np.float32)
    t, hit = sphere_intersect(jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(centers), jnp.asarray(radii), 1e30)
    t = np.asarray(t)
    hit = np.asarray(hit)
    for i in range(n):
        for s in range(5):
            t_ref, hit_ref = oracle.sphere_hit(o[i], d[i], centers[s],
                                               float(radii[s]), 1e30)
            assert hit[i, s] == hit_ref, (i, s)
            if hit_ref:
                np.testing.assert_allclose(t[i, s], t_ref, rtol=2e-6)


def test_triangle_intersect_matches_oracle():
    # own deterministic stream: the session-scoped `rng` fixture's state
    # depends on which tests ran before in the same process, and this
    # test's hit-count sanity floor needs a draw that actually produces
    # hits whether the file runs alone (run_tests.py per-file processes)
    # or mid-suite
    rng = np.random.default_rng(97)
    n = 256
    o, d = _rand_rays(rng, n)
    v0 = rng.normal(size=(8, 3)).astype(np.float32)
    v1 = v0 + rng.normal(size=(8, 3)).astype(np.float32)
    v2 = v0 + rng.normal(size=(8, 3)).astype(np.float32)
    e1, e2 = v1 - v0, v2 - v0
    t, hit = triangle_intersect(jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
                                jnp.asarray(e1), jnp.asarray(e2), 1e30)
    t = np.asarray(t)
    hit = np.asarray(hit)
    n_hits = 0
    for i in range(n):
        for k in range(8):
            t_ref, hit_ref = oracle.triangle_hit(o[i], d[i], v0[k], v1[k], v2[k], 1e30)
            assert hit[i, k] == hit_ref, (i, k)
            if hit_ref:
                n_hits += 1
                np.testing.assert_allclose(t[i, k], t_ref, rtol=2e-5)
    assert n_hits > 10  # sanity: the random set actually exercises hits


def test_degenerate_triangle_never_hits():
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0, 0, -1]] * 4, jnp.float32)
    z = jnp.zeros((1, 3))
    t, hit = triangle_intersect(o, d, z, z, z, 1e30)
    assert not np.asarray(hit).any()
    assert (np.asarray(t) == np.asarray(MISS_T)).all()


def test_aabb_slab(rng):
    n = 512
    o, d = _rand_rays(rng, n)
    bmin = np.asarray([-0.5, -0.5, -0.5], np.float32)
    bmax = np.asarray([0.5, 0.5, 0.5], np.float32)
    hit, entry = aabb_intersect(jnp.asarray(o), jnp.asarray(d),
                                jnp.broadcast_to(bmin, (n, 3)),
                                jnp.broadcast_to(bmax, (n, 3)))
    hit = np.asarray(hit)
    # oracle slab test
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        t1 = (bmin - o) * inv
        t2 = (bmax - o) * inv
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        want = (tmax >= 0.0) & (tmin <= tmax)
    np.testing.assert_array_equal(hit, want)
    assert hit.sum() > 5


def test_ray_inside_box_hits():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hit, entry = aabb_intersect(o, d, jnp.asarray([[-1.0, -1, -1]]),
                                jnp.asarray([[1.0, 1, 1]]))
    assert bool(hit[0])
    assert float(entry[0]) <= 0.0
