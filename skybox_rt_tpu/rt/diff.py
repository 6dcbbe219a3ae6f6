"""Differentiable ray tracing (north-star configs 2-4: pixel gradients
through the RT path w.r.t. vertex positions and materials).

Policy (the RT analog of diff/pipeline's discrete-step policy):
  * WHICH primitive a ray hits is discrete — the BVH traversal runs under
    stop_gradient and returns prim ids only
  * WHERE it hits is continuous — t, u, v are *recomputed* from the winning
    primitive with the closed-form Möller–Trumbore solve, so gradients flow
    to ray origin/direction and to the triangle vertices
  * silhouette (visibility) gradients are out of scope for the hard path,
    exactly as in the raster pipeline's hard-coverage mode; finite-diff
    validation excludes pixels whose winner changes

This mirrors how diff/pipeline reuses the binning winner: discrete
selection forward-exact, continuous attributes differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bvh as bvh_mod
from . import intersect

F32 = jnp.float32


def solve_hit(o, d, v0, e1, e2):
    """Differentiable Möller–Trumbore solve for known-hit pairs.

    o, d, v0, e1, e2: (..., 3).  Returns (t, u, v); no validity checks —
    callers mask with the traversal's hit mask."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t, u, v


def closest_hit_diff(verts, faces, o, d, bvh_arrays=None,
                     t_min=1e-4, t_max=jnp.inf,
                     leaf_size=bvh_mod.LEAF_SIZE):
    """Differentiable closest hit.

    verts: (V, 3) traced (gradients flow); faces: (P, 3) static int.
    Returns (prim (R,) i32 stop-grad, t, u, v differentiable).
    Uses the BVH when bvh_arrays given (pass leaf_size=bvh.leaf_size when
    the tree was built with a non-default capacity), else brute force
    (also fine for grads since prim selection is detached either way)."""
    tri = intersect.triangle_arrays(verts, faces)
    tri_ng = tuple(jax.lax.stop_gradient(a) for a in tri)
    o_ng = jax.lax.stop_gradient(o)
    d_ng = jax.lax.stop_gradient(d)

    if bvh_arrays is not None:
        prim, _, _, _ = bvh_mod.closest_hit(bvh_arrays, tri_ng, o_ng, d_ng,
                                            t_min, t_max,
                                            leaf_size=leaf_size)
    else:
        prim, _, _, _ = intersect.closest_hit_bruteforce(
            o_ng, d_ng, *tri_ng, t_min, t_max)

    p = jnp.maximum(prim, 0)
    v0, e1, e2 = (a[p] for a in tri)
    t, u, v = solve_hit(o, d, v0, e1, e2)
    hit = prim >= 0
    return (prim,
            jnp.where(hit, t, jnp.inf),
            jnp.where(hit, u, 0.0),
            jnp.where(hit, v, 0.0))


def render_depth(verts, faces, o, d, bvh_arrays=None, background=0.0):
    """Minimal differentiable RT image: hit distance per ray (the quantity
    inverse-geometry losses use).  Returns (R,) f32."""
    prim, t, u, v = closest_hit_diff(verts, faces, o, d, bvh_arrays)
    return jnp.where(prim >= 0, t, background)


def render_lambert_smooth(verts, faces, normals, vert_colors, o, d,
                          light_dir, bvh_arrays=None, ambient=0.1,
                          background=(0., 0., 0.)):
    """Differentiable RT with interpolated vertex normals: gradients flow
    to `normals` (the north-star 'grads w.r.t. normals' axis), to verts
    (hit position + barycentrics), and to vert_colors."""
    prim, t, u, v = closest_hit_diff(verts, faces, o, d, bvh_arrays)
    hit = prim >= 0
    p = jnp.maximum(prim, 0)
    f = faces[p]
    w = (1.0 - u - v)

    def interp(a):
        return (a[f[:, 0]] * w[:, None] + a[f[:, 1]] * u[:, None]
                + a[f[:, 2]] * v[:, None])

    albedo = interp(vert_colors)[:, :3]
    n = interp(normals)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)

    l = jnp.asarray(light_dir, F32)
    l = l / jnp.linalg.norm(l)
    ndotl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    rgb = albedo * (ambient + ndotl[:, None])
    return jnp.where(hit[:, None], rgb, jnp.asarray(background, F32))


def render_lambert(verts, faces, vert_colors, o, d, light_dir,
                   bvh_arrays=None, ambient=0.1, background=(0., 0., 0.)):
    """Differentiable Lambert-shaded RT render.

    Gradients flow to verts (through hit position, geometric normal, and
    barycentrics) and to vert_colors (through interpolation).
    Returns (R, 3) float32."""
    prim, t, u, v = closest_hit_diff(verts, faces, o, d, bvh_arrays)
    hit = prim >= 0
    p = jnp.maximum(prim, 0)

    f = faces[p]
    c0, c1, c2 = (vert_colors[f[:, k]] for k in range(3))
    w = (1.0 - u - v)
    albedo = (c0 * w[:, None] + c1 * u[:, None] + c2 * v[:, None])[:, :3]

    v0, v1, v2 = (verts[f[:, k]] for k in range(3))
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)

    l = jnp.asarray(light_dir, F32)
    l = l / jnp.linalg.norm(l)
    ndotl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    rgb = albedo * (ambient + ndotl[:, None])
    return jnp.where(hit[:, None], rgb, jnp.asarray(background, F32))
