"""Differentiable float32 render pipeline.

The exact-int path (skybox_rt_tpu.ref) reproduces the reference bit-for-bit
but is non-differentiable by construction.  This module is the gradient
twin: same architecture (host binning -> per-tile primitive scan -> output
merge), but all math in float32 with gradients flowing to

  * vertex positions   (through edge functions and barycentrics)
  * vertex colors      (through interpolation)
  * texture coordinates and texels (through bilinear sampling)

This covers the north-star inverse-rendering config (pixel grads w.r.t.
vertex pos / material+texture params, BASELINE.json configs[3]).  The
reference has no backward pass, so gradients are validated against finite
differences (tests/test_diff.py), per SURVEY §7 "differentiating discrete
steps".

Discrete-step policy (v1):
  * coverage: hard in forward; optional sigmoid edge softening contributes
    silhouette gradients when ``soft_edge_temp > 0`` (the classic
    soft-rasterizer trick, applied as a residual weight so the forward
    image stays hard when temp == 0)
  * depth test: hard winner; gradients flow through the winning fragment
    (straight-through)
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class DiffRenderConfig:
    width: int
    height: int
    tile_logsize: int = 5
    near: float = 0.0
    far: float = 1.0
    depth_test: bool = True
    alpha_blend: bool = False      # src*a + dst*(1-a) over-compositing
    textured: bool = False
    modulate: bool = False         # multiply texture by vertex color
    soft_edge_temp: float = 0.0    # 0 = hard coverage
    background: tuple = (0.0, 0.0, 0.0, 1.0)


def clip_to_hdc(pos, cfg: DiffRenderConfig):
    """Differentiable clip -> homogeneous device coords (transform.py twin)."""
    half_w = 0.5 * cfg.width
    half_h = 0.5 * cfg.height
    x = pos[..., 0] * half_w + pos[..., 3] * half_w
    y = pos[..., 1] * half_h + pos[..., 3] * half_h
    w = pos[..., 3]
    return x, y, w


def screen_z(pos, cfg: DiffRenderConfig):
    half_d = 0.5 * (cfg.far - cfg.near)
    return pos[..., 2] / pos[..., 3] * half_d + (cfg.near + half_d)


def edge_matrix(p0, p1, p2):
    """Edge equations from HDC positions (differentiable edge_equation twin).

    p*: tuples (x, y, w) of (P,) arrays.  Returns (P, 3, 3).
    """
    x0, y0, w0 = p0
    x1, y1, w1 = p1
    x2, y2, w2 = p2
    a0 = y1 * w2 - y2 * w1
    a1 = y2 * w0 - y0 * w2
    a2 = y0 * w1 - y1 * w0
    b0 = x2 * w1 - x1 * w2
    b1 = x0 * w2 - x2 * w0
    b2 = x1 * w0 - x0 * w1
    c0 = x1 * y2 - x2 * y1
    c1 = x2 * y0 - x0 * y2
    c2 = x0 * y1 - x1 * y0
    det = c0 * w0 + c1 * w1 + c2 * w2
    sign = jnp.where(det < 0, F32(-1.0), F32(1.0))
    edges = jnp.stack([
        jnp.stack([a0, b0, c0], -1),
        jnp.stack([a1, b1, c1], -1),
        jnp.stack([a2, b2, c2], -1),
    ], axis=1) * sign[:, None, None]
    # half-pixel offset: sample at pixel centers
    c_off = edges[:, :, 2] + 0.5 * (edges[:, :, 0] + edges[:, :, 1])
    return jnp.concatenate([edges[:, :, :2], c_off[:, :, None]], axis=-1)


def sample_texture_bilinear(tex, u, v):
    """Differentiable bilinear sample.  tex: (TH, TW, 4) float; u,v in [0,1]
    with repeat wrapping.  Gradients flow to texels and to u/v."""
    th, tw = tex.shape[0], tex.shape[1]
    uu = (u % 1.0) * tw - 0.5
    vv = (v % 1.0) * th - 0.5
    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = uu - x0
    fy = vv - y0
    x0i = jnp.mod(x0.astype(I32), tw)
    x1i = jnp.mod(x0i + 1, tw)
    y0i = jnp.mod(y0.astype(I32), th)
    y1i = jnp.mod(y0i + 1, th)
    t00 = tex[y0i, x0i]
    t01 = tex[y0i, x1i]
    t10 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return ((t00 * (1 - fx) + t01 * fx) * (1 - fy)
            + (t10 * (1 - fx) + t11 * fx) * fy)


def prim_setup(params, indices, cfg: DiffRenderConfig):
    """Differentiable geometry processing: vertices -> per-prim raster data.

    The in-graph twin of host binning's math (gradients flow through edge
    coefficients back to positions).  Returns a dict of (P, ...) arrays.
    """
    pos = params["pos"]
    color = params["color"]
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]
    hdc = clip_to_hdc(pos, cfg)
    p0 = tuple(h[i0] for h in hdc)
    p1 = tuple(h[i1] for h in hdc)
    p2 = tuple(h[i2] for h in hdc)
    edges = edge_matrix(p0, p1, p2)               # (P, 3, 3)
    z = screen_z(pos, cfg)
    setup = {
        "edges": edges,
        "z": jnp.stack([z[i0], z[i1], z[i2]], 1),          # (P, 3)
        "color": jnp.stack([color[i0], color[i1], color[i2]], 1),  # (P,3,4)
    }
    if cfg.textured:
        uv = params["uv"]
        setup["uv"] = jnp.stack([uv[i0], uv[i1], uv[i2]], 1)       # (P,3,2)
        setup["tex"] = params["tex"]
    return setup


def render_tile_set(setup, tile_pids, origins, cfg: DiffRenderConfig):
    """Render a set of tiles: (T, M) pid lists + (T, 2) pixel origins ->
    (T, ts, ts, 4) RGBA tiles.  This is the unit of tile-parallel sharding
    (each TPU chip renders its tile subset, skybox_rt_tpu.parallel)."""
    ts = 1 << cfg.tile_logsize
    edges = setup["edges"]
    z0, z1, z2 = setup["z"][:, 0], setup["z"][:, 1], setup["z"][:, 2]
    c0, c1, c2 = setup["color"][:, 0], setup["color"][:, 1], setup["color"][:, 2]
    if cfg.textured:
        t0, t1, t2 = setup["uv"][:, 0], setup["uv"][:, 1], setup["uv"][:, 2]
        tex = setup["tex"]

    def render_tile(pids, origin):
        ys = (jax.lax.broadcasted_iota(I32, (ts, ts), 0) + origin[1]).astype(F32)
        xs = (jax.lax.broadcasted_iota(I32, (ts, ts), 1) + origin[0]).astype(F32)

        fb_rgba = jnp.broadcast_to(
            jnp.asarray(cfg.background, F32), (ts, ts, 4)
        ).astype(F32)
        fb_z = jnp.full((ts, ts), jnp.inf, F32)

        def step(carry, pid):
            fb_rgba, fb_z = carry
            valid = pid >= 0
            p = jnp.maximum(pid, 0)
            e = edges[p]
            e0 = e[0, 0] * xs + e[0, 1] * ys + e[0, 2]
            e1 = e[1, 0] * xs + e[1, 1] * ys + e[1, 2]
            e2 = e[2, 0] * xs + e[2, 1] * ys + e[2, 2]
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & valid
            s = e0 + e1 + e2
            denom = jnp.where(jnp.abs(s) > 1e-20, s, 1e-20)
            b0 = e0 / denom
            b1 = e1 / denom
            b2 = 1.0 - b0 - b1

            zp = z0[p] * b0 + z1[p] * b1 + z2[p] * b2
            col = c0[p] * b0[..., None] + c1[p] * b1[..., None] + c2[p] * b2[..., None]

            if cfg.textured:
                uvp = (t0[p] * b0[..., None] + t1[p] * b1[..., None]
                       + t2[p] * b2[..., None])
                texel = sample_texture_bilinear(tex, uvp[..., 0], uvp[..., 1])
                col = col * texel if cfg.modulate else texel

            if cfg.soft_edge_temp > 0:
                # differentiable silhouette weight; == hard coverage in the
                # limit temp->0.  Weight multiplies the src contribution.
                temp = F32(cfg.soft_edge_temp)
                d = jnp.minimum(jnp.minimum(e0, e1), e2)
                w_soft = jax.nn.sigmoid(d / temp)
                cov_w = jnp.where(valid, w_soft, 0.0)
            else:
                cov_w = inside.astype(F32)

            if cfg.depth_test:
                zpass = zp < fb_z
                write = inside & zpass
                new_z = jnp.where(write, zp, fb_z)
            else:
                write = inside
                new_z = fb_z

            if cfg.alpha_blend:
                a = col[..., 3:4] * cov_w[..., None]
                blended = col * a + fb_rgba * (1.0 - a)
                new_rgba = jnp.where(write[..., None], blended, fb_rgba)
            else:
                src = col * cov_w[..., None] + fb_rgba * (1.0 - cov_w[..., None])
                new_rgba = jnp.where(write[..., None], src, fb_rgba)

            return (new_rgba, new_z), None

        (fb_rgba, fb_z), _ = jax.lax.scan(step, (fb_rgba, fb_z), pids)
        return fb_rgba

    return jax.vmap(render_tile)(tile_pids, origins)    # (T, ts, ts, 4)


def render(params, static, cfg: DiffRenderConfig):
    """Differentiable forward render.

    params: dict of traced leaves:
        'pos'    (V, 4) clip-space positions
        'color'  (V, 4) vertex colors
        'uv'     (V, 2) texcoords
        'tex'    (TH, TW, 4) texture (when cfg.textured)
    static: dict of static-shape integer arrays (host binning output):
        'indices'   (P, 3)  vertex indices
        'tile_pids' (T, M)  per-tile prim lists, -1 padded
        'tile_xy'   (T, 2)  tile coords
    Returns (Hp, Wp, 4) float32 RGBA image (padded to tile multiples).
    """
    indices = static["indices"]
    tile_pids = static["tile_pids"]
    tile_xy = static["tile_xy"]

    ts = 1 << cfg.tile_logsize
    Hp = -(-cfg.height // ts) * ts
    Wp = -(-cfg.width // ts) * ts
    gh, gw = Hp // ts, Wp // ts

    setup = prim_setup(params, indices, cfg)
    tiles = render_tile_set(setup, tile_pids, tile_xy * ts, cfg)

    # scatter tiles into the padded canvas
    canvas = jnp.broadcast_to(
        jnp.asarray(cfg.background, F32), (gh, gw, ts, ts, 4)
    ).astype(F32)
    canvas = canvas.at[tile_xy[:, 1], tile_xy[:, 0]].set(tiles)
    img = canvas.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, 4)
    return img


def render_cropped(params, static, cfg: DiffRenderConfig):
    return render(params, static, cfg)[: cfg.height, : cfg.width]
