"""Deferred-shading drawcall renderer — the optimized exact path.

The immediate-mode oracle (ref.renderer) shades and textures every covered
fragment of every primitive.  On TPU the expensive part is texture gather;
this module restructures the draw into

  pass 1 (visibility): scan primitives per tile carrying only
      (depth-stencil word, winning pid) per pixel — cheap int/float VPU ops,
      no gathers except one row of edge/z data per primitive step
  pass 2 (shading): for each *pixel* with a winner, recompute barycentrics,
      interpolate attributes, sample the texture, and merge — one texture
      gather per visible pixel instead of one per fragment

Exactness: for draws with blending and stencil DISABLED, the sequential OM
semantics reduce to "the winning fragment's write survives":

  * the zbuf word after the draw equals the winner's ds_result (stencil
    byte preserved since stencil writemask is 0: om_unit.cpp:118-127)
  * the color word equals the winner's masked color write
  * winner selection IS the immediate algorithm restricted to depth:
    carry the running zbuf word and update where compare(func) passes
    (depth writemask 0 keeps the carry fixed, reproducing compare-vs-
    initial semantics)

One sequential-dependence exception: DEPTH_FUNC_NOTEQUAL with depth write
(a later equal-z fragment compares against the updated zbuf) — handled by
the same carry update, so it is exact here too.  Blend or stencil enabled
falls back to the immediate renderer (ref.renderer).

This module is also the staging ground for the Pallas pass-1 kernel
(ops.pallas_raster): both produce identical (pid, zword) visibility
buffers, so they are interchangeable and parity-tested.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.state import RenderState
from ..om import depth_stencil as ds_mod
from ..raster import edge as edge_mod
from ..raster import interp as interp_mod
from ..ref import renderer as immediate
from ..texture import sampler as sampler_mod

I32 = jnp.int32
U32 = jnp.uint32
FX24_ONE = 1 << 24


def deferrable(render_state: RenderState) -> bool:
    om = render_state.om
    return (not om.blend.enabled
            and not om.ds.stencil_enabled(False)
            and not om.ds.stencil_enabled(True))


def _visibility_tiles(render_state, edges, zattr, tile_pids, tile_xy,
                      fb_ds_tiles, tile_logsize):
    """Pass 1: per-tile scan -> (winner pid (T,ts,ts) i32, zword (T,ts,ts) u32).

    zattr: (P, 3) int32 fixed24 z plane (x, y, c).
    """
    ts = 1 << tile_logsize
    flags = render_state.flags
    om = render_state.om
    depth_en = om.ds.depth_enabled
    depth_write = depth_en and om.depth_writemask

    def one_tile(pids, ds0, origin):
        ys = jax.lax.broadcasted_iota(I32, (ts, ts), 0) + origin[1]
        xs = jax.lax.broadcasted_iota(I32, (ts, ts), 1) + origin[0]

        def step(carry, pid):
            dsw, win = carry
            valid = pid >= 0
            p = jnp.maximum(pid, 0)
            evals = edge_mod.eval_edges(edges[p], xs, ys)
            cov = edge_mod.coverage(evals, xs, ys, render_state.scissor) & valid

            if depth_en:
                dx, dy = interp_mod.gradients(evals)
                if flags.depth_enabled:
                    z = interp_mod.interpolate(zattr[p], dx, dy)
                else:
                    z = jnp.zeros_like(dx)   # shader DEFAULTS z=0
                depth = jnp.bitwise_and(z.astype(U32), C.OM_DEPTH_MASK)
                stored = jnp.bitwise_and(dsw, C.OM_DEPTH_MASK)
                passed = ds_mod.compare(om.ds.depth_func, depth, stored)
                upd = cov & passed
                if depth_write:
                    dsw = jnp.where(
                        upd,
                        jnp.bitwise_or(
                            jnp.bitwise_and(dsw, ~jnp.uint32(C.OM_DEPTH_MASK)),
                            depth),
                        dsw)
            else:
                upd = cov
            win = jnp.where(upd, p, win)
            return (dsw, win), None

        win0 = jnp.full((ts, ts), -1, I32)
        (dsw, win), _ = jax.lax.scan(step, (ds0, win0), pids)
        return dsw, win

    origins = tile_xy * ts
    return jax.vmap(one_tile)(tile_pids, fb_ds_tiles, origins)


def _shade_pixels(render_state, texels, edges, attribs, win, xs, ys):
    """Pass 2: per-pixel shading of winners (win >= 0).

    Recomputes the winner's edge values/gradients and runs the exact
    interpolate/texture/modulate shader (draw3d/kernel.cpp:167-228) once
    per pixel.  Returns packed ARGB uint32.
    """
    flags = render_state.flags
    p = jnp.maximum(win, 0)
    e = edges[p]                                # (..., 3, 3) pixelwise gather
    ex = e[..., 0]
    ey = e[..., 1]
    ez = e[..., 2]
    evals = jnp.stack([ex[..., k] * xs + ey[..., k] * ys + ez[..., k]
                       for k in range(3)])
    dx, dy = interp_mod.gradients(evals)

    at = attribs[p]                             # (..., 7, 3)

    def interp(idx):
        a = at[..., idx, :]
        tmp = jnp.asarray(
            interp_mod.fixed.imadd24(a[..., 0], dx, a[..., 2]))
        return interp_mod.fixed.imadd24(a[..., 1], dy, tmp)

    if flags.color_enabled:
        r = interp(1)
        g = interp(2)
        b = interp(3)
        a_ = interp(4)
    else:
        r = g = b = a_ = jnp.full_like(dx, FX24_ONE)

    if flags.tex_enabled:
        u = interp(5)
        v = interp(6)
        tex_color = sampler_mod.sample(
            render_state.tex, texels,
            jnp.right_shift(u, 1), jnp.right_shift(v, 1), lod=0)
        if flags.tex_modulate:
            return interp_mod.modulate(r, g, b, a_, tex_color)
        return tex_color
    return interp_mod.to_rgba8(r, g, b, a_)


@functools.partial(jax.jit, static_argnames=("render_state", "tile_logsize",
                                             "visibility"))
def _render_deferred_jit(render_state, texels, edges, attribs, zattr,
                         tile_pids, tile_xy, fb_color, fb_ds, tile_logsize,
                         visibility="xla"):
    ts = 1 << tile_logsize
    Hp, Wp = fb_color.shape
    gh, gw = Hp // ts, Wp // ts

    fbc_t = fb_color.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3)
    fbd_t = fb_ds.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3)
    tx = tile_xy[:, 0]
    ty = tile_xy[:, 1]
    sel_d = fbd_t[ty, tx]

    if visibility == "xla":
        dsw, win = _visibility_tiles(render_state, edges, zattr, tile_pids,
                                     tile_xy, sel_d, tile_logsize)
    else:  # "pallas" | "pallas_interpret": the TPU kernel (ops.pallas_raster)
        from . import pallas_raster
        dsw, win = pallas_raster.visibility_tiles(
            render_state, edges, zattr, tile_pids, tile_xy, sel_d,
            tile_logsize, interpret=(visibility == "pallas_interpret"))

    # pass 2 over the selected tiles' pixels
    origins = tile_xy * ts
    ys = (jax.lax.broadcasted_iota(I32, (1, ts, ts), 1)
          + origins[:, 1][:, None, None])
    xs = (jax.lax.broadcasted_iota(I32, (1, ts, ts), 2)
          + origins[:, 0][:, None, None])
    color = _shade_pixels(render_state, texels, edges, attribs, win, xs, ys)

    # masked merge (om_unit.cpp:129-135 color write path)
    sel_c = fbc_t[ty, tx]
    om = render_state.om
    has_win = win >= 0
    if om.color_write:
        cmask = jnp.uint32(om.cbuf_writemask)
        merged = jnp.bitwise_or(jnp.bitwise_and(sel_c, ~cmask),
                                jnp.bitwise_and(color, cmask))
        sel_c = jnp.where(has_win, merged, sel_c)

    fbc_t = fbc_t.at[ty, tx].set(sel_c)
    fbd_t = fbd_t.at[ty, tx].set(dsw)
    fb_color = fbc_t.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    fb_ds = fbd_t.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return fb_color, fb_ds


def render_drawcall(render_state: RenderState, texels, binned,
                    fb_color, fb_ds, visibility="xla"):
    """Deferred when exact-equivalent, immediate otherwise."""
    if visibility != "xla":
        from . import pallas_raster
        if not pallas_raster.supported(render_state, binned.tile_logsize):
            visibility = "xla"
        elif (visibility == "pallas"
              and jax.devices()[0].platform != "tpu"):
            visibility = "pallas_interpret"   # Mosaic only lowers on TPU
    if not deferrable(render_state):
        return immediate.render_drawcall(render_state, texels, binned,
                                         fb_color, fb_ds)
    if texels is None:
        texels = jnp.zeros((1,), jnp.uint32)
    return _render_deferred_jit(
        render_state, texels,
        jnp.asarray(binned.edges), jnp.asarray(binned.attribs),
        jnp.asarray(binned.attribs[:, 0]),
        jnp.asarray(binned.tile_pids), jnp.asarray(binned.tile_xy),
        fb_color, fb_ds, binned.tile_logsize,
        visibility=visibility,
    )
