"""Compiled single-dispatch RT frame for CGLTrace scenes (config-3 path).

Replaces raster_bridge's eager per-draw loop + O(rays x prims)
submission-order scan for translucent drawcalls with ONE jitted frame:

  * opaque drawcalls with an ordering-extreme depth func run the
    hierarchical BVH worklist kernel once (ops.pallas_rt.closest_hit_bvh)
    and composite through the same winner math as the bridge;
  * every other drawcall (blended, depth-func ALWAYS/EQUAL/..., depth
    test off) runs the K-SLOT ENUMERATION: K repeated
    ops.pallas_rt.closest_hit_bvh_after walks with a lexicographic
    (t, slot) carry collect EVERY fragment along each ray (exact-t ties
    included), the slots are sorted back to SUBMISSION order (original
    prim id) by a small compare-exchange network, and the OM carry
    (depth test -> depth write -> blend -> masked write) replays over
    the K slots — the RT port of the deferred raster K-slot design
    (ops/deferred.py:355-434), reproducing om_unit.cpp:24-154 fragment
    semantics in float.

Overflow contract (the deferred path's pattern): a draw with K < P runs
one PROBE walk; any ray still hitting means fragments were dropped.  The
probe counts ride the frame output as a per-draw array, verified by the
caller AFTER the frame (one readback — never a mid-frame sync, PERF.md
poison pill); on overflow the draw's K doubles and the frame recompiles
(hint cached per trace, so steady-state rendering never overflows).

Protocol: the whole frame is one dispatch, matching the reference's
vx_start..ready_wait one-window frame (draw3d/main.cpp:171-390); per-draw
state is static (compiled in), the DCR analog (main.cpp:216-331).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..texture import mipmap
from ..ops import pallas_rt
from . import raster_bridge as rb

F32 = jnp.float32
I32 = jnp.int32

_EXTREME_FUNCS = (C.CGL_COMPARE_LESS, C.CGL_COMPARE_LEQUAL,
                  C.CGL_COMPARE_GREATER, C.CGL_COMPARE_GEQUAL)
#: Starting slot count for K-slot draws with no measured hint: the probe
#: walk + doubling retry DISCOVERS the scene's true per-ray fragment
#: ceiling in <= log2 renders (cached per trace), so starting low costs
#: at most a few recompiles once and saves (K - K_true) kernel walks on
#: every subsequent frame (vase's blended shells are single-layer:
#: K_true = 1, where a fixed default of 4 wasted 3 walks per draw).
_DEFAULT_K = 1
#: Blended/ordering-free draws at or below this prim count skip the
#: K-slot kernel walks and run the exact vectorized submission-order
#: scan (raster_bridge._scan_drawcall_jit math) inside the same jit.
#: Measured sweep on chip (vase 512^2, scripts/rt_probe2_r5.py, honest
#: D2H timing): cutoff 0 -> 158.4 ms, cutoff 2 -> 144.9 ms, cutoff 64
#: -> 527.0 ms — each sequential scan STEP costs several ms at 512^2,
#: so only the 2-prim full-screen quads beat their own K-slot walks.
_SCAN_MAX_PRIMS = 2
_BIG_PRIM = jnp.int32(2 ** 30)

# (trace id, draw index) -> measured slot count K (the RT twin of the
# deferred path's blend_k hint)
_K_HINTS: dict = {}
# (trace id, w, h, start, end, k tuple, sub) -> (jitted frame, arrays, rays)
_FRAME_CACHE: dict = {}


def _trace_key(trace):
    return id(trace)


def _build_plan(trace, width: int, height: int, start_draw: int,
                end_draw: int, on_stencil: str, k_hints):
    """Host-side prep: per-draw statics + device arrays + BVH block sets.

    Statics mirror the bridge's _scan_statics (the jit cache key / DCR
    analog); arrays are the jit INPUTS so XLA keeps them device-resident
    across frames (the PERF.md re-upload lesson)."""
    plan = []
    for di, dc in enumerate(trace.drawcalls[start_draw:end_draw]):
        st = dc.states
        if st.stencil_test:
            if on_stencil == "raise":
                raise NotImplementedError(
                    "rt.frame does not model stencil state; render this "
                    "trace through the raster path, or pass "
                    "on_stencil='skip'")
            import warnings
            warnings.warn("rt.frame: skipping drawcall with stencil "
                          "enabled (not modeled; use the raster path)")
            continue
        geo = rb._screen_triangles(dc, width, height)
        if geo is None:
            continue
        statics = rb._scan_statics(st, dc)
        idx = np.asarray(geo["indices"])
        clip = np.asarray(geo["clip"], np.float32)
        tri = np.ascontiguousarray(
            clip[idx][:, :, [0, 1, 3]].astype(np.float32))   # (P,3,3) x,y,w
        P = tri.shape[0]

        winner = (not st.blend_enabled and st.depth_test
                  and st.depth_func in _EXTREME_FUNCS)
        scan = (not winner) and P <= _SCAN_MAX_PRIMS
        blocks = None
        if not scan:
            blocks = rb._engine_prep(tri, "pallas_bvh")["blocks"]

        if st.texture_enabled:
            tex = trace.textures[dc.texture_id]
            vx_fmt = C.CGL_TO_VX_FORMAT[tex.format]
            img = jnp.asarray(mipmap.texture_rgba_float(
                tex.pixels, vx_fmt, tex.width, tex.height))
        else:
            img = jnp.zeros((1, 1, 4), F32)

        farthest = st.depth_func in (C.CGL_COMPARE_GREATER,
                                     C.CGL_COMPARE_GEQUAL)
        if winner or scan:
            k = 1
        else:
            k = k_hints.get(di, min(_DEFAULT_K, P))
            k = min(max(int(k), 1), P)
        arrays = {
            "idx": jnp.asarray(idx.astype(np.int32)),
            "zattr": jnp.asarray(clip[:, 2:4]),
            "colattr": jnp.asarray(np.asarray(geo["color"], np.float32)),
            "uvattr": jnp.asarray(np.asarray(geo["uv"], np.float32)),
            "img": img,
        }
        if scan:
            # per-triangle attribute rows for the vectorized scan (the
            # exact raster_bridge._scan_drawcall layout)
            arrays.update({
                "v0": jnp.asarray(tri[:, 0]),
                "e1": jnp.asarray(tri[:, 1] - tri[:, 0]),
                "e2": jnp.asarray(tri[:, 2] - tri[:, 0]),
                "zw": jnp.asarray(clip[idx][:, :, 2:4]),
                "col": jnp.asarray(
                    np.asarray(geo["color"], np.float32)[idx]),
                "uvv": jnp.asarray(np.asarray(geo["uv"], np.float32)[idx]),
            })
        else:
            arrays.update({
                "tri": blocks["tri"],
                "bcnt": blocks["bcnt"],
                "s2p": blocks["s2p"],
                "levels": list(blocks["levels"]),
            })
        meta = {
            "draw_index": di,
            "statics": statics,
            "mode": ("winner" if winner else
                     "scan" if scan else "kslot"),
            "farthest": bool(farthest),
            "far_d": float(tri[..., 2].max()) + 1.0,
            "K": k,
            "P": P,
            "tri_block": blocks["tri_block"] if blocks else 0,
            "num_blocks": blocks["num_blocks"] if blocks else 0,
        }
        plan.append((meta, arrays))
    return plan


def _sort_slots_by_prim(slots):
    """Odd-even transposition sort of the K (prim, t, u, v) slots by
    ORIGINAL prim id (submission order), misses last.  K <= 8, so the
    network is a handful of vectorized compare-exchanges."""
    K = len(slots)
    ent = []
    for prim, t, u, v in slots:
        key = jnp.where(prim < 0, _BIG_PRIM, prim)
        ent.append([key, prim, t, u, v])
    for rnd in range(K):
        for i in range(rnd % 2, K - 1, 2):
            a, b = ent[i], ent[i + 1]
            swap = a[0] > b[0]
            ent[i] = [jnp.where(swap, y, x) for x, y in zip(a, b)]
            ent[i + 1] = [jnp.where(swap, x, y) for x, y in zip(a, b)]
    return [(e[1], e[2], e[3], e[4]) for e in ent]


def _om_replay(meta, arr, slots, zbuf, color):
    """Replay the OM fragment carry over the submission-ordered slots —
    the same math as the bridge's scan step (z from clip z/w, texture
    combine, depth test/write, blend, channel-masked write)."""
    (texture_enabled, envmode, repeat, bilinear, color_enabled,
     depth_test, depth_func, depth_writemask, blend_enabled, blend_src,
     blend_dst, wm, near, far) = meta["statics"]
    idx = arr["idx"]
    half_d = 0.5 * (far - near)
    zoff = near + half_d
    chan = jnp.asarray([bool(wm & 0x00FF0000), bool(wm & 0x0000FF00),
                        bool(wm & 0x000000FF), bool(wm & 0xFF000000)])

    for prim, t, u, v in slots:
        valid = prim >= 0
        p = jnp.maximum(prim, 0)
        tri_idx = idx[p]                              # (R, 3)
        w = jnp.stack([1.0 - u - v, u, v], -1)        # (R, 3)
        zw = jnp.sum(arr["zattr"][tri_idx] * w[..., None], 1)   # (R, 2)
        z = (zw[:, 0] / jnp.where(jnp.abs(zw[:, 1]) > 1e-30,
                                  zw[:, 1], 1.0)) * half_d + zoff

        if color_enabled:
            src = jnp.sum(arr["colattr"][tri_idx] * w[..., None], 1)
        else:
            src = jnp.ones((prim.shape[0], 4), F32)
        if texture_enabled:
            uvp = jnp.sum(arr["uvattr"][tri_idx] * w[..., None], 1)
            texel = rb._sample_texture_wrap(arr["img"], uvp[:, 0],
                                            uvp[:, 1], repeat, bilinear)
            if envmode == C.CGL_ENVMODE_MODULATE:
                src = src * texel
            elif envmode == C.CGL_ENVMODE_ADD:
                src = jnp.clip(src + texel, 0.0, 1.0)
            else:
                src = texel

        passed = valid
        if depth_test:
            passed = passed & rb._depth_pass(depth_func, z, zbuf)
            if depth_writemask:
                zbuf = jnp.where(passed, z, zbuf)
        out = src
        if blend_enabled:
            sf = rb._BLEND_FACTORS[blend_src](src, color)
            df = rb._BLEND_FACTORS[blend_dst](src, color)
            out = jnp.clip(src * sf + color * df, 0.0, 1.0)
        color = jnp.where(passed[:, None] & chan[None, :], out, color)
    return zbuf, color


def make_frame_fn(trace, width: int, height: int, *, sub: int = 2,
                  interpret=None, start_draw: int = 0,
                  end_draw: int = 2 ** 31, on_stencil: str = "raise"):
    """Build the single-dispatch frame function for one trace.

    Returns (frame, arrays, rays, metas): call frame(arrays, nx, ny) ->
    (zbuf, color, overflow) with everything device-resident; overflow is
    a (num probed draws,) i32 of rays whose fragments exceeded K (verify
    AFTER readback; see module docstring)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tkey = _trace_key(trace)
    hints = {di: k for (tk, di), k in _K_HINTS.items() if tk == tkey}
    plan = _build_plan(trace, width, height, start_draw, end_draw,
                       on_stencil, hints)
    metas = [m for m, _ in plan]
    ckey = (tkey, width, height, start_draw, min(end_draw, 2 ** 31),
            tuple((m["draw_index"], m["mode"], m["K"]) for m in metas),
            sub, bool(interpret), on_stencil, _SCAN_MAX_PRIMS)
    cached = _FRAME_CACHE.get(ckey)
    if cached is not None:
        return cached

    def _blocks(meta, arr):
        return {"tri": arr["tri"], "bcnt": arr["bcnt"], "s2p": arr["s2p"],
                "levels": arr["levels"], "tri_block": meta["tri_block"],
                "num_blocks": meta["num_blocks"],
                "num_prims": meta["P"]}

    def frame(arrays, nx, ny):
        R = nx.shape[0]
        dirs = jnp.stack([nx, ny, jnp.ones_like(nx)], -1)
        eye = jnp.zeros_like(dirs)
        color = jnp.zeros((R, 4), F32).at[:, 3].set(1.0)
        zbuf = jnp.full((R,), jnp.inf, F32)
        overflow = []

        for meta, arr in zip(metas, arrays):
            if meta["mode"] == "scan":
                # exact vectorized submission-order scan (tiny draws)
                zbuf, color = rb._scan_drawcall_jit.__wrapped__(
                    meta["statics"], arr["v0"], arr["e1"], arr["e2"],
                    arr["zw"], arr["col"], arr["uvv"], arr["img"],
                    nx, ny, zbuf, color)
                continue
            blocks = _blocks(meta, arr)
            if meta["mode"] == "winner":
                if meta["farthest"]:
                    o = dirs * meta["far_d"]
                    d = -dirs
                else:
                    o, d = eye, dirs
                prim, t, u, v = pallas_rt.closest_hit_bvh(
                    o, d, blocks, t_min=1e-6, sub=sub,
                    interpret=interpret)
                zbuf, color = rb._winner_composite_jit(
                    meta["statics"], True, arr["idx"],
                    jnp.zeros((arr["zattr"].shape[0],), F32),
                    arr["zattr"], arr["colattr"], arr["uvattr"],
                    arr["img"], prim, u, v, zbuf, color)
                continue

            # K-slot enumeration: worklists once, K (+1 probe) walks
            K, P = meta["K"], meta["P"]
            wk = pallas_rt.bvh_worklists(eye, dirs, blocks, sub=sub)
            tlo = jnp.full((R,), -jnp.inf, F32)
            slo = jnp.full((R,), -1, I32)
            slots = []
            probe = K < P
            for k in range(K + (1 if probe else 0)):
                slot, prim, t, u, v = pallas_rt.closest_hit_bvh_after(
                    blocks, wk, tlo, slo, t_min=1e-6,
                    interpret=interpret)
                if k < K:
                    slots.append((prim, t, u, v))
                else:
                    overflow.append(jnp.sum((prim >= 0).astype(I32)))
                tlo, slo = t, slot
            slots = _sort_slots_by_prim(slots) if K > 1 else slots
            zbuf, color = _om_replay(meta, arr, slots, zbuf, color)

        ovf = (jnp.stack(overflow) if overflow
               else jnp.zeros((0,), I32))
        return zbuf, color, ovf

    ys, xs = np.mgrid[0:height, 0:width]
    px = (xs + 0.5).astype(np.float32).ravel()
    py = (ys + 0.5).astype(np.float32).ravel()
    nx = jnp.asarray(px * (2.0 / width) - 1.0)
    ny = jnp.asarray(py * (2.0 / height) - 1.0)
    arrays = [a for _, a in plan]
    out = (jax.jit(frame), arrays, (nx, ny), metas)
    while len(_FRAME_CACHE) >= 16:      # bound: evict oldest (FIFO)
        _FRAME_CACHE.pop(next(iter(_FRAME_CACHE)))
    _FRAME_CACHE[ckey] = out
    return out


def render_trace_rt_fused(trace, width: int, height: int, *,
                          sub: int = 2, interpret=None, start_draw: int = 0,
                          end_draw: int = 2 ** 31,
                          on_stencil: str = "raise") -> np.ndarray:
    """Render a CGLTrace through the compiled frame, with the deferred
    overflow-retry loop (doubling K for any draw whose probe fired).
    Returns (H, W, 4) float32 RGBA, row 0 = top."""
    tkey = _trace_key(trace)
    for _ in range(8):
        frame, arrays, rays, metas = make_frame_fn(
            trace, width, height, sub=sub, interpret=interpret,
            start_draw=start_draw, end_draw=end_draw,
            on_stencil=on_stencil)
        zbuf, color, ovf = frame(arrays, *rays)
        ovf = np.asarray(ovf)                       # the ONE readback
        if not ovf.any():
            break
        probed = [m for m in metas
                  if m["mode"] == "kslot" and m["K"] < m["P"]]
        for m, n in zip(probed, ovf):
            if n > 0:
                _K_HINTS[(tkey, m["draw_index"])] = min(2 * m["K"], m["P"])
    else:
        raise RuntimeError("rt.frame: K-slot overflow did not converge")
    return np.asarray(color).reshape(height, width, 4)
