"""Backward-pass BREAKDOWN bench (round 3): where do the 38 ms/step go?

Times, at 512^2 / 5120-prim icosphere / all params trainable (the
diff_chip_bench scene), each stage in a compiled 10-iteration loop:
  1. visibility only       (non-diff hard-depth pass, fwd)
  2. shade only fwd        (slot shading given fixed slots)
  3. shade only fwd+bwd    (VJP of slot shading — the autodiff surface)
  4. full step fwd+bwd     (render_deferred + grads, = diff_chip_bench)

Run exclusively, detached:
  setsid nohup timeout 3000 python scripts/diff_breakdown_bench.py \
      > /tmp/diff_breakdown.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes

SIZE = 512
ITERS = 10
TILE_LOG = int(os.environ.get("SKYBOX_BENCH_TILE_LOG", "5"))


def build(subdiv=4):
    verts, faces = scenes.icosphere(subdiv=subdiv, radius=0.85)
    V = verts.shape[0]
    pos = np.concatenate([verts.astype(np.float32),
                          np.ones((V, 1), np.float32)], axis=1)
    pos[:, 2] = pos[:, 2] * 0.4 + 0.5
    rng = np.random.default_rng(0)
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(rng.uniform(0.2, 1.0, (V, 4)).astype(np.float32)),
        "uv": jnp.asarray(rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)),
        "tex": jnp.asarray(scenes.checkerboard_texture(64, 8)),
    }
    cfg = pipeline.DiffRenderConfig(width=SIZE, height=SIZE,
                                    tile_logsize=TILE_LOG, depth_test=True,
                                    textured=True, modulate=True)
    static = dbin.bin_static(pos, faces.astype(np.int32), SIZE, SIZE,
                             tile_logsize=TILE_LOG)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg


def timed_loop(name, fn, *args, iters=ITERS):
    """fn(*args) -> pytree; timed as a compiled iters-loop with an
    optimization-barrier chain through a scalar token."""
    @jax.jit
    def loop(args):
        def body(carry, _):
            tok, acc = carry
            args_b = []
            for a in jax.tree.leaves(args):
                a_b, tok_b = jax.lax.optimization_barrier((a, tok))
                args_b.append(a_b)
                acc = acc + tok_b
            out = fn(*jax.tree.unflatten(jax.tree.structure(args), args_b))
            # keep EVERY output leaf live (grads included) — a token built
            # from only the first leaf lets XLA dead-code-eliminate the
            # whole backward pass (observed: stage 3 == stage 2)
            tok2 = jnp.float32(0)
            for l in jax.tree.leaves(out):
                tok2 = tok2 + jnp.asarray(l).ravel()[0].astype(jnp.float32)
            return (tok2, acc), None
        (tok, acc), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                     None, length=iters)
        return tok, acc

    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(args))
    wall = (time.perf_counter() - t0) / iters
    mpix = SIZE * SIZE / wall / 1e6
    print(f"{name}: {wall*1e3:.2f} ms/iter  {mpix:.1f} Mpix/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return wall


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    params, static, cfg = build()
    ts = 1 << TILE_LOG
    tile_pids = static["tile_pids"]
    origins = static["tile_xy"] * ts
    print(f"tiles={tile_pids.shape[0]} M={tile_pids.shape[1]}", flush=True)
    target = jnp.zeros((SIZE, SIZE, 4), jnp.float32)

    # 1. visibility only.  (The pallas arm was measured 8.76 vs xla 3.86
    # in one window — see PERF.md; its ~7 min Mosaic tunnel compile isn't
    # worth re-paying every run, so time the default engine only.)
    for eng in ("xla",):
        def vis_only(params, eng=eng):
            setup = pipeline.prim_setup(params, static["indices"], cfg)
            slots, maxw = pipeline.visibility_slots(
                setup, tile_pids, origins, cfg, 8, engine=eng)
            return (slots.astype(jnp.float32).sum()
                    + maxw.astype(jnp.float32))
        timed_loop(f"1 visibility[{eng:6s}]", vis_only, params)

    # fixed slots for the shade-only stages
    setup0 = pipeline.prim_setup(params, static["indices"], cfg)
    slots0, _ = jax.jit(
        lambda s: pipeline.visibility_slots(s, tile_pids, origins, cfg, 8)
    )(setup0)
    slots0 = jax.block_until_ready(slots0)

    # 2. shade only fwd
    def shade_fwd(params):
        setup = pipeline.prim_setup(params, static["indices"], cfg)
        tiles = pipeline.shade_slots(setup, tile_pids, slots0, origins, cfg)
        return tiles.sum()
    timed_loop("2 shade fwd        ", shade_fwd, params)

    # 3. shade fwd+bwd
    def shade_loss(params):
        setup = pipeline.prim_setup(params, static["indices"], cfg)
        tiles = pipeline.shade_slots(setup, tile_pids, slots0, origins, cfg)
        return jnp.sum(tiles ** 2)

    def shade_grad(params):
        l, g = jax.value_and_grad(shade_loss)(params)
        return l, g
    timed_loop("3 shade fwd+bwd    ", shade_grad, params)

    # 4. full step
    def full_step(params):
        def loss_fn(params):
            img, _ = pipeline.render_deferred(params, static, cfg, slots=8)
            return jnp.sum((img[:SIZE, :SIZE] - target) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, g
    timed_loop("4 full step fwd+bwd", full_step, params)

    # 3b. shade fwd+bwd split by param (which grad is expensive?)
    for k in ("pos", "color", "uv", "tex"):
        def shade_grad_k(params, k=k):
            def f(leaf):
                p = dict(params)
                p[k] = leaf
                return shade_loss(p)
            return jax.value_and_grad(f)(params[k])
        timed_loop(f"3b shade bwd[{k:5s}] ", shade_grad_k, params)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
