"""Backward-pass throughput bench: Mpix/s fwd+bwd at 512^2 (compiled loop).

VERDICT round-1 item 3: the round-1 number (324 ms/step at 512^2, eager
dispatch) was dominated by per-step tunnel latency and the scan-based
backward.  This measures a COMPILED multi-step loop (lax.fori_loop inside
one jit, one dispatch) for both pipelines:
  * scan      — diff/pipeline.render_tile_set (sequential per-prim scan,
                backward traverses every step)
  * deferred  — diff/pipeline.render_tile_set_deferred (non-diff K-slot
                visibility + O(pixels*K) differentiable shading)

Scene: textured icosphere (subdiv 4 -> 5120 prims) at 512^2, depth test,
modulated texture — the north-star inverse-rendering shape (config 4).

Run EXCLUSIVELY and detached (CLAUDE.md):
  setsid nohup timeout 3000 python scripts/diff_chip_bench.py > /tmp/diff_bench.log 2>&1 &
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
STEPS = 20
TILE_LOG = 5


def build(subdiv=4):
    verts, faces = scenes.icosphere(subdiv=subdiv, radius=0.85)
    V = verts.shape[0]
    pos = np.concatenate([verts.astype(np.float32),
                          np.ones((V, 1), np.float32)], axis=1)
    pos[:, 2] = pos[:, 2] * 0.4 + 0.5   # z into [near, far]
    rng = np.random.default_rng(0)
    color = rng.uniform(0.2, 1.0, (V, 4)).astype(np.float32)
    uv = rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(color),
        "uv": jnp.asarray(uv),
        "tex": jnp.asarray(scenes.checkerboard_texture(64, 8)),
    }
    cfg = pipeline.DiffRenderConfig(width=SIZE, height=SIZE,
                                    tile_logsize=TILE_LOG, depth_test=True,
                                    textured=True, modulate=True)
    static = dbin.bin_static(pos, faces.astype(np.int32), SIZE, SIZE,
                             tile_logsize=TILE_LOG)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg, faces.shape[0]


def make_loop(static, cfg, deferred, lr=1e-6, slots=8):
    target = jnp.zeros((-(-SIZE // (1 << TILE_LOG)) * (1 << TILE_LOG),) * 2
                       + (4,), jnp.float32)

    def loss_fn(params):
        if deferred:
            img, _ = pipeline.render_deferred(params, static, cfg,
                                              slots=slots)
        else:
            img = pipeline.render(params, static, cfg)
        return jnp.sum((img - target) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def loop(params):
        def body(_, carry):
            params, acc = carry
            loss, g = grad_fn(params)
            params = {k: v - lr * g.get(k, 0.0) if k in g else v
                      for k, v in params.items()}
            return params, acc + loss
        return jax.lax.fori_loop(0, STEPS, body, (params, 0.0))

    return loop


def bench(name, loop, params):
    # standing artifact (VERDICT r2 #6): dump the compiled (scheduled) HLO
    # and print the async-collective overlap report — empty on one chip,
    # turnkey evidence on a real slice
    try:
        from skybox_rt_tpu.parallel import overlap
        txt = jax.jit(loop).lower(params).compile().as_text()
        path = f"/tmp/diff_bench_{name.strip()}_compiled_hlo.txt"
        with open(path, "w") as f:
            f.write(txt)
        rep = overlap.collective_schedule_report(txt)
        print(f"{name}: scheduled HLO -> {path}; "
              f"all-reduces={overlap.count_all_reduces(txt)} "
              f"async-overlap-report={rep}", flush=True)
    except Exception as e:
        print(f"{name}: HLO dump failed: {type(e).__name__}", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(loop(params))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(loop(params))
    wall = time.time() - t0
    ms_per_step = wall / STEPS * 1e3
    mpix = SIZE * SIZE * STEPS / wall / 1e6
    print(f"{name}: {ms_per_step:.2f} ms/step  {mpix:.1f} Mpix/s fwd+bwd "
          f"(compile {compile_s:.0f}s, loss {float(out[1]):.3e})", flush=True)
    return ms_per_step


def main():
    print("devices:", jax.devices(), flush=True)
    params, static, cfg, P = build()
    print(f"scene: {P} prims, tile_pids {static['tile_pids'].shape}",
          flush=True)
    d = bench("deferred", make_loop(static, cfg, True), params)
    if os.environ.get("SKIP_SCAN"):
        return
    s = bench("scan    ", make_loop(static, cfg, False), params)
    print(f"speedup: {s / d:.1f}x", flush=True)


if __name__ == "__main__":
    main()
