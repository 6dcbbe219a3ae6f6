"""Differentiable-coverage-mode throughput (VERDICT r3 #3): hard /
soft_edge / alpha_blend train steps at 512^2, compiled 20-step loops,
same window.  Round-3 state: hard 8.88 ms, alpha 38.9 ms, soft 46.9 ms;
round-4 target <= 20 ms for the K-slot modes (the K=8 slot shade now
batches the record gather / texture sample / texgrad across slots).

Run EXCLUSIVELY and detached:
  setsid nohup timeout 3000 python scripts/diff_modes_bench.py > log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_chip_bench import SIZE, STEPS, build, make_loop  # noqa: E402
from skybox_rt_tpu.diff import pipeline  # noqa: E402


def bench(name, loop, params, losses):
    # NO device->host read here: the first D2H permanently de-pipelines
    # the process (PERF.md round 4) and would tax every later mode's
    # timed dispatch; losses print at the end of main()
    t0 = time.time()
    out = jax.block_until_ready(loop(params))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(loop(params))
    wall = time.time() - t0
    print(f"{name}: {wall/STEPS*1e3:.2f} ms/step  "
          f"{SIZE*SIZE*STEPS/wall/1e6:.1f} Mpix/s fwd+bwd "
          f"(compile {compile_s:.0f}s)", flush=True)
    losses.append((name, out[1]))
    return wall / STEPS * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    params, static, cfg, P = build()
    print(f"scene: {P} prims", flush=True)

    modes = {
        "hard      ": cfg,
        "alpha     ": dataclasses.replace(cfg, alpha_blend=True),
        "soft(0.7) ": dataclasses.replace(cfg, soft_edge_temp=0.7),
    }
    # measure the auto slot counts FIRST (their int() readback poisons
    # dispatch pipelining — all timed loops must run after... no:
    # before any D2H.  So compute auto Ks from a THROWAWAY subprocess?
    # cheapest correct order: K is scene-static here (max_writes=2,
    # PERF.md) — read it once via env override or accept the known 2.
    auto_k = {name: int(os.environ.get("AUTO_K", "2"))
              for name in modes if not name.startswith("hard")}
    losses = []
    for name, c in modes.items():
        bench(name + " K=8   ", make_loop(static, c, True), params, losses)
        if not name.startswith("hard"):
            k = auto_k[name]
            bench(f"{name} K={k}auto",
                  make_loop(static, c, True, slots=k), params, losses)
    # verify the assumed K against the measured ceiling (D2H is fine
    # now — all timing is done) and print the deferred losses
    for name, c in modes.items():
        if not name.startswith("hard"):
            m = pipeline.measure_max_writes(params, static, c)
            print(f"{name}: measured max_writes={m} "
                  f"(K={auto_k[name]} {'OK' if auto_k[name] >= m else 'TOO SMALL'})",
                  flush=True)
    for name, loss in losses:
        print(f"loss {name}: {float(loss):.4e}", flush=True)


if __name__ == "__main__":
    main()
