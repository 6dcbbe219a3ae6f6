"""K-slot mode breakdown (VERDICT r3 #3): where do the alpha/soft
512^2 train steps spend their time — K-slot visibility vs slot shade vs
backward — and what does the slot count actually need to be?

Arms: slots in {8, 4, 2}; stages: vis fwd / full fwd / fwd+bwd, compiled
10-iter loops, one window.  Prints max_writes to show which slot counts
are exact for this scene.

Run EXCLUSIVELY, detached.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_chip_bench import SIZE, build  # noqa: E402
from skybox_rt_tpu.diff import pipeline  # noqa: E402

STEPS = 10


def timed_loop(fn, params):
    # params MUST change every iteration or XLA hoists the whole eval out
    # of the fori_loop as loop-invariant (the round-2 DCE trap: a
    # loop-invariant body measures 1 eval / STEPS)
    @jax.jit
    def loop(params):
        def body(_, carry):
            params, acc = carry
            v = fn(params)
            params = {k: (p + 1e-12 * v if p.dtype == jnp.float32 else p)
                      for k, p in params.items()}
            return params, acc + v
        return jax.lax.fori_loop(0, STEPS, body, (params, 0.0))

    out = jax.block_until_ready(loop(params))
    t0 = time.time()
    out = jax.block_until_ready(loop(params))
    return (time.time() - t0) / STEPS * 1e3, float(out[1])


def main():
    print("devices:", jax.devices(), flush=True)
    params, static, cfg0, P = build()
    ts = 1 << cfg0.tile_logsize

    for mode_name, cfg in [
        ("alpha", dataclasses.replace(cfg0, alpha_blend=True)),
        ("soft", dataclasses.replace(cfg0, soft_edge_temp=0.7)),
    ]:
        # actual per-pixel write count for this scene/mode
        setup = pipeline.prim_setup(params, static["indices"], cfg)
        _, maxw = pipeline.visibility_slots(
            setup, static["tile_pids"], static["tile_xy"] * ts, cfg, 8)
        print(f"{mode_name}: max_writes={int(maxw)}", flush=True)

        for slots in (8, 4, 2):
            def vis_only(params, cfg=cfg, slots=slots):
                setup = pipeline.prim_setup(params, static["indices"], cfg)
                ss, mw = pipeline.visibility_slots(
                    setup, static["tile_pids"], static["tile_xy"] * ts,
                    cfg, slots)
                return jnp.sum(ss).astype(jnp.float32)

            def fwd(params, cfg=cfg, slots=slots):
                img, _ = pipeline.render_deferred(params, static, cfg,
                                                  slots=slots)
                return jnp.sum(img)

            def fwd_bwd(params, cfg=cfg, slots=slots):
                def loss(p):
                    img, _ = pipeline.render_deferred(p, static, cfg,
                                                      slots=slots)
                    return jnp.sum(img ** 2)
                l, g = jax.value_and_grad(loss)(params)
                return l + sum(jnp.sum(v) for v in g.values())

            tv, _ = timed_loop(vis_only, params)
            tf, _ = timed_loop(fwd, params)
            tb, _ = timed_loop(fwd_bwd, params)
            print(f"{mode_name} K={slots}: vis {tv:.2f}  fwd {tf:.2f}  "
                  f"fwd+bwd {tb:.2f} ms/step "
                  f"({SIZE*SIZE/tb/1e3:.1f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
