"""Tunnel-caching probe: are repeated IDENTICAL dispatches real?

The fwd benches show two 'regimes' ~60x apart for the same compiled
code.  Hypothesis: repeated dispatches of the same executable with the
same inputs are memoized somewhere in the axon tunnel, so the
'fast-regime' numbers measure dispatch latency, not device compute.

Probe, interleaved in one window, on the 256^2 tekkaman frame:
  a. 20 dispatched frames, IDENTICAL inputs        (bench.py protocol)
  b. 20 dispatched frames, input perturbed per call (cache-busting, same
     compute: one framebuffer-irrelevant padding texel of the texture
     array XORed with the iteration index)
  c. compiled 20-frame barrier loop                 (known-real compute)

If a << b ~= c/20, the identical-dispatch protocol is measuring a cache.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.geom import cgltrace
    from skybox_rt_tpu.ref import driver

    print("platform:", jax.devices()[0].platform, flush=True)
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))
    SIZE, FRAMES = 256, 20
    frame, arrays = driver.compile_frame(trace, SIZE, SIZE, mode="deferred")
    fb = frame(arrays)
    jax.block_until_ready(fb)

    # b-variant inputs: 20 copies of arrays, each with texels[0] XORed
    # (texel 0 belongs to mip level 0 pixel 0; it changes the image only
    # if sampled — the point is identical COST, different bytes)
    variants = []
    for i in range(FRAMES):
        def bump(t, i=i):
            flat = t.ravel()
            return flat.at[0].set(flat[0] ^ jnp.uint32(i + 1)).reshape(t.shape)
        v = tuple((bump(texels), e, a, tp, txy)
                  for (texels, e, a, tp, txy) in arrays)
        variants.append(v)
    jax.block_until_ready(variants)
    jax.block_until_ready(frame(variants[0]))   # compile parity

    leaves, treedef = jax.tree.flatten(arrays)

    @jax.jit
    def loop(arrays):
        lv, _ = jax.tree.flatten(arrays)

        def body(carry, _):
            fb, acc = carry
            tok = fb[0, 0]
            new = []
            for a in lv:
                a_b, tok_b = jax.lax.optimization_barrier((a, tok))
                new.append(a_b)
                acc = acc + tok_b
            return (frame(jax.tree.unflatten(treedef, new)), acc), None

        (fb, acc), _ = jax.lax.scan(
            body, (jnp.zeros((SIZE, SIZE), jnp.uint32), jnp.uint32(0)),
            None, length=FRAMES)
        return fb, acc

    jax.block_until_ready(loop(arrays))

    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            fb = frame(arrays)
        jax.block_until_ready(fb)
        a = (time.perf_counter() - t0) / FRAMES

        t0 = time.perf_counter()
        for v in variants:
            fb = frame(v)
        jax.block_until_ready(fb)
        b = (time.perf_counter() - t0) / FRAMES

        t0 = time.perf_counter()
        out = loop(arrays)
        jax.block_until_ready(out)
        c = (time.perf_counter() - t0) / FRAMES

        print(f"rep{rep}: identical {a*1e3:.3f} ms/frame | varied "
              f"{b*1e3:.3f} | compiled-loop {c*1e3:.3f}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
