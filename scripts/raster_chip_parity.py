"""On-chip raster parity: Pallas visibility == XLA deferred == immediate.

VERDICT round-1 weak item 2: PERF.md claims Pallas bit-exactness "asserted
on chip" but no checked-in script reproduced it — a Mosaic lowering
regression would be invisible to the CPU-only CI.  This script renders the
golden scenes on the REAL TPU through all three paths and asserts
bit-exact equality against the reference goldens and each other.

Run EXCLUSIVELY and detached (CLAUDE.md):
  setsid nohup timeout 3000 python scripts/raster_chip_parity.py > /tmp/parity.log 2>&1 &
Exit code 0 = parity holds on chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCENES = [("tekkaman", 128), ("carnival", 128), ("vase", 128),
          ("triangle", 64)]
GOLDEN_DIR = "/root/reference/tests/regression/draw3d"


def main():
    import jax

    from skybox_rt_tpu.ref import driver
    from skybox_rt_tpu.utils import image

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()})", flush=True)
    if platform != "tpu":
        print("WARNING: not a TPU — pallas mode will use interpret", flush=True)

    failures = 0
    for scene, size in SCENES:
        frames = {}
        for mode in ("immediate", "deferred", "pallas"):
            t0 = time.time()
            fb = driver.render_scene(scene, size, size, mode=mode)
            dt = time.time() - t0
            frames[mode] = np.asarray(fb)
            golden = f"{GOLDEN_DIR}/{scene}_ref_{size}.png"
            if os.path.exists(golden):
                err, maxd = image.compare_to_golden(fb, golden)
                ok = err == 0 and maxd == 0
            else:
                err = maxd = -1
                ok = True
            status = "OK " if ok else "FAIL"
            failures += 0 if ok else 1
            print(f"{status} {scene}@{size} {mode:<10} {dt:6.1f}s "
                  f"golden err={err} maxd={maxd}", flush=True)
        for mode in ("deferred", "pallas"):
            same = np.array_equal(frames[mode], frames["immediate"])
            print(f"{'OK ' if same else 'FAIL'} {scene}@{size} "
                  f"{mode} == immediate: {same}", flush=True)
            failures += 0 if same else 1

    print(f"{'PARITY OK' if failures == 0 else f'{failures} FAILURES'}",
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
