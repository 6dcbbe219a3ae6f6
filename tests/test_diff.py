"""Gradient correctness: finite-difference validation (SURVEY §7 step 4).

The reference has no backward pass, so finite differences are the oracle
for pixel gradients w.r.t. vertex positions, colors, uv, and texels
(north-star config 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes


def _setup(textured=False, soft=0.0):
    params, indices = scenes.triangle()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    if textured:
        params["tex"] = jnp.asarray(scenes.checkerboard_texture(16, 4))
    cfg = pipeline.DiffRenderConfig(
        width=32, height=32, tile_logsize=4, depth_test=True,
        textured=textured, soft_edge_temp=soft,
    )
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 32, 32,
                             tile_logsize=4, inflate_px=2)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg


def _loss_fn(static, cfg):
    def loss(params):
        img = pipeline.render(params, static, cfg)
        # smooth scalar objective over the image
        return jnp.sum(img[..., :3] * jnp.cos(0.1 * jnp.arange(img.shape[1]))
                       [None, :, None])
    return loss


@pytest.mark.parametrize("leaf", ["color", "pos"])
def test_grads_match_finite_differences(leaf):
    params, static, cfg = _setup()
    loss = _loss_fn(static, cfg)
    g = jax.grad(loss)(params)[leaf]

    rng = np.random.default_rng(0)
    p0 = np.asarray(params[leaf], np.float64)
    for _ in range(4):
        idx = tuple(rng.integers(0, s) for s in p0.shape)
        # interior-perturbation FD: small eps so coverage doesn't flip
        eps = 1e-3
        if leaf == "pos" and idx[1] == 3:
            continue  # w perturbation can flip coverage; skip
        pp = {k: v for k, v in params.items()}
        pert = np.asarray(params[leaf]).copy()
        pert[idx] += eps
        pp[leaf] = jnp.asarray(pert)
        lp = float(loss(pp))
        pert2 = np.asarray(params[leaf]).copy()
        pert2[idx] -= eps
        pp[leaf] = jnp.asarray(pert2)
        lm = float(loss(pp))
        fd = (lp - lm) / (2 * eps)
        got = float(g[idx])
        assert abs(fd - got) <= 2e-2 * max(1.0, abs(fd)), (
            f"{leaf}{idx}: fd={fd} grad={got}"
        )


def test_texture_grads():
    params, static, cfg = _setup(textured=True)
    loss = _loss_fn(static, cfg)
    g = jax.grad(loss)(params)
    gt = np.asarray(g["tex"])
    assert np.isfinite(gt).all()
    assert np.abs(gt).sum() > 0  # texels inside the triangle get gradient

    # spot-check one covered texel against FD
    idx = np.unravel_index(np.abs(gt[..., 0]).argmax(), gt[..., 0].shape)
    eps = 1e-3
    t = np.asarray(params["tex"]).copy()
    t[idx][0] += eps
    lp = float(loss({**params, "tex": jnp.asarray(t)}))
    t[idx][0] -= 2 * eps
    lm = float(loss({**params, "tex": jnp.asarray(t)}))
    fd = (lp - lm) / (2 * eps)
    got = float(gt[idx][0])
    assert abs(fd - got) <= 2e-2 * max(1.0, abs(fd))


def test_soft_edge_gives_silhouette_gradient():
    """With edge softening, moving a vertex outward increases covered mass:
    position gradients must be nonzero even for constant colors."""
    params, static, cfg = _setup(soft=1.0)
    params["color"] = jnp.ones_like(params["color"])  # constant color

    def loss(p):
        img = pipeline.render(p, static, cfg)
        return jnp.sum(img[..., :3])

    g = jax.grad(loss)(params)["pos"]
    assert float(jnp.abs(g).sum()) > 0


def test_render_forward_shape_and_background():
    params, static, cfg = _setup()
    img = pipeline.render_cropped(params, static, cfg)
    assert img.shape == (32, 32, 4)
    a = np.asarray(img)
    assert (a[0, 0] == np.array([0, 0, 0, 1], np.float32)).all()  # bg corner
    assert a[..., :3].max() > 0.5  # triangle rendered
