"""OBJ loader: round-trip, fan triangulation, index conventions, RT use."""
import numpy as np

from skybox_rt_tpu.models import obj, scenes


def test_roundtrip(tmp_path):
    verts, faces = scenes.icosphere(subdiv=1)
    p = str(tmp_path / "s.obj")
    obj.save_obj(p, verts, faces)
    m = obj.load_obj(p)
    np.testing.assert_allclose(m["verts"], verts, atol=1e-5)
    np.testing.assert_array_equal(m["faces"], faces)


def test_quads_and_negative_indices(tmp_path):
    p = str(tmp_path / "q.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n")
        f.write("f 1/1 2/2 3/3 4/4\n")       # quad -> 2 tris
        f.write("f -4 -3 -2\n")              # negative (relative) indices
    m = obj.load_obj(p)
    assert m["faces"].shape == (3, 3)
    np.testing.assert_array_equal(m["faces"][0], [0, 1, 2])
    np.testing.assert_array_equal(m["faces"][1], [0, 2, 3])
    np.testing.assert_array_equal(m["faces"][2], [0, 1, 2])
    np.testing.assert_allclose(m["uvs"][2], [1, 1])


def test_obj_feeds_rt(tmp_path):
    import jax.numpy as jnp

    from skybox_rt_tpu.rt import intersect

    verts, faces = scenes.icosphere(subdiv=1)
    p = str(tmp_path / "s.obj")
    obj.save_obj(p, verts, faces)
    m = obj.load_obj(p)
    tri = intersect.triangle_arrays(jnp.asarray(m["verts"]),
                                    jnp.asarray(m["faces"]))
    o = jnp.asarray([[0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    prim, t, u, v = intersect.closest_hit_bruteforce(o, d, *tri)
    assert int(prim[0]) >= 0 and abs(float(t[0]) - 2.0) < 0.1
