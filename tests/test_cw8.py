"""CWBVH Pallas-walk packing invariants (host math; the kernel itself is
TPU-only — its parity vs brute MT is exercised on hardware, see the
`tpu` marker test at the bottom and the verify skill)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caitlynrenderer_tpu.accel.bvh import build_bvh, reorder_scene
from caitlynrenderer_tpu.accel.cwbvh import build_cwbvh
from caitlynrenderer_tpu.io.builtin_scenes import random_triangle_soup
from caitlynrenderer_tpu.ops.traverse_cw8 import NROWS, WIN, pack_cw8


def _cw(scene):
    bvh = build_bvh(scene.vertices, scene.tri_v, max_leaf=3)
    sr = reorder_scene(scene, bvh)
    cw = build_cwbvh(bvh, np.asarray(sr.vertices), np.asarray(sr.tri_v))
    tv = np.asarray(sr.tri_v)[cw.tri_order]
    verts = np.asarray(sr.vertices)
    p0 = verts[tv[:, 0]]
    cw_tris = np.concatenate(
        [p0, verts[tv[:, 1]] - p0, verts[tv[:, 2]] - p0], axis=1
    ).astype(np.float32)
    return cw, cw_tris


def test_pack_cw8_layout():
    scene, _ = random_triangle_soup(500, seed=4)
    cw, cw_tris = _cw(scene)
    nodes1, planes32, bounds = pack_cw8(cw.nodes, cw_tris)
    n8 = cw.nodes.shape[0]
    assert nodes1.shape == (n8 + NROWS, 128)
    np.testing.assert_array_equal(nodes1[:n8, :20], cw.nodes)
    assert (nodes1[:n8, 20:] == 0).all() and (nodes1[n8:] == 0).all()
    t = cw_tris.shape[0]
    assert planes32.shape == (-(-t // WIN), 4, 128)
    # bounds covers all vertices
    v1 = cw_tris[:, 0:3] + cw_tris[:, 3:6]
    v2 = cw_tris[:, 0:3] + cw_tris[:, 6:9]
    allv = np.concatenate([cw_tris[:, 0:3], v1, v2])
    assert (allv >= bounds[0, :3] - 1e-5).all()
    assert (allv <= bounds[0, 3:] + 1e-5).all()


def test_pack_cw8_window_planes_match_moller_trumbore():
    """Evaluate each window's Baldwin–Weber planes in numpy against MT on
    aimed rays: the window sweep must accept exactly the aimed triangle
    with matching t."""
    scene, _ = random_triangle_soup(300, seed=8)
    cw, cw_tris = _cw(scene)
    _, planes32, _ = pack_cw8(cw.nodes, cw_tris)
    rng = np.random.default_rng(0)
    t_count = cw_tris.shape[0]
    tid = rng.integers(0, t_count, 128)
    cen = cw_tris[tid, 0:3] + (cw_tris[tid, 3:6] + cw_tris[tid, 6:9]) / 3.0
    o = cen + rng.standard_normal((128, 3)).astype(np.float32) * 2.0
    d = cen - o
    nr = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / nr
    for i in range(0, 128, 7):
        w = tid[i] // WIN
        pg = planes32[w]
        nv, dn = pg[0:3, 0:WIN], pg[3, 0:WIN]
        pu, du = pg[0:3, WIN : 2 * WIN], pg[3, WIN : 2 * WIN]
        pv, dv = pg[0:3, 2 * WIN : 3 * WIN], pg[3, 2 * WIN : 3 * WIN]
        with np.errstate(all="ignore"):
            t = -(o[i] @ nv + dn) / (d[i] @ nv)
            u = (o[i] @ pu + du) + t * (d[i] @ pu)
            v = (o[i] @ pv + dv) + t * (d[i] @ pv)
        col = tid[i] % WIN
        assert u[col] >= -1e-4 and v[col] >= -1e-4 and u[col] + v[col] <= 1 + 1e-4
        np.testing.assert_allclose(t[col], nr[i, 0], rtol=1e-4)
        # pad columns (zero planes) never accept
        ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
        tri_ids = w * WIN + np.arange(WIN)
        assert not ok[tri_ids >= t_count].any()


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas cw8 kernel is TPU-only"
)
def test_cw8_kernel_matches_brute_tpu():
    from caitlynrenderer_tpu.ops import intersect as isect
    from caitlynrenderer_tpu.ops.traverse_cw8 import cw8_anyhit, cw8_closest
    from caitlynrenderer_tpu.scene import upload_scene

    scene, _ = random_triangle_soup(2000, seed=1)
    ds = upload_scene(scene, accel="cwbvh")
    rng = np.random.default_rng(0)
    n = 512
    o = rng.random((n, 3)).astype(np.float32) * 12 - 1
    d = rng.standard_normal((n, 3)).astype(np.float32)
    tid = rng.integers(0, scene.num_triangles, n // 2)
    cen = np.asarray(scene.vertices)[np.asarray(scene.tri_v)[tid, :3]].mean(1)
    d[: n // 2] = cen - o[: n // 2]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    act = jnp.ones(n, bool)
    t_k, tri_k, _ = cw8_closest(
        oj, dj, act, ds.cw_nodes4, ds.cw_planes, ds.cw_bounds
    )
    sc = ds.scene
    t_b, tri_b, _, _ = isect.intersect_brute(oj, dj, sc.vertices, sc.tri_v)
    np.testing.assert_array_equal(
        np.asarray(tri_k) >= 0, np.asarray(tri_b) >= 0
    )
    occ_k = cw8_anyhit(
        oj, dj, jnp.full(n, 3.0), act, ds.cw_nodes4, ds.cw_planes,
        ds.cw_bounds,
    )
    occ_b = isect.occluded_brute(oj, dj, jnp.full(n, 3.0), sc.vertices, sc.tri_v)
    np.testing.assert_array_equal(np.asarray(occ_k), np.asarray(occ_b))
