"""Streaming wide-BVH structural invariants + traversal ≡ brute-force."""

import pytest
import numpy as np
import jax.numpy as jnp

from caitlynrenderer_tpu.accel.bvh import build_bvh, reorder_scene
from caitlynrenderer_tpu.accel.wide import build_wide
from caitlynrenderer_tpu.io.builtin_scenes import cornell_box, random_triangle_soup, displaced_grid
from caitlynrenderer_tpu.ops import intersect as isect
from caitlynrenderer_tpu.ops.traverse_wide import (
    chunked_wide_anyhit,
    chunked_wide_closest,
    wide_anyhit,
    wide_closest,
)


def _build(scene, kg=512):
    bvh = build_bvh(scene.vertices, scene.tri_v, max_leaf=4)
    sr = reorder_scene(scene, bvh)
    wb = build_wide(np.asarray(sr.vertices), np.asarray(sr.tri_v), bvh, group_tris=kg)
    return sr, wb


def _scenes():
    return [
        ("cornell", cornell_box()[0], 64),
        ("soup", random_triangle_soup(2000, seed=1)[0], 256),
        ("grid", displaced_grid(resolution=24)[0], 512),
    ]


def test_wide_invariants():
    for name, scene, kg in _scenes():
        sr, wb = _build(scene, kg)
        t = scene.num_triangles
        g, k = wb.shape
        # Every triangle appears exactly once across group blocks.
        ids = wb.tri_index[wb.tri_index >= 0]
        assert sorted(ids.tolist()) == list(range(t)), name
        # Group bounds contain their triangles.
        verts = np.asarray(sr.vertices)
        tv = np.asarray(sr.tri_v)
        for gi in range(g):
            tri_ids = wb.tri_index[gi]
            tri_ids = tri_ids[tri_ids >= 0]
            if len(tri_ids) == 0:
                continue
            bmin = wb.group_bounds[gi, :3]
            bmax = wb.group_bounds[gi, 3:]
            pts = verts[tv[tri_ids, :3].reshape(-1)]
            assert (pts >= bmin - 1e-4).all() and (pts <= bmax + 1e-4).all(), name
        # Packed geometry matches the scene triangles.
        sel = wb.tri_index.reshape(-1) >= 0
        packed = wb.packed_tris.reshape(-1, 9)[sel]
        tid = wb.tri_index.reshape(-1)[sel]
        v0 = verts[tv[tid, 0]]
        np.testing.assert_allclose(packed[:, :3], v0, rtol=1e-6, err_msg=name)


def _random_rays(scene, n, seed):
    rng = np.random.default_rng(seed)
    lo = scene.vertices.min(axis=0) - 1.0
    hi = scene.vertices.max(axis=0) + 1.0
    o = (rng.random((n, 3)).astype(np.float32)) * (hi - lo) + lo
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_wide_matches_brute():
    for name, scene, kg in _scenes():
        sr, wb = _build(scene, kg)
        o, d = _random_rays(scene, 512, seed=9)
        verts = jnp.asarray(sr.vertices)
        tri_v = jnp.asarray(sr.tri_v)
        t_b, tri_b, _, _ = isect.intersect_brute(jnp.asarray(o), jnp.asarray(d), verts, tri_v)
        t_w, tri_w, u_w, v_w = wide_closest(
            jnp.asarray(o), jnp.asarray(d), jnp.ones(512, bool),
            jnp.asarray(wb.group_bounds), jnp.asarray(wb.packed_tris),
            jnp.asarray(wb.tri_index),
        )
        hit_b = np.asarray(tri_b) >= 0
        hit_w = np.asarray(tri_w) >= 0
        np.testing.assert_array_equal(hit_b, hit_w, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(t_w)[hit_b], np.asarray(t_b)[hit_b], rtol=1e-5, err_msg=name
        )
        same = np.asarray(tri_w) == np.asarray(tri_b)
        close = np.isclose(np.asarray(t_w), np.asarray(t_b), rtol=1e-5)
        assert (same | close)[hit_b].all(), name


def test_chunked_matches_unchunked():
    scene, _ = random_triangle_soup(2000, seed=2)
    sr, wb = _build(scene, 256)
    o, d = _random_rays(scene, 700, seed=10)  # not a multiple of chunk
    args = (
        jnp.asarray(wb.group_bounds), jnp.asarray(wb.packed_tris),
        jnp.asarray(wb.tri_index),
    )
    act = jnp.ones(700, bool)
    a = wide_closest(jnp.asarray(o), jnp.asarray(d), act, *args)
    b = chunked_wide_closest(jnp.asarray(o), jnp.asarray(d), act, *args, chunk_size=256)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    t_max = jnp.full(700, 3.0)
    oa = wide_anyhit(jnp.asarray(o), jnp.asarray(d), t_max, act, *args)
    ob = chunked_wide_anyhit(jnp.asarray(o), jnp.asarray(d), t_max, act, *args, chunk_size=256)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_wide_anyhit_matches_brute():
    for name, scene, kg in _scenes():
        sr, wb = _build(scene, kg)
        o, d = _random_rays(scene, 512, seed=13)
        t_max = np.full(512, 3.5, np.float32)
        verts = jnp.asarray(sr.vertices)
        tri_v = jnp.asarray(sr.tri_v)
        occ_b = isect.occluded_brute(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), verts, tri_v
        )
        occ_w = wide_anyhit(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), jnp.ones(512, bool),
            jnp.asarray(wb.group_bounds), jnp.asarray(wb.packed_tris),
            jnp.asarray(wb.tri_index),
        )
        np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_w), err_msg=name)


def test_wide_inactive_lanes():
    scene, _ = cornell_box()
    sr, wb = _build(scene, 64)
    o, d = _random_rays(scene, 64, seed=2)
    t, tri, _, _ = wide_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.zeros(64, bool),
        jnp.asarray(wb.group_bounds), jnp.asarray(wb.packed_tris),
        jnp.asarray(wb.tri_index),
    )
    assert (np.asarray(tri) == -1).all()


@pytest.mark.slow
def test_wide_end_to_end_parity(cornell):
    """Full integrator with accel="wide" matches the oracle."""
    import jax
    from caitlynrenderer_tpu.core.types import RenderOptions
    from caitlynrenderer_tpu.cpu_reference import integrator as oracle
    from caitlynrenderer_tpu.render import sampling
    from caitlynrenderer_tpu.render.integrator import render_sample
    from caitlynrenderer_tpu.scene import upload_scene

    scene, camera = cornell
    ds = upload_scene(scene, accel="wide")
    w = h = 32
    depth = 3
    options = RenderOptions(width=w, height=h, max_depth=depth, accel="wide")
    uniforms = np.asarray(sampling.draw_uniforms(jax.random.PRNGKey(4), w * h, depth))
    img_o = oracle.render(scene, camera, w, h, uniforms, max_depth=depth)
    img_d = np.asarray(
        render_sample(ds, camera, jnp.asarray(uniforms), w, h, options)
    ).reshape(h, w, 3)
    diff = np.abs(img_d - img_o)
    bad = (diff > 2e-3 + 0.05 * np.abs(img_o)).any(axis=-1)
    assert bad.mean() < 0.01
