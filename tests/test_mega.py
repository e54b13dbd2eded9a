"""Packet megakernel (ops/traverse_mega v3) ≡ brute force, direct tests.

On CPU these exercise the module's dense XLA reference (the non-TPU
execution path, mathematically identical Baldwin–Weber math and the
oracle the kernel is measured against on hardware); one subprocess test
forces the actual Pallas kernel through the interpreter on a small case
(r2 verdict #5: no traversal module without a dedicated test file).
Covers: closest-hit and any-hit brute parity on mixed hit-rate ray sets,
the pack_mega Baldwin–Weber plane math on adversarial triangles,
origin-group sort-hint invariance, inactive lanes, and the any-hit
early-exit path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caitlynrenderer_tpu.accel.bvh import build_bvh, reorder_scene
from caitlynrenderer_tpu.accel.wide import build_wide
from caitlynrenderer_tpu.io.builtin_scenes import (
    cornell_box,
    displaced_grid,
    random_triangle_soup,
)
from caitlynrenderer_tpu.ops import intersect as isect
from caitlynrenderer_tpu.ops.traverse_mega import (
    mega_anyhit,
    mega_closest,
    pack_mega,
    pack_octants,
)


def _build(scene, kg=128):
    bvh = build_bvh(scene.vertices, scene.tri_v, max_leaf=4)
    sr = reorder_scene(scene, bvh)
    wb = build_wide(
        np.asarray(sr.vertices), np.asarray(sr.tri_v), bvh, group_tris=kg
    )
    planes = jnp.asarray(pack_mega(wb.packed_tris, wb.tri_index))
    ob, og_, os_, oblk = pack_octants(wb.group_bounds, wb.tri_index[:, 0])
    args = (
        jnp.asarray(wb.group_bounds), planes,
        jnp.asarray(ob), jnp.asarray(og_), jnp.asarray(os_),
        jnp.asarray(oblk),
    )
    return sr, args


def _scenes():
    return [
        ("cornell", cornell_box()[0], 64),
        ("soup", random_triangle_soup(2000, seed=1)[0], 128),
        ("grid", displaced_grid(resolution=24)[0], 128),
    ]


def _mixed_rays(scene, n, seed):
    """~Half rays aimed at random triangles (high hit rate), half fully
    random (the r2 verdict flagged a 49/1024-hit scratch check as too
    miss-heavy to trust)."""
    rng = np.random.default_rng(seed)
    lo = scene.vertices.min(axis=0) - 1.0
    hi = scene.vertices.max(axis=0) + 1.0
    o = (rng.random((n, 3)).astype(np.float32)) * (hi - lo) + lo
    d = rng.standard_normal((n, 3)).astype(np.float32)
    # aim the first half at random triangle centroids
    h = n // 2
    tid = rng.integers(0, scene.num_triangles, h)
    tv = np.asarray(scene.tri_v)[tid, :3]
    cen = np.asarray(scene.vertices)[tv].mean(axis=1)
    d[:h] = cen - o[:h]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_closest_matches_brute(sr, args, o, d, tag):
    n = o.shape[0]
    verts = jnp.asarray(sr.vertices)
    tri_v = jnp.asarray(sr.tri_v)
    t_b, tri_b, _, _ = isect.intersect_brute(o, d, verts, tri_v)
    t_m, tri_m, grp = mega_closest(o, d, jnp.ones(n, bool), *args)
    hit_b = np.asarray(tri_b) >= 0
    hit_m = np.asarray(tri_m) >= 0
    np.testing.assert_array_equal(hit_b, hit_m, err_msg=tag)
    # Baldwin–Weber t within float tolerance of Möller–Trumbore t.
    np.testing.assert_allclose(
        np.asarray(t_m)[hit_b], np.asarray(t_b)[hit_b], rtol=5e-4,
        err_msg=tag,
    )
    # id-or-t-close (ties within tolerance may pick either triangle)
    same = np.asarray(tri_m) == np.asarray(tri_b)
    close = np.isclose(np.asarray(t_m), np.asarray(t_b), rtol=5e-4)
    assert (same | close)[hit_b].all(), tag
    return tri_m, grp


def test_mega_closest_matches_brute():
    for tag, scene, kg in _scenes():
        sr, args = _build(scene, kg)
        o, d = _mixed_rays(scene, 512, seed=9)
        tri_m, grp = _assert_closest_matches_brute(sr, args, o, d, tag)
        hits = np.asarray(tri_m) >= 0
        assert hits.mean() > 0.5, f"{tag}: ray set not hit-heavy enough"
        # winning group contains the winning triangle
        g = np.asarray(grp)[hits]
        tri = np.asarray(tri_m)[hits]
        starts = np.asarray(args[4])  # oct_start — use oct 0 order instead
        # simpler check via group tri ranges from the wide build:
        bvh = build_bvh(scene.vertices, scene.tri_v, max_leaf=4)
        wb = build_wide(
            np.asarray(sr.vertices), np.asarray(sr.tri_v), bvh, group_tris=kg
        )
        lo = wb.tri_index[g, 0]
        hi_ = lo + (wb.tri_index[g] >= 0).sum(axis=1)
        assert ((tri >= lo) & (tri < hi_)).all(), tag


def test_mega_og_hint_does_not_change_results():
    """The origin-group argument is a sort hint only — any value must
    yield identical hits."""
    tag, scene, kg = _scenes()[2]
    sr, args = _build(scene, kg)
    o, d = _mixed_rays(scene, 256, seed=3)
    act = jnp.ones(256, bool)
    t0, tri0, _ = mega_closest(o, d, act, *args, og=None)
    rng = np.random.default_rng(0)
    og = jnp.asarray(rng.integers(0, 50, 256).astype(np.int32))
    t1, tri1, _ = mega_closest(o, d, act, *args, og=og)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)


def test_mega_anyhit_matches_brute():
    for tag, scene, kg in _scenes()[:2]:
        sr, args = _build(scene, kg)
        o, d = _mixed_rays(scene, 512, seed=13)
        # long enough that the centroid-aimed half actually occludes
        t_max = jnp.full(512, 30.0, jnp.float32)
        verts = jnp.asarray(sr.vertices)
        tri_v = jnp.asarray(sr.tri_v)
        occ_b = isect.occluded_brute(o, d, t_max, verts, tri_v)
        occ_m = mega_anyhit(o, d, t_max, jnp.ones(512, bool), *args)
        np.testing.assert_array_equal(
            np.asarray(occ_b), np.asarray(occ_m), err_msg=tag
        )
        assert np.asarray(occ_m).mean() > 0.4, f"{tag}: early-exit unexercised"


def test_mega_inactive_lanes():
    tag, scene, kg = _scenes()[0]
    sr, args = _build(scene, kg)
    o, d = _mixed_rays(scene, 128, seed=2)
    t, tri, grp = mega_closest(o, d, jnp.zeros(128, bool), *args)
    assert (np.asarray(tri) == -1).all()
    assert (np.asarray(t) >= 1e8).all()
    occ = mega_anyhit(o, d, jnp.full(128, 5.0), jnp.zeros(128, bool), *args)
    assert not np.asarray(occ).any()


def test_mega_partial_active_mask():
    tag, scene, kg = _scenes()[1]
    sr, args = _build(scene, kg)
    o, d = _mixed_rays(scene, 256, seed=5)
    act = jnp.asarray((np.arange(256) % 3) != 0)
    t_a, tri_a, _ = mega_closest(o, d, act, *args)
    t_f, tri_f, _ = mega_closest(o, d, jnp.ones(256, bool), *args)
    act_np = np.asarray(act)
    np.testing.assert_array_equal(
        np.asarray(tri_a)[act_np], np.asarray(tri_f)[act_np]
    )
    assert (np.asarray(tri_a)[~act_np] == -1).all()


def test_mega_ray_count_not_multiple_of_tile():
    """Padding path: n not a multiple of 128."""
    tag, scene, kg = _scenes()[0]
    sr, args = _build(scene, kg)
    o, d = _mixed_rays(scene, 200, seed=7)
    _assert_closest_matches_brute(sr, args, o, d, "pad200")


@pytest.mark.slow
def test_mega_kernel_interpret_smoke():
    """The actual Pallas kernel (forced via MEGA_FORCE_KERNEL=1, running
    interpreted on CPU) agrees with the dense XLA reference path on a
    small mixed-ray case — the only in-suite run of the kernel itself;
    hardware parity is covered by bench/verify on the real chip."""
    import os
    import subprocess
    import sys

    code = r"""
import numpy as np
import jax, jax.numpy as jnp
from caitlynrenderer_tpu.accel.bvh import build_bvh, reorder_scene
from caitlynrenderer_tpu.accel.wide import build_wide
from caitlynrenderer_tpu.io.builtin_scenes import random_triangle_soup
import caitlynrenderer_tpu.ops.traverse_mega as tm

assert tm._use_kernel()  # env must force the kernel path
scene, _ = random_triangle_soup(600, seed=3)
bvh = build_bvh(scene.vertices, scene.tri_v, max_leaf=4)
sr = reorder_scene(scene, bvh)
wb = build_wide(np.asarray(sr.vertices), np.asarray(sr.tri_v), bvh,
                group_tris=128)
planes = jnp.asarray(tm.pack_mega(wb.packed_tris, wb.tri_index))
ob, ogi, osi, oblk = tm.pack_octants(wb.group_bounds, wb.tri_index[:, 0])
args = (jnp.asarray(wb.group_bounds), planes, jnp.asarray(ob),
        jnp.asarray(ogi), jnp.asarray(osi), jnp.asarray(oblk))
rng = np.random.default_rng(0)
n = 128
o = rng.random((n, 3)).astype(np.float32) * 12 - 1
dd = rng.standard_normal((n, 3)).astype(np.float32)
tid = rng.integers(0, scene.num_triangles, n // 2)
cen = np.asarray(scene.vertices)[np.asarray(scene.tri_v)[tid, :3]].mean(1)
dd[: n // 2] = cen - o[: n // 2]
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
o, dd = jnp.asarray(o), jnp.asarray(dd)
act = jnp.ones(n, bool)
t_k, tri_k, grp_k = jax.jit(
    lambda o, d: tm.mega_closest(o, d, act, *args)
)(o, dd)
tl = tm._scene_exit_bound(o, dd, jnp.full(n, 1e9), args[0])
g = planes.shape[0]
starts = jnp.zeros(g, jnp.int32).at[jnp.asarray(ogi)[0, :g]].set(
    jnp.asarray(osi)[0, :g])
t_r, tri_r, grp_r = tm._xla_reference(o, dd, tl, starts, planes, False)
hit_k = np.asarray(tri_k) >= 0
hit_r = np.asarray(tri_r) >= 0
np.testing.assert_array_equal(hit_k, hit_r)
tk, tr = np.asarray(t_k)[hit_k], np.asarray(t_r)[hit_k]
np.testing.assert_allclose(tk, tr, rtol=1e-5)
occ_k = jax.jit(
    lambda o, d: tm.mega_anyhit(o, d, jnp.full(n, 3.0), act, *args)
)(o, dd)
(occ_r,) = tm._xla_reference(o, dd, jnp.minimum(tl, 3.0), starts, planes,
                             True)
np.testing.assert_array_equal(np.asarray(occ_k), np.asarray(occ_r) > 0)
print("KERNEL_SMOKE_OK")
"""
    env = dict(os.environ)
    env.update({"MEGA_FORCE_KERNEL": "1", "JAX_PLATFORMS": "cpu"})
    env.pop("XLA_FLAGS", None)  # single-device is fine and faster
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert "KERNEL_SMOKE_OK" in out.stdout, out.stdout + out.stderr


# ---------------------------------------------------------------------------
# pack_mega plane math on adversarial triangles (r2 verdict #5)
# ---------------------------------------------------------------------------


def _bw_eval(planes, kp, o, d):
    """NumPy Baldwin–Weber evaluation of one packed group block against
    rays — the same math the kernel's banded matmul performs."""
    n_, dn = planes[0:3, 0:kp], planes[3, 0:kp]
    pu, du = planes[0:3, kp : 2 * kp], planes[3, kp : 2 * kp]
    pv, dv = planes[0:3, 2 * kp : 3 * kp], planes[3, 2 * kp : 3 * kp]
    an = o @ n_ + dn[None, :]
    bn = d @ n_
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -an / bn
        u = (o @ pu + du[None, :]) + t * (d @ pu)
        v = (o @ pv + dv[None, :]) + t * (d @ pv)
    ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0)
    return np.where(ok, t, np.inf), u, v


def test_pack_mega_adversarial_triangles():
    """Slivers, axis-aligned triangles, t near 0, degenerate padding —
    Baldwin–Weber acceptance must agree with Möller–Trumbore."""
    tris = np.array(
        [
            # thin sliver
            [[0, 0, 0], [1, 0, 0], [0.5, 1e-5, 0.0]],
            # axis-aligned in each plane
            [[0, 0, 1], [1, 0, 1], [0, 1, 1]],
            [[0, 1, 0], [1, 1, 0], [0, 1, 1]],
            [[1, 0, 0], [1, 1, 0], [1, 0, 1]],
            # tiny triangle near the origin (t near 0 hits)
            [[1e-4, -1e-4, 1e-3], [1e-4, 1e-4, 1e-3], [-1e-4, 0, 1e-3]],
            # large oblique
            [[-5, -5, 4], [5, -5, 4], [0, 5, 4]],
            # degenerate (colinear) — must never hit
            [[0, 0, 2], [1, 1, 2], [2, 2, 2]],
        ],
        np.float64,
    )
    k = tris.shape[0]
    packed = np.concatenate(
        [tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]],
        axis=1,
    ).astype(np.float32)[None]  # (1, k, 9)
    idx = np.arange(k, dtype=np.int32)[None]
    planes = pack_mega(packed, idx)[0]  # (8, 3*kp)
    kp = planes.shape[1] // 3

    rng = np.random.default_rng(11)
    n = 512
    o = rng.standard_normal((n, 3)).astype(np.float64) * 2
    o[:, 2] -= 3.0
    d = rng.standard_normal((n, 3)).astype(np.float64)
    # aim half at the triangles
    cen = tris.mean(axis=1)
    d[: n // 2] = cen[rng.integers(0, k, n // 2)] - o[: n // 2]
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_bw, _, _ = _bw_eval(planes.astype(np.float64), kp, o, d)
    t_bw = t_bw[:, :k].min(axis=1)

    # Möller–Trumbore oracle in float64
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
    pvec = np.cross(d[:, None, :], e2[None])
    det = (pvec * e1[None]).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = o[:, None, :] - v0[None]
        u = (tv * pvec).sum(-1) * inv
        qv = np.cross(tv, e1[None])
        v = (qv * d[:, None, :]).sum(-1) * inv
        t = (qv * e2[None]).sum(-1) * inv
    ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t_mt = np.where(ok, t, np.inf).min(axis=1)

    hit_bw = np.isfinite(t_bw)
    hit_mt = np.isfinite(t_mt)
    # Acceptance may differ only for grazing edge hits; require ≥99.5%
    # agreement and t parity on agreed hits.
    agree = hit_bw == hit_mt
    assert agree.mean() > 0.995
    both = hit_bw & hit_mt
    np.testing.assert_allclose(t_bw[both], t_mt[both], rtol=1e-4, atol=1e-7)
    # the degenerate triangle never reports a hit
    t_deg, _, _ = _bw_eval(planes.astype(np.float64), kp, o, d)
    assert not np.isfinite(t_deg[:, k - 1]).any()


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled mega kernel is TPU-only"
)
def test_mega_kernel_matches_brute_on_hardware():
    """COMPILED-kernel parity on the real chip (the CPU suite can only run
    the interpreted kernel).  Part of the documented hardware tier:
    CAITLYN_TEST_PLATFORM=tpu pytest -m tpu.  One scene: each distinct
    (gpad, kp) is a fresh ~60 s kernel compile, and the CPU interpret
    test already covers the shape variants."""
    tag, scene, kg = _scenes()[1]  # 2000-tri soup
    sr, args = _build(scene, kg)
    o, d = _mixed_rays(sr, 512, seed=7)
    tri_m, grp = _assert_closest_matches_brute(sr, args, o, d, tag)
    # any-hit agrees with brute occlusion on the same rays
    t_b, tri_b, _, _ = isect.intersect_brute(
        o, d, jnp.asarray(sr.vertices), jnp.asarray(sr.tri_v)
    )
    occ_b = np.asarray(tri_b) >= 0
    occ_m = np.asarray(
        mega_anyhit(o, d, jnp.full(o.shape[0], 1e9), jnp.ones(o.shape[0], bool), *args)
    )
    np.testing.assert_array_equal(occ_b, occ_m, err_msg=tag)
