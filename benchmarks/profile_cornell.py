#!/usr/bin/env python
"""Split the cornell 256²/4 frame (the bench.py headline) into its parts.

Stages timed independently on the real chip, each jitted + blocked:
  * full render_sample frame (the headline denominator)
  * the 4 closest-hit queries alone (Pallas brute, realistic ray mix)
  * the 4 any-hit queries alone
  * frame with traversal stubbed (shade/NEE/sampling overhead)

Usage: python benchmarks/profile_cornell.py [--width 256] [--depth 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps * 1e3


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from caitlynrenderer_tpu.core.camera import generate_rays
    from caitlynrenderer_tpu.core.types import RenderOptions, make_camera
    from caitlynrenderer_tpu.io import builtin_scenes
    from caitlynrenderer_tpu.ops import intersect as isect
    from caitlynrenderer_tpu.ops.pallas_mt import (
        brute_anyhit_pallas,
        brute_closest_pallas,
    )
    from caitlynrenderer_tpu.render import sampling
    from caitlynrenderer_tpu.render.integrator import render_sample
    from caitlynrenderer_tpu.scene import scene_families, upload_scene

    scene, _ = builtin_scenes.cornell_box()
    pos = np.array([2.78, 2.73, 7.5], np.float32)
    camera = make_camera(pos, pos + np.array([0, 0, -1.0], np.float32), 40.0)
    ds = upload_scene(scene, accel="brute")
    w = h = args.width
    depth = args.depth
    n = w * h
    options = RenderOptions(width=w, height=h, max_depth=depth, accel="brute",
                            families=scene_families(scene))
    key = jax.random.PRNGKey(0)
    uni = sampling.draw_uniforms(key, n, depth)

    frame = jax.jit(lambda u: render_sample(ds, camera, u, w, h, options))
    ms_frame = timeit(frame, uni)
    print(f"full frame             {ms_frame:8.3f} ms")

    # realistic ray mix: primary rays + cosine-ish scattered rays
    o, d = generate_rays(camera, w, h, uni)
    tris9 = isect.pack_tris(ds.scene.vertices, ds.scene.tri_v)
    active = jnp.ones(n, bool)

    closest = jax.jit(
        lambda o, d: brute_closest_pallas(o, d, active, tris9)
    )
    t, tri, u_, v_ = closest(o, d)
    ms_c1 = timeit(closest, o, d)
    print(f"1 closest query        {ms_c1:8.3f} ms   (x{depth} = {depth * ms_c1:.3f})")

    hp = o + d * t[:, None]
    key2 = jax.random.PRNGKey(1)
    d2 = jax.random.normal(key2, (n, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    ms_c2 = timeit(closest, hp, d2)
    print(f"1 closest (bounce mix) {ms_c2:8.3f} ms")

    anyhit = jax.jit(
        lambda o, d: brute_anyhit_pallas(o, d, jnp.full(n, 5.0), active, tris9)
    )
    ms_a = timeit(anyhit, hp, d2)
    print(f"1 anyhit query         {ms_a:8.3f} ms   (x{depth} = {depth * ms_a:.3f})")

    # shading-only: same frame with free traversal (accel="brute" replaced
    # by an identity stub is invasive; instead estimate as
    # frame - depth*(closest + anyhit))
    est = ms_frame - depth * (ms_c2 + ms_a)
    print(f"=> integrator residual {est:8.3f} ms (shade + NEE + raygen + accum)")

    # raygen alone
    rg = jax.jit(lambda u: generate_rays(camera, w, h, u))
    ms_rg = timeit(rg, uni)
    print(f"raygen                 {ms_rg:8.3f} ms")


if __name__ == "__main__":
    main()
