#!/usr/bin/env python
"""Split the asymptotic per-sample cost of the cornell 256² frame.

With 128-sample launches the dispatch overhead is gone; the remaining
~3.5 ms/sample (depth 4) splits into per-sample fixed work (uniform
generation, raygen, accumulation) and per-bounce work (traversal +
shade + NEE).  This script times scan launches of each piece.

Usage: python benchmarks/profile_sample_overhead.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPP = 64


def scan_time(fn, reps=2):
    """Time a jitted scan launch; returns ms per scan iteration."""
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / SPP * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from caitlynrenderer_tpu.core.camera import generate_rays
    from caitlynrenderer_tpu.core.types import RenderOptions, make_camera
    from caitlynrenderer_tpu.io import builtin_scenes
    from caitlynrenderer_tpu.render import progressive, sampling
    from caitlynrenderer_tpu.scene import scene_families, upload_scene

    scene, _ = builtin_scenes.cornell_box()
    pos = np.array([2.78, 2.73, 7.5], np.float32)
    camera = make_camera(pos, pos + np.array([0, 0, -1.0], np.float32), 40.0)
    ds = upload_scene(scene, accel="brute")
    w = h = 256
    n = w * h
    fam = scene_families(scene)
    pixel_ids = jnp.arange(n, dtype=jnp.int32)
    base_key = jax.random.PRNGKey(0)

    for depth in (1, 2, 4):
        options = RenderOptions(width=w, height=h, max_depth=depth,
                                accel="brute", families=fam)
        st = progressive.init_state(w, h, 0)

        def full(st=st, options=options):
            return progressive.render_steps(ds, camera, st, w, h, options, SPP)

        ms = scan_time(full)
        print(f"depth {depth}: full sample    {ms:7.3f} ms")

    depth = 4

    @jax.jit
    def uniforms_only():
        def body(c, _):
            key = sampling.sample_key(base_key, c)
            uni = sampling.pixel_uniforms(key, pixel_ids, depth)
            return c + 1, jnp.sum(uni[0])
        _, s = jax.lax.scan(body, jnp.int32(0), None, length=SPP)
        return s

    print(f"uniforms only:          {scan_time(uniforms_only):7.3f} ms")

    @jax.jit
    def uniforms_raygen():
        def body(c, _):
            key = sampling.sample_key(base_key, c)
            uni = sampling.pixel_uniforms(key, pixel_ids, depth)
            o, d = generate_rays(camera, w, h, uni)
            return c + 1, jnp.sum(o[0]) + jnp.sum(d[0])
        _, s = jax.lax.scan(body, jnp.int32(0), None, length=SPP)
        return s

    print(f"uniforms + raygen:      {scan_time(uniforms_raygen):7.3f} ms")


if __name__ == "__main__":
    main()
