#!/usr/bin/env python
"""Stage-level profile of the mega-path frame (VERDICT r2 directive #1).

Splits a grid100k 256x256x4 frame into:
  (a) XLA cull + sort        (_tile_gmin + _build_wmeta + _sort_order)
  (b) Pallas kernel sweep    (mega_closest minus the XLA prep)
  (c) integrator overhead    (frame minus all traversal calls)

Run:  python benchmarks/profile_mega.py [--scene grid100k] [--width 256]
Prints one JSON dict per probe; commit the numbers with the fix.
"""

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="grid100k")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--group-tris", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from caitlynrenderer_tpu.core.camera import generate_rays
    from caitlynrenderer_tpu.core.types import RenderOptions, make_camera
    from caitlynrenderer_tpu.io import builtin_scenes
    from caitlynrenderer_tpu.ops import traverse_mega as tm
    from caitlynrenderer_tpu.render import sampling
    from caitlynrenderer_tpu.render.integrator import render_sample
    from caitlynrenderer_tpu.scene import scene_families, upload_scene

    if args.scene == "grid100k":
        scene, _ = builtin_scenes.displaced_grid(resolution=224)
        pos = np.array([5.0, 9.0, 11.0], np.float32)
        camera = make_camera(pos, np.array([5.0, 2.0, 5.0], np.float32), 50.0)
    elif args.scene == "grid1m":
        scene, _ = builtin_scenes.displaced_grid(resolution=708)
        pos = np.array([5.0, 9.0, 11.0], np.float32)
        camera = make_camera(pos, np.array([5.0, 2.0, 5.0], np.float32), 50.0)
    else:
        raise SystemExit(f"unknown scene {args.scene}")

    ds = upload_scene(scene, accel="wide", wide_group_tris=args.group_tris)
    g = ds.wb_group_bounds.shape[0]
    w, h, depth = args.width, args.height, args.depth
    n = w * h
    options = RenderOptions(
        width=w, height=h, max_depth=depth, accel="wide",
        families=scene_families(scene),
    )
    report = {
        "scene": args.scene, "tris": int(scene.num_triangles), "groups": g,
        "rays": n, "depth": depth, "device": str(jax.devices()[0]),
    }

    key = jax.random.PRNGKey(0)
    uniforms = sampling.draw_uniforms(key, n, depth)
    o, d = jax.jit(
        lambda u: generate_rays(camera, w, h, u)
    )(uniforms)
    o, d = jax.block_until_ready((o, d))
    active = jnp.ones(n, bool)

    # incoherent bounce-like rays: random origins on scene surface, random dirs
    ko, kd = jax.random.split(jax.random.PRNGKey(1))
    smin = np.asarray(ds.wb_group_bounds[:, :3].min(axis=0))
    smax = np.asarray(ds.wb_group_bounds[:, 3:].max(axis=0))
    o_inc = jax.random.uniform(ko, (n, 3)) * (smax - smin) + smin
    d_inc = jax.random.normal(kd, (n, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)

    # --- full frame
    frame = jax.jit(lambda u: render_sample(ds, camera, u, w, h, options))
    report["frame_ms"] = timeit(frame, uniforms) * 1e3

    # --- traversal calls in isolation
    closest = jax.jit(
        lambda o, d: tm.mega_closest(
            o, d, active, ds.wb_group_bounds, ds.wb_mega, ds.wb_tri_index[:, 0]
        )
    )
    anyhit = jax.jit(
        lambda o, d: tm.mega_anyhit(
            o, d, jnp.full(n, 100.0), active, ds.wb_group_bounds, ds.wb_mega,
            ds.wb_tri_index[:, 0],
        )
    )
    report["closest_primary_ms"] = timeit(closest, o, d) * 1e3
    report["closest_incoherent_ms"] = timeit(closest, o_inc, d_inc) * 1e3
    report["anyhit_incoherent_ms"] = timeit(anyhit, o_inc, d_inc) * 1e3

    # --- XLA prep stages in isolation
    gpad = -(-g // 8) * 8
    n_super = n // tm.SUPER

    gmin_fn = jax.jit(
        lambda o, d, t: tm._tile_gmin(o, d, t, ds.wb_group_bounds, n_super, gpad)
    )
    t_lim = jnp.full(n, 100.0)
    report["tile_gmin_sort_ms"] = timeit(gmin_fn, o, d, t_lim) * 1e3

    wmeta_fn = jax.jit(
        lambda o, d, t: tm._build_wmeta(
            *tm._tile_gmin(o, d, t, ds.wb_group_bounds, n_super, gpad),
            ds.wb_group_bounds, ds.wb_tri_index[:, 0],
        )
    )
    report["gmin_plus_wmeta_ms"] = timeit(wmeta_fn, o, d, t_lim) * 1e3

    sort_fn = jax.jit(
        lambda o, d, t: tm._sort_order(o, d, t, ds.wb_group_bounds)
    )
    report["sort_order_ms"] = timeit(sort_fn, o, d, t_lim) * 1e3

    # traversal with XLA prep but trivial kernel work would need a kernel
    # stub; estimate kernel time = closest - (gmin+wmeta) - sort - reorder.
    report["est_kernel_primary_ms"] = (
        report["closest_primary_ms"]
        - report["gmin_plus_wmeta_ms"]
        - report["sort_order_ms"]
    )
    report["est_kernel_incoherent_ms"] = (
        report["closest_incoherent_ms"]
        - report["gmin_plus_wmeta_ms"]
        - report["sort_order_ms"]
    )
    est_trav = 4 * report["closest_incoherent_ms"] + 4 * report["anyhit_incoherent_ms"]
    report["est_integrator_ms"] = report["frame_ms"] - est_trav
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
