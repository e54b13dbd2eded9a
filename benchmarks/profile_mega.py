#!/usr/bin/env python
"""Stage-level profile of the mega-path frame (r3 directive #1).

Splits a grid100k 256x256x4 frame into raygen, per-traversal cost on
primary vs bounce rays, and integrator residue.  Env knobs isolate kernel
stages (fresh process per knob — they bake at import):
  MEGA_PHASE_A_ONLY=1   phase A + XLA prep only (no walk)
  MEGA_NO_SWEEP=1       walk without the sweep matmul (DMA + scheduling)
  MEGA_STATS=1          adds a per-tile sweep-step counter output

Run:  python benchmarks/profile_mega.py [--scene grid100k] [--width 256]
Numbers from these probes are recorded in benchmarks/PROFILE_r3.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--group-tris", type=int, default=None)
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
    elif args.scene == "grid1m":
        scene, _ = builtin_scenes.displaced_grid(resolution=708)
    else:
        raise SystemExit(f"unknown scene {args.scene}")
    pos = np.array([5.0, 9.0, 11.0], np.float32)
    camera = make_camera(pos, np.array([5.0, 2.0, 5.0], np.float32), 50.0)

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
        "knobs": {
            k: os.environ.get(k, "0")
            for k in ("MEGA_PHASE_A_ONLY", "MEGA_NO_SWEEP", "MEGA_STATS")
        },
    }

    key = jax.random.PRNGKey(0)
    uniforms = sampling.draw_uniforms(key, n, depth)
    o, d = jax.jit(lambda u: generate_rays(camera, w, h, u))(uniforms)
    o, d = jax.block_until_ready((o, d))
    active = jnp.ones(n, bool)
    stats_on = os.environ.get("MEGA_STATS") == "1"

    margs = (
        ds.wb_group_bounds, ds.wb_mega,
        ds.wb_oct_bounds, ds.wb_oct_gid, ds.wb_oct_start, ds.wb_oct_blk,
    )
    closest = jax.jit(
        lambda o, d, og: tm.mega_closest(o, d, active, *margs, og=og)
    )
    og0 = jnp.zeros(n, jnp.int32)
    if stats_on:
        qj = jax.jit(
            lambda o, d, og: tm._query(
                o, d, jnp.where(active, 1e9, -1e9), og,
                ds.wb_group_bounds, ds.wb_oct_bounds, ds.wb_oct_gid,
                ds.wb_oct_start, ds.wb_oct_blk, ds.wb_mega,
            )
        )
        outs = jax.block_until_ready(qj(o, d, og0))
        steps = np.asarray(outs[0])[:, 0, 0]
        report["primary_steps_per_tile"] = round(float(steps.mean()), 1)
        t, tri, grp = (np.asarray(x) for x in outs[1:])
    else:
        t, tri, grp = jax.block_until_ready(closest(o, d, og0))
        t, tri, grp = np.asarray(t), np.asarray(tri), np.asarray(grp)
        report["closest_primary_ms"] = timeit(closest, o, d, og0) * 1e3

    # realistic bounce rays: hit points + random hemisphere dirs, with the
    # production origin-group sort hint
    hitp = np.asarray(o) + np.asarray(d) * np.where(tri >= 0, t, 5.0)[:, None]
    dirs = np.array(jax.random.normal(jax.random.PRNGKey(7), (n, 3)))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    og = jnp.asarray(np.maximum(grp, 0))
    o2, d2 = jnp.asarray(hitp - dirs * 1e-3), jnp.asarray(dirs)
    if stats_on:
        outs2 = jax.block_until_ready(qj(o2, d2, og))
        steps2 = np.asarray(outs2[0])[:, 0, 0]
        report["bounce_steps_per_tile"] = round(float(steps2.mean()), 1)
    else:
        report["closest_bounce_ms"] = timeit(closest, o2, d2, og) * 1e3
        anyhit = jax.jit(
            lambda o, d, og: tm.mega_anyhit(
                o, d, jnp.full(n, 2.0), active, *margs, og=og
            )
        )
        report["anyhit_bounce_ms"] = timeit(anyhit, o2, d2, og) * 1e3
        frame = jax.jit(lambda u: render_sample(ds, camera, u, w, h, options))
        report["frame_ms"] = timeit(frame, uniforms, reps=3) * 1e3
        est = (
            report["closest_primary_ms"]
            + (depth - 1) * report["closest_bounce_ms"]
            + depth * report["anyhit_bounce_ms"]
        )
        report["est_integrator_ms"] = report["frame_ms"] - est
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
