#!/usr/bin/env python
"""Scaling harness: rays/s/chip at 1 device vs the full mesh.

The BASELINE >=85% scaling target's measurement tool
(parallel.distributed.scaling_report).  Defaults to the 8-device virtual
CPU mesh (same shard_map code path a pod takes; the number there checks
WIRING, not hardware scaling — 8 virtual devices share one physical CPU,
so don't read its efficiency against the 85% bar).  On a real pod, run
under the pod launcher with no flags.

    python benchmarks/run_scaling.py --virtual-devices 8 \
        --out benchmarks/SCALING_r5.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scene", default="cornell", choices=["cornell", "grid100k"])
    ap.add_argument("--accel", default="bvh2")
    ap.add_argument(
        "--virtual-devices", type=int, default=0,
        help="force an N-device virtual CPU mesh (the CI wiring check); "
        "0 = use the environment's real devices",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.virtual_devices:
        # Must win over a pre-imported jax (the axon site hook imports it
        # early, making the JAX_PLATFORMS env var alone insufficient —
        # same strategy as tests/conftest.py).
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.virtual_devices}"
            ).strip()
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    # Multi-host wiring first — before any backend query (see
    # parallel.distributed.init_distributed).
    from caitlynrenderer_tpu.parallel.distributed import (
        init_distributed,
        scaling_report,
    )

    pidx, pcount = init_distributed()

    import jax
    import numpy as np

    from caitlynrenderer_tpu.core.types import RenderOptions, make_camera
    from caitlynrenderer_tpu.io import builtin_scenes
    from caitlynrenderer_tpu.scene import scene_families, upload_scene

    if args.scene == "cornell":
        scene, _ = builtin_scenes.cornell_box()
        pos = np.array([2.78, 2.73, 7.5], np.float32)
        camera = make_camera(pos, pos + np.array([0, 0, -1.0], np.float32), 40.0)
    else:
        scene, _ = builtin_scenes.displaced_grid(resolution=224)
        pos = np.array([5.0, 9.0, 11.0], np.float32)
        camera = make_camera(pos, np.array([5.0, 2.0, 5.0], np.float32), 50.0)
    ds = upload_scene(scene, accel=args.accel)
    options = RenderOptions(
        width=args.width, height=args.height, max_depth=args.depth,
        accel=args.accel, families=scene_families(scene),
    )
    rep = scaling_report(ds, camera, options, args.width, args.height, args.spp)
    rep.update(
        {
            "scene": args.scene,
            "resolution": [args.width, args.height],
            "max_depth": args.depth,
            "accel": args.accel,
            "process_count": pcount,
            "backend": jax.default_backend(),
            "note": (
                "virtual CPU mesh: wiring check only — devices share one "
                "physical CPU, efficiency is not hardware scaling"
                if jax.default_backend() == "cpu"
                else "hardware measurement"
            ),
        }
    )
    out = json.dumps(rep, indent=2)
    print(out)
    if args.out and pidx == 0:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
