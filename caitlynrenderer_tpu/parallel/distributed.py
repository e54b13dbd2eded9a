"""Multi-host distribution: process wiring, host×chip meshes, image assembly.

The reference has no distribution layer (single GL context,
`/root/reference/Caitlyn/Scene.h:1000-1156` is its only device boundary);
this module is the SURVEY §5 "distributed communication backend" plan:
`jax.distributed.initialize` for process wiring, a 2-D (dp × sp) mesh laid
out so the sample-parallel `psum` rides ICI within a host while the pixel
axis spans hosts over DCN, and `process_allgather` for final image
assembly.  Single-process runs (tests, the 8-device virtual CPU mesh, one
real chip) take the same code paths with process_count == 1.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX when a coordinator is configured.

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — the names TPU pod launchers
    export).  A plain single-process run (nothing configured) is a no-op.
    Returns (process_index, process_count)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address and jax.process_count() == 1:
        num_processes = num_processes or int(
            os.environ.get("JAX_NUM_PROCESSES", "0")
        ) or None
        process_id = (
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "-1"))
        )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=None if process_id < 0 else process_id,
        )
    return jax.process_index(), jax.process_count()


def make_multihost_mesh(sp: Optional[int] = None):
    """(dp × sp) mesh over ALL global devices, hosts-major on dp.

    sp defaults to 2 when the per-host device count allows, so the
    sample-stream `psum` stays within a host (ICI); dp spans hosts (DCN).
    On one host this degenerates to parallel.mesh.make_mesh."""
    from jax.experimental import mesh_utils

    from caitlynrenderer_tpu.parallel.mesh import factor_mesh

    n = len(jax.devices())
    local = jax.local_device_count()
    if sp is None:
        sp = 2 if local % 2 == 0 and local > 1 else 1
    dp = n // sp
    devices = mesh_utils.create_device_mesh((dp, sp))
    from jax.sharding import Mesh

    return Mesh(devices, ("dp", "sp"))


def assemble_image(state, mesh, width: int, height: int, options, sp: int):
    """Full image on every host: resolve the dp-sharded accumulation and
    all-gather the host-local shards (`multihost_utils.process_allgather`,
    the plan of SURVEY §5).  Single-process: plain device gather."""
    from caitlynrenderer_tpu.parallel.render import gather_image

    if jax.process_count() == 1:
        return np.asarray(gather_image(state, width, height, options, sp))
    from jax.experimental import multihost_utils

    from caitlynrenderer_tpu.render.progressive import tonemap

    accum = multihost_utils.process_allgather(state.accum, tiled=True)
    n = width * height
    frames = max(float(state.frame_count) * sp, 1.0)
    hdr = accum[:n] / frames * options.hdr_multiplier
    img = np.asarray(tonemap(hdr, options.tonemap_limit))
    return img.reshape(height, width, 3)[::-1]


def scaling_report(ds, camera, options, width: int, height: int, spp: int = 2):
    """Rays/s-per-chip at 1 device vs the full mesh → scaling efficiency
    (the BASELINE ≥85% target's harness).  Runs wherever it's called —
    the 8-device virtual CPU mesh in tests/CI, real chips on a pod."""
    import time

    import jax.numpy as jnp

    from caitlynrenderer_tpu.parallel.mesh import make_mesh
    from caitlynrenderer_tpu.parallel.render import (
        init_sharded_state,
        sharded_render_step,
    )

    def measure(devs):
        mesh = make_mesh(devs, shape=(len(devs), 1))
        st = init_sharded_state(mesh, width, height, seed=0)
        step = lambda s: sharded_render_step(
            ds, camera, s, mesh, width, height, options
        )
        st = step(st)  # compile
        st.accum.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(spp):
            st = step(st)
        st.accum.block_until_ready()
        dt = time.perf_counter() - t0
        rays = width * height * options.max_depth * spp  # upper-bound proxy
        return rays / dt / len(devs)

    devs = jax.devices()
    r1 = measure(devs[:1])
    rn = measure(devs)
    return {
        "devices": len(devs),
        "rays_per_sec_per_chip_1": round(r1, 1),
        "rays_per_sec_per_chip_n": round(rn, 1),
        "scaling_efficiency": round(rn / r1, 4),
    }
