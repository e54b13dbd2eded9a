"""Device mesh construction for sharded rendering.

The reference is single-GPU (SURVEY.md §2 parallelism table) — its only
parallel axis is the rasterizer's per-fragment SIMT.  The TPU framework's
first-class equivalents:

  dp ("data parallel")   : the pixel/ray batch axis, sharded across chips
  sp ("sample parallel") : independent sample streams of the *same* pixels,
                           psum-combined — the renderer's honest analog of
                           DP+SP in a trainer (SURVEY.md §5 long-context note)

Scene arrays are replicated (small next to ray state); gradients are
psum-reduced over both axes and ride ICI when the mesh is a single slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def factor_mesh(n: int) -> Tuple[int, int]:
    """Split n devices into (dp, sp): sample-parallel gets a factor of 2
    when available, the rest shards pixels."""
    if n % 2 == 0 and n > 1:
        return n // 2, 2
    return n, 1


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("dp", "sp"),
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor_mesh(n)
    assert shape[0] * shape[1] == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
