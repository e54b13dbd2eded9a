"""Test configuration: an 8-device virtual CPU mesh by default, real TPU
hardware on request.

Default: all tests run on CPU (fast, deterministic, no TPU needed); the
sharding tests get 8 virtual devices via XLA_FLAGS, exactly the strategy
described in SURVEY.md §4.5.  Must run before jax initializes its backends.

Hardware tier: `CAITLYN_TEST_PLATFORM=tpu pytest -m tpu` leaves the
backend alone (the environment's TPU plugin resolves) and runs the
`tpu`-marked kernel-parity tests on the real chip in a few minutes — the
documented hardware check of .claude/skills/verify/SKILL.md.
"""

import os

_PLATFORM = os.environ.get("CAITLYN_TEST_PLATFORM", "cpu")

if _PLATFORM != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The environment may pre-set JAX_PLATFORMS (e.g. the axon TPU tunnel) and
# partially pre-import jax, in which case the env var alone is ignored —
# force the platform through the config API as well.
import jax

if _PLATFORM != "tpu":
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from caitlynrenderer_tpu.core.types import make_camera
from caitlynrenderer_tpu.io.obj import load_obj

REFERENCE_OBJ = "/root/reference/Models/cornell-box.obj"


@pytest.fixture(scope="session")
def cornell():
    """The cornell-box scene + its reference camera.

    Uses the reference's asset when mounted, else the procedural twin.
    Camera preset from `/root/reference/Caitlyn/Scene.h:468` (position,
    look-at straight down -z, vertical fov 40°), translated together with
    the scene like `Scene.h:922-925`.
    """
    if os.path.exists(REFERENCE_OBJ):
        scene, translation = load_obj(REFERENCE_OBJ)
    else:
        from caitlynrenderer_tpu.io.builtin_scenes import cornell_box

        scene, translation = cornell_box()
    pos = np.array([-2.755610, 2.745992, 7.58545], np.float32) + translation
    look = pos + np.array([0.0, 0.0, -1.0], np.float32)
    camera = make_camera(pos, look, fov_degrees=40.0)
    return scene, camera
