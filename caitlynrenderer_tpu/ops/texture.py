"""Texture atlas sampling (device, jnp).

The reference stores all albedo textures resized to one 256² size in a
GL_TEXTURE_2D_ARRAY and samples bilinearly with layer index = tex_ind.x
(`/root/reference/Caitlyn/Scene.h:1063-1078`, `path_trace.fs:482`).  Here
the atlas is a dense (K, H, W, 3) array in HBM and the bilinear filter is
four gathers + a lerp, batched over the ray axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(atlas, layer, uv):
    """Bilinear sample: atlas (K, H, W, 3); layer (N,) i32; uv (N, 2) in [0,1].

    Wraps (GL_REPEAT semantics).  Returns (N, 3)."""
    k, h, w, _ = atlas.shape
    u = uv[:, 0] * w - 0.5
    v = uv[:, 1] * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[:, None]
    fy = (v - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    x1i = jnp.mod(x0i + 1, w)
    y1i = jnp.mod(y0i + 1, h)
    layer = jnp.clip(layer, 0, k - 1)
    c00 = atlas[layer, y0i, x0i]
    c10 = atlas[layer, y0i, x1i]
    c01 = atlas[layer, y1i, x0i]
    c11 = atlas[layer, y1i, x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_env(env, d):
    """Equirectangular environment lookup by direction.

    env: (H, W, 3) f32 lat-long map (row 0 = zenith, +y up); d: (N, 3)
    unit directions.  Bilinear, wrapping in longitude and clamped in
    latitude.  Implements the capability behind the reference's
    `useEnvMap`/`hdrMultiplier` options (`/root/reference/Caitlyn/
    Scene.h:57-58`), which its snapshot never wires to a sampler.
    Returns (N, 3) radiance."""
    u = jnp.arctan2(d[:, 2], d[:, 0]) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    h, w, _ = env.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = env[y0i, x0i]
    c10 = env[y0i, x1i]
    c01 = env[y1i, x0i]
    c11 = env[y1i, x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
