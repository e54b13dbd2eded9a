"""NumPy twin of ops/bsdf.py (the Disney BRDF) for the CPU oracle.

Same formulas, same parameterization — the device renderer must match this
allclose when fed the same uniforms (tests/test_disney.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class DisneyParams(NamedTuple):
    base_color: np.ndarray
    roughness: np.ndarray
    metallic: np.ndarray
    spec_tint: np.ndarray
    sheen: np.ndarray
    clearcoat: np.ndarray
    clearcoat_gloss: np.ndarray
    subsurface: np.ndarray
    ior: np.ndarray


def params_from_materials(mats, mtl, base_color):
    d1 = mats.disney[mtl]
    d2 = mats.disney2[mtl]
    return DisneyParams(
        base_color=base_color,
        roughness=np.clip(d1[:, 0], 0.02, 1.0),
        metallic=d1[:, 1],
        spec_tint=d1[:, 2],
        sheen=d1[:, 3],
        clearcoat=d2[:, 0],
        clearcoat_gloss=d2[:, 1],
        subsurface=d2[:, 2],
        ior=np.maximum(mats.specular[mtl, 3], 1.01),
    )


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _schlick(m):
    m = np.clip(1.0 - m, 0.0, 1.0)
    return m**5


def _gtr2(ndh, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndh * ndh
    return a2 / np.maximum(np.pi * t * t, 1e-12)


def _gtr1(ndh, a):
    a2 = np.clip(a * a, 1e-4, 0.9999)
    t = 1.0 + (a2 - 1.0) * ndh * ndh
    # log(a2) < 0 and t > 0: denominator strictly negative; guard sign.
    return (a2 - 1.0) / np.minimum(np.pi * np.log(a2) * t, -1e-12)


def _smith_g_ggx(ndv, a):
    a2 = a * a
    b = ndv * ndv
    return 1.0 / np.maximum(ndv + np.sqrt(a2 + b - a2 * b), 1e-8)


def _lum(rgb):
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


def _tint(base_color):
    lum = _lum(base_color)
    return np.where(
        (lum > 0)[:, None], base_color / np.maximum(lum[:, None], 1e-8), 1.0
    )


def _spec_f0(p: DisneyParams):
    f0_scalar = ((p.ior - 1.0) / (p.ior + 1.0)) ** 2
    tint = _tint(p.base_color)
    dielectric = f0_scalar[:, None] * (
        (1.0 - p.spec_tint[:, None]) + p.spec_tint[:, None] * tint
    )
    return dielectric * (1.0 - p.metallic[:, None]) + p.base_color * p.metallic[:, None]


def _lobe_weights(p: DisneyParams):
    w_diff = (1.0 - p.metallic) * _lum(p.base_color)
    w_spec = _lum(_spec_f0(p)) + 0.08
    w_cc = 0.25 * p.clearcoat
    total = np.maximum(w_diff + w_spec + w_cc, 1e-8)
    return w_diff / total, w_spec / total, w_cc / total


def eval_pdf(p: DisneyParams, n, v, l):
    ndv = np.maximum(_dot(n, v), 1e-6)
    ndl = _dot(n, l)
    valid = ndl > 1e-6
    ndl_c = np.maximum(ndl, 1e-6)
    h = _normalize(v + l)
    ndh = np.clip(_dot(n, h), 0.0, 1.0)
    ldh = np.clip(_dot(l, h), 0.0, 1.0)

    a = np.maximum(p.roughness * p.roughness, 1e-4)

    fl = _schlick(ndl_c)
    fv = _schlick(ndv)
    fd90 = 0.5 + 2.0 * ldh * ldh * p.roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fss90 = ldh * ldh * p.roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / np.maximum(ndl_c + ndv, 1e-6) - 0.5) + 0.5)
    diff_mix = fd * (1.0 - p.subsurface) + ss * p.subsurface
    f_diffuse = p.base_color / np.pi * diff_mix[:, None]

    f_sheen = (
        p.sheen[:, None]
        * ((1.0 - p.spec_tint[:, None]) + p.spec_tint[:, None] * _tint(p.base_color))
        * _schlick(ldh)[:, None]
    )

    d_spec = _gtr2(ndh, a)
    f0 = _spec_f0(p)
    f_spec_fresnel = f0 + (1.0 - f0) * _schlick(ldh)[:, None]
    g_spec = _smith_g_ggx(ndl_c, a) * _smith_g_ggx(ndv, a)
    f_specular = d_spec[:, None] * f_spec_fresnel * g_spec[:, None] * 0.25

    a_cc = 0.1 + (0.001 - 0.1) * p.clearcoat_gloss
    d_cc = _gtr1(ndh, a_cc)
    f_cc = 0.04 + 0.96 * _schlick(ldh)
    g_cc = _smith_g_ggx(ndl_c, 0.25) * _smith_g_ggx(ndv, 0.25)
    f_clearcoat = (0.25 * p.clearcoat * d_cc * f_cc * g_cc)[:, None] * 0.25

    f = (
        (f_diffuse + f_sheen) * (1.0 - p.metallic[:, None])
        + f_specular
        + f_clearcoat
    ) * ndl_c[:, None]

    w_diff, w_spec, w_cc = _lobe_weights(p)
    pdf_diff = ndl_c / np.pi
    pdf_spec = d_spec * ndh / np.maximum(4.0 * ldh, 1e-8)
    pdf_cc = d_cc * ndh / np.maximum(4.0 * ldh, 1e-8)
    pdf = w_diff * pdf_diff + w_spec * pdf_spec + w_cc * pdf_cc

    f = np.where(valid[:, None], f, 0.0)
    pdf = np.where(valid, pdf, 0.0)
    return f.astype(np.float32), pdf.astype(np.float32)


def _onb(n):
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    a = 1.0 / np.maximum(1.0 + nz, 1e-7)
    b = -nx * ny * a
    u = np.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    v = np.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    pole = (nz < -0.9999999)[:, None]
    u = np.where(pole, np.array([0.0, -1.0, 0.0], np.float32), u)
    v = np.where(pole, np.array([-1.0, 0.0, 0.0], np.float32), v)
    return u, v


def _local_to_world(local, n):
    u, v = _onb(n)
    return u * local[:, 0:1] + v * local[:, 1:2] + n * local[:, 2:3]


def _reflect(d, n):
    return d - 2.0 * np.sum(d * n, axis=-1, keepdims=True) * n


def _sample_ggx_h(n, a, u1, u2):
    phi = 2.0 * np.pi * u1
    ct2 = (1.0 - u2) / np.maximum(1.0 + (a * a - 1.0) * u2, 1e-12)
    ct = np.sqrt(np.clip(ct2, 0.0, 1.0))
    st = np.sqrt(np.clip(1.0 - ct2, 0.0, 1.0))
    local = np.stack([st * np.cos(phi), st * np.sin(phi), ct], axis=-1)
    return _local_to_world(local, n)


def _sample_gtr1_h(n, a, u1, u2):
    a2 = np.clip(a * a, 1e-4, 0.9999)
    phi = 2.0 * np.pi * u1
    ct2 = (1.0 - np.power(a2, 1.0 - u2)) / np.maximum(1.0 - a2, 1e-8)
    ct = np.sqrt(np.clip(ct2, 0.0, 1.0))
    st = np.sqrt(np.clip(1.0 - ct2, 0.0, 1.0))
    local = np.stack([st * np.cos(phi), st * np.sin(phi), ct], axis=-1)
    return _local_to_world(local, n)


def sample(p: DisneyParams, n, v, u_lobe, u1, u2):
    w_diff, w_spec, w_cc = _lobe_weights(p)
    a = np.maximum(p.roughness * p.roughness, 1e-4)
    a_cc = 0.1 + (0.001 - 0.1) * p.clearcoat_gloss

    r = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    local = np.stack(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1.0 - u1, 0.0))],
        axis=-1,
    )
    l_diff = _local_to_world(local, n)
    h_spec = _sample_ggx_h(n, a, u1, u2)
    l_spec = _reflect(-v, h_spec)
    h_cc = _sample_gtr1_h(n, a_cc, u1, u2)
    l_cc = _reflect(-v, h_cc)

    pick_spec = (u_lobe >= w_diff) & (u_lobe < w_diff + w_spec)
    pick_cc = u_lobe >= (w_diff + w_spec)
    l = np.where(pick_cc[:, None], l_cc, np.where(pick_spec[:, None], l_spec, l_diff))
    l = _normalize(l).astype(np.float32)
    f, pdf = eval_pdf(p, n, v, l)
    return l, f, pdf
