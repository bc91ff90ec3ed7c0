"""Skybox pass (skybox.rs + skybox.wgsl), TPU-native formulation.

The reference draws a 36-vertex cube with the translation-stripped view and
samples a cubemap (or an HDRI equirect baked into a 2048^2 cubemap through 6
offline passes with Reinhard + gamma, skybox.wgsl:61-97). On TPU there is no
raster pass: each pixel's world-space view ray is computed directly and the
source texture sampled per pixel — equivalent to the cube pass without the
intermediate cubemap resampling.

Coordinate mapping replicates skybox.wgsl:32-38: sample dir = (x, -z, y) of
the world ray, with y negated again for cubemap sources.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pixel_rays(cam, image_wh):
    """World-space ray directions per pixel [H, W, 3] (unnormalized)."""
    w, h = image_wh
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    nx, ny = jnp.meshgrid(xs, ys)
    hx = cam["htan_fov"][0]
    hy = cam["htan_fov"][1]
    d_view = jnp.stack([nx * hx, ny * hy, -jnp.ones_like(nx)], axis=-1)
    r = cam["view"][:3, :3]  # world->view rotation
    return d_view @ r  # = R^T d_view


def _sample_equirect(tex, dir_xyz, interpret=None):
    """SampleSphericalMap + bake tonemap (skybox.wgsl:74-97). tex [H,W,3].

    Small textures sample gather-free via the factored MXU bilinear
    (ops/texsample.py) — the 4-gather path measured ~110 ms device time at
    1080p; the factored pass is ~3 ms with identical bilinear association."""
    d = dir_xyz / jnp.linalg.norm(dir_xyz, axis=-1, keepdims=True)
    u = jnp.arctan2(d[..., 2], d[..., 0]) * 0.1591 + 0.5
    v = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) * 0.3183 + 0.5
    th, tw = tex.shape[:2]
    x = jnp.clip(u * tw - 0.5, 0.0, tw - 1.0)
    y = jnp.clip(v * th - 0.5, 0.0, th - 1.0)
    from .texsample import factored_bilinear, factored_fits

    if factored_fits((3, th, tw)):
        c = jnp.moveaxis(
            factored_bilinear(
                jnp.moveaxis(tex, -1, 0), x, y, wrap_x=False, wrap_y=False,
                interpret=interpret,
            ),
            0, -1,
        )
    else:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, tw - 1)
        y1 = jnp.minimum(y0 + 1, th - 1)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        c = (
            tex[y0, x0] * (1 - fx) * (1 - fy)
            + tex[y0, x1] * fx * (1 - fy)
            + tex[y1, x0] * (1 - fx) * fy
            + tex[y1, x1] * fx * fy
        )
    # Reinhard + gamma done at bake time in the reference
    c = c / (c + 1.0)
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


def _sample_cubemap(faces, dir_xyz):
    """faces [6, R, R, 3] in wgpu cube layout (+x,-x,+y,-y,+z,-z)."""
    d = dir_xyz
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    az = jnp.abs(d[..., 2])
    # face selection
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(d[..., 0] > 0, 0, 1),
        jnp.where(is_y, jnp.where(d[..., 1] > 0, 2, 3), jnp.where(d[..., 2] > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    # standard cubemap uv per face (WebGPU convention)
    u = jnp.where(
        is_x,
        jnp.where(d[..., 0] > 0, -d[..., 2], d[..., 2]),
        jnp.where(is_y, d[..., 0], jnp.where(d[..., 2] > 0, d[..., 0], -d[..., 0])),
    )
    v = jnp.where(is_y, jnp.where(d[..., 1] > 0, d[..., 2], -d[..., 2]), -d[..., 1])
    uu = (u / ma + 1.0) * 0.5
    vv = (v / ma + 1.0) * 0.5
    r = faces.shape[1]
    x = jnp.clip(uu * r - 0.5, 0, r - 1)
    y = jnp.clip(vv * r - 0.5, 0, r - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r - 1)
    y1 = jnp.minimum(y0 + 1, r - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (
        faces[face, y0, x0] * (1 - fx) * (1 - fy)
        + faces[face, y0, x1] * fx * (1 - fy)
        + faces[face, y1, x0] * (1 - fx) * fy
        + faces[face, y1, x1] * fx * fy
    )


def bake_hdri_to_cubemap(hdri, resolution: int = 2048):
    """Bake an equirect HDRI into cubemap faces [6, R, R, 3] (the
    reference's 6-pass bake, skybox.rs:341-455 + 580-660, with Reinhard +
    gamma applied at bake time like its bake shader). Face directions are
    the inverse of _sample_cubemap's WebGPU uv convention, so
    _sample_cubemap(bake(h), d) == _sample_equirect(h, d) up to the
    cubemap's own bilinear resample."""
    r = resolution
    t = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r * 2.0 - 1.0
    vg, ug = jnp.meshgrid(t, t, indexing="ij")  # v' rows, u' cols
    one = jnp.ones_like(ug)
    dirs = jnp.stack(
        [
            jnp.stack([one, -vg, -ug], axis=-1),    # +x
            jnp.stack([-one, -vg, ug], axis=-1),    # -x
            jnp.stack([ug, one, vg], axis=-1),      # +y
            jnp.stack([ug, -one, -vg], axis=-1),    # -y
            jnp.stack([ug, -vg, one], axis=-1),     # +z
            jnp.stack([-ug, -vg, -one], axis=-1),   # -z
        ],
        axis=0,
    )  # [6, R, R, 3]
    hdri = jnp.asarray(hdri, jnp.float32)
    return _sample_equirect(hdri, dirs)


def render_skybox(cam, image_wh, tex, *, equirect: bool):
    """Returns [H, W, 4] opaque background. tex: equirect [He,We,3] or
    cubemap faces [6,R,R,3]."""
    rays = pixel_rays(cam, image_wh)
    # skybox.wgsl:32-38: (x, -z, y); cubemap flips y again
    d = jnp.stack([rays[..., 0], -rays[..., 2], rays[..., 1]], axis=-1)
    if equirect:
        rgb = _sample_equirect(tex, d)
    else:
        d = d.at[..., 1].mul(-1.0)
        rgb = _sample_cubemap(tex, d)
    a = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([rgb, a], axis=-1)
