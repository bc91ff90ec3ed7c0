"""Proxy ground pass (proxy.rs + proxy.wgsl), TPU-native formulation.

The reference draws a height-map-displaced grid (either the exact tile-map
grid or a 2048^2 global grid) before the splats, with depth WRITE enabled
(proxy.rs:119-125); the splat pass then depth-tests against it
(renderer.rs:433-437). The surface is the same bilinear height field the
splat shader samples, so on TPU the pass becomes a per-pixel ray / height
field intersection: fixed-step march + bisection refinement. This matches
the displaced-grid raster up to the grid's piecewise-linear approximation
(documented deviation; the proxy is a distant-terrain stand-in).

Outputs: color [H,W,4] and the wgpu-remapped depth [H,W] consumed by the
rasterizer's per-splat depth test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .project import _bilinear_wrap, _bilinear_wrap4
from .skybox import pixel_rays


def _height_at(scene, hm4, hm_wh, x, y):
    """Surface height via the shader's uv convention (proxy.wgsl:73-82)."""
    half = scene["map_half_wh"].astype(jnp.float32)
    tw = scene["tile_width"]
    hms = scene["height_map_scale"]
    hx = (2.0 * half[0] + 1.0) * tw * hms[0]
    hy = (2.0 * half[1] + 1.0) * tw * hms[1]
    hu = (x + half[0] * tw) / hx
    hv = (y + half[1] * tw) / hy
    w, h = int(hm_wh[0]), int(hm_wh[1])
    return _bilinear_wrap4(hm4, w, h, hu, hv) * hms[2]


def render_proxy(
    cam, scene, image_wh, hm4, hm_wh, proxy_tex, proxy_wh,
    *, surface_type: int, height_offset: float, brightness: float,
    black_background: bool, use_clip: bool, clip_height: float,
    n_steps: int = 96, n_refine: int = 8, max_dist: float = 2400.0,
):
    """Ray-march the proxy height surface. Returns (color [H,W,4],
    depth [H,W] in wgpu [0,1] clip z, hit mask [H,W])."""
    w_img, h_img = image_wh
    rays = pixel_rays(cam, image_wh)
    d = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    o = cam["cam_pos"]

    def surf_h(x, y):
        if surface_type == 1:
            return _height_at(scene, hm4, hm_wh, x, y) + height_offset
        return jnp.full_like(x, height_offset)

    # signed height above surface along the ray
    def f(t):
        p = o[None, None, :] + d * t[..., None]
        return p[..., 2] - surf_h(p[..., 0], p[..., 1])

    ts = jnp.linspace(0.0, 1.0, n_steps) ** 2 * max_dist  # denser near camera
    t_prev = jnp.zeros((h_img, w_img), jnp.float32)
    t_hit = jnp.full((h_img, w_img), jnp.inf)
    above_prev = f(jnp.zeros((h_img, w_img), jnp.float32)) > 0

    def march(carry, t):
        t_prev, t_hit, above_prev = carry
        tt = jnp.full((h_img, w_img), t, jnp.float32)
        above = f(tt) > 0
        crossed = above_prev & (~above) & jnp.isinf(t_hit)
        t_hit = jnp.where(crossed, tt, t_hit)
        t_lo = jnp.where(crossed, t_prev, 0.0)
        return (tt, t_hit, above), t_lo

    (t_last, t_hit, _), t_los = jax.lax.scan(march, (t_prev, t_hit, above_prev), ts)
    # recover the bracket low point for each pixel (first crossing)
    t_lo = jnp.max(t_los, axis=0)
    hit = jnp.isfinite(t_hit)
    t_hi = jnp.where(hit, t_hit, max_dist)

    def refine(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = f(mid) <= 0
        return (jnp.where(below, lo, mid), jnp.where(below, mid, hi)), None

    (t_lo, t_hi), _ = jax.lax.scan(refine, (t_lo, t_hi), None, length=n_refine)
    t = 0.5 * (t_lo + t_hi)
    p = o[None, None, :] + d * t[..., None]

    # z clip discard (proxy.wgsl:100-102) tests the mapped height
    mapped_h = surf_h(p[..., 0], p[..., 1]) - height_offset
    if use_clip:
        hit = hit & ~(mapped_h < clip_height)

    # depth: wgpu clip z of the hit point
    view = cam["view"]
    proj = cam["proj_wgpu"]
    cam3 = p @ view[:3, :3].T + view[:3, 3]
    z_clip = cam3 @ proj[2, :3] + proj[2, 3]
    w_clip = cam3 @ proj[3, :3] + proj[3, 3]
    depth = jnp.where(hit, z_clip / w_clip, 1.0)
    depth = jnp.clip(depth, 0.0, 1.0)

    if black_background:
        rgb = jnp.zeros((h_img, w_img, 3), jnp.float32)
    else:
        # tex_coords = pos / tile_width / 4 (proxy.wgsl:92), wrap+bilinear
        tw = scene["tile_width"]
        u = p[..., 0] / tw / 4.0
        v = p[..., 1] / tw / 4.0
        pw, ph = int(proxy_wh[0]), int(proxy_wh[1])
        r = _bilinear_wrap(proxy_tex[..., 0].reshape(-1), pw, ph, u, v)
        g = _bilinear_wrap(proxy_tex[..., 1].reshape(-1), pw, ph, u, v)
        b = _bilinear_wrap(proxy_tex[..., 2].reshape(-1), pw, ph, u, v)
        rgb = jnp.stack([r, g, b], axis=-1) * brightness
    color = jnp.concatenate(
        [rgb, jnp.ones((h_img, w_img, 1), jnp.float32)], axis=-1
    )
    color = jnp.where(hit[..., None], color, 0.0)
    return color, depth, hit
