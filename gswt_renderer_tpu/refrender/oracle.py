"""Golden NumPy renderer: an exact, slow transcription of the reference's
render path (gswt.wgsl vertex/fragment math + renderer.rs draw loop +
premultiplied back-to-front blending, renderer.rs:118-129).

This is the parity oracle for the TPU pipeline: the Rust/wgpu reference
cannot execute in this environment (no Rust toolchain, no GPU), so its
per-splat math is transcribed here literally — WGSL column-major matrices
become math-layout NumPy matrices — and every TPU kernel is tested against
this module on small frames.

Rasterization model (verified against the wgpu pipeline semantics):
- a splat renders a +/-2 quad in "quad space" (renderer.rs:196-216); the
  fragment's quad coords (x, y) interpolate linearly; coverage is
  x^2 + y^2 <= 4 (the A < -4 discard, gswt.wgsl:427-430; the circle of
  radius 2 is inscribed in the quad so the quad bound never binds);
- fragment color = (exp(A) * a * rgb, exp(A) * a) premultiplied, blended
  ONE / ONE_MINUS_SRC_ALPHA back-to-front (renderer.rs:118-129);
- depth test Less against the proxy/cleared depth buffer, no depth write
  (renderer.rs:179-185); splat depth is constant across its quad;
- fragments with clip z outside [0, 1] are clipped (w == 1 always here).
"""

from __future__ import annotations

import numpy as np

from ..core.mathutil import OPENGL_TO_WGPU
from ..render.uniforms import FrameInputs


# --------------------------------------------------------------------- #
# height-map sampling as the shader does it: wrap + bilinear
# (gswt.wgsl:576-583; AddressMode::Repeat + FilterMode::Linear,
#  renderer.rs:376-388)
# --------------------------------------------------------------------- #
def sample_height(height_map, wh, u, v):
    w, h = int(wh[0]), int(wh[1])
    # WebGPU 'repeat' addressing: uv wraps into [0,1)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    tx = (x - x0).astype(np.float32)
    ty = (y - y0).astype(np.float32)

    def texel(xi, yi):
        return height_map[(yi % h) * w + (xi % w)]

    i00 = texel(x0, y0)
    i10 = texel(x0 + 1, y0)
    i01 = texel(x0, y0 + 1)
    i11 = texel(x0 + 1, y0 + 1)
    return (i00 * (1 - tx) + i10 * tx) * (1 - ty) + (i01 * (1 - tx) + i11 * tx) * ty


def surface_mapping_gpu(fi: FrameInputs, pos_xy, map_id, draw_row):
    """gswt.wgsl:565-623 vectorized: returns (mapped_center [N,3],
    transform [N,3,3]). pos_xy [N,2]."""
    sc = fi.scene
    n = pos_xy.shape[0]
    new_pos = np.concatenate([pos_xy, np.zeros((n, 1), np.float32)], axis=1)
    transform = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    if sc.surface_type == 1:
        hx = (2.0 * sc.map_half_wh[0] + 1.0) * sc.tile_width * sc.height_map_scale[0]
        hy = (2.0 * sc.map_half_wh[1] + 1.0) * sc.tile_width * sc.height_map_scale[1]
        hu = (pos_xy[:, 0] + sc.map_half_wh[0] * sc.tile_width) / hx
        hv = (pos_xy[:, 1] + sc.map_half_wh[1] * sc.tile_width) / hy
        dt = 0.001
        hm, wh = fi.height_map, fi.height_map_wh
        z = sc.height_map_scale[2]
        height = sample_height(hm, wh, hu, hv) * z
        h_r = sample_height(hm, wh, hu + dt, hv) * z
        h_l = sample_height(hm, wh, hu - dt, hv) * z
        h_u = sample_height(hm, wh, hu, hv + dt) * z
        h_d = sample_height(hm, wh, hu, hv - dt) * z
        new_pos[:, 2] = height
        local_x = np.stack(
            [np.ones(n), np.zeros(n), (h_r - h_l) / (2.0 * dt * hx)], axis=1
        ).astype(np.float32)
        local_y = np.stack(
            [np.zeros(n), np.ones(n), (h_u - h_d) / (2.0 * dt * hy)], axis=1
        ).astype(np.float32)
        local_z = np.cross(local_x, local_y)
        local_z /= np.linalg.norm(local_z, axis=1, keepdims=True)
        transform = np.stack([local_x, local_y, local_z], axis=2)
    elif sc.surface_type == 2:
        from ..tiles.surface import sphere_get_uv, sphere_uv_to_pos

        class _UD:  # adapter for tiles.surface helpers
            tile_map_wh = (sc.map_half_wh[0] * 2, sc.map_half_wh[1] * 2)
            tile_width = sc.tile_width

        xmax = sc.map_half_wh[0] * 2.0 * sc.tile_width
        ymax = sc.map_half_wh[1] * 2.0 * sc.tile_width
        block_w = xmax / 5.0
        px = pos_xy[:, 0] - (sc.center_coord[0] - sc.map_half_wh[0]) * sc.tile_width
        py = pos_xy[:, 1] - (sc.center_coord[1] - sc.map_half_wh[1]) * sc.tile_width
        if fi.draw.single_draw[draw_row] == 1:
            map_h = 2 * sc.map_half_wh[1]
            mi = map_id // map_h
            mj = map_id % map_h
        else:
            mi = np.full(n, fi.draw.map_coord[draw_row, 0])
            mj = np.full(n, fi.draw.map_coord[draw_row, 1])
        bidx = (5 * mi // (sc.map_half_wh[0] * 2)).astype(np.float32)
        bidy = (2 * mj // (sc.map_half_wh[1] * 2)).astype(np.float32)
        bx = px - bidx * block_w
        by = py - bidy * block_w
        r = sc.sphere_radius
        uv = sphere_get_uv(_UD, bidx, bidy, bx, by)
        local_z = sphere_uv_to_pos(uv)
        new_pos = local_z * r
        dt = 0.001 * ymax
        pr = sphere_uv_to_pos(sphere_get_uv(_UD, bidx, bidy, bx + dt, by)) * r
        pl = sphere_uv_to_pos(sphere_get_uv(_UD, bidx, bidy, bx - dt, by)) * r
        pu = sphere_uv_to_pos(sphere_get_uv(_UD, bidx, bidy, bx, by + dt)) * r
        pd = sphere_uv_to_pos(sphere_get_uv(_UD, bidx, bidy, bx, by - dt)) * r
        local_x = (pr - pl) / (2.0 * dt)
        local_y = (pu - pd) / (2.0 * dt)
        transform = np.stack([local_x, local_y, local_z], axis=2).astype(np.float32)
    return new_pos.astype(np.float32), transform.astype(np.float32)


def _rand(co):
    """WGSL rand() hash (gswt.wgsl:502-504)."""
    return np.modf(
        np.sin(co[..., 0] * 12.9898 + co[..., 1] * 78.233) * 43758.5453
    )[0] % 1.0


def _random_vec3(seed_xy):
    return np.stack(
        [
            _rand(seed_xy),
            _rand(seed_xy + 23.45),
            _rand(seed_xy + 67.89),
        ],
        axis=-1,
    )


def assemble_stream_np(fi: FrameInputs):
    """Flatten the draw table into per-splat instance streams in draw order
    (the renderer.rs:466-591 loop), applying render-time viewport culling and
    lod_enable filtering. Returns dict of arrays: gs_index, map_id, lod_id,
    draw_id (all [S])."""
    d = fi.draw
    vp = fi.cam.projection @ fi.cam.view
    gs_chunks, map_chunks, lod_chunks, draw_chunks = [], [], [], []
    for i in range(d.n_draws):
        # viewport culling for non-merged draws (renderer.rs:471-494)
        if d.single_draw[i] == 0 and d.has_corners[i]:
            corners = d.corner_pos[i]  # [4,3]
            hom = np.concatenate([corners, np.ones((4, 1), np.float32)], axis=1)
            p = hom @ vp.T
            with np.errstate(divide="ignore", invalid="ignore"):
                p = p[:, :3] / p[:, 3:4]
            px = np.min(np.abs(p[:, 0]))
            py = np.min(np.abs(p[:, 1]))
            pz = np.max(p[:, 2])
            clip = fi.culling_dist
            if pz < -clip or px > clip or py > clip:
                continue
        if not fi.lod_enable[int(d.tile_lod[i])]:
            continue

        cnt = int(d.splat_count[i])
        if d.stream_start[i] >= 0:
            s0 = int(d.stream_start[i])
            gs = d.stream_gs_index[s0 : s0 + cnt]
            mid = d.stream_map_id[s0 : s0 + cnt]
            lid = d.stream_lod_id[s0 : s0 + cnt]
        else:
            off = int(
                fi.preload_offset[int(d.base_lod[i]), int(d.base_tile[i]), int(d.base_view[i])]
            )
            gs = fi.preload_gs_index[off : off + cnt]
            lid = fi.preload_gs_lod[off : off + cnt]
            mid = np.zeros(cnt, np.uint32)  # unused when single_draw == 0
        gs_chunks.append(gs)
        map_chunks.append(mid)
        lod_chunks.append(lid)
        draw_chunks.append(np.full(cnt, i, np.int32))
    if not gs_chunks:
        z = np.zeros(0, np.uint32)
        return dict(gs_index=z, map_id=z, lod_id=z, draw_id=np.zeros(0, np.int32))
    return dict(
        gs_index=np.concatenate(gs_chunks),
        map_id=np.concatenate(map_chunks),
        lod_id=np.concatenate(lod_chunks),
        draw_id=np.concatenate(draw_chunks),
    )


def ewa_project_cov_np(Vrk, center, view3, cam_pos, focal, htan_fov):
    """The EWA covariance projection + eigen decomposition
    (gswt.wgsl:207-258), vectorized over splats. Inputs: Vrk [N,3,3]
    world-space covariance (already surface-transformed and
    scene-scaled), center [N,3] world, view3 [3,3], cam_pos [3],
    focal (fx, fy), htan_fov (hx, hy). Returns (cov2d [N,3,3],
    lambda1 [N], lambda2 [N], major [N,2], minor [N,2]).

    Anchored to WGSL-derived golden constants INDEPENDENT of this module
    (tests/test_wgsl_goldens.py) — note the mat3x3 constructors at
    gswt.wgsl:228-232 are COLUMN-major, so J_T's first column is
    (fx/tz, 0, -fx*tx/tz^2): the transpose of the classic 2x3 EWA
    Jacobian."""
    s = center.shape[0]
    t = (center - np.asarray(cam_pos)[None, :]) @ view3.T
    tz = t[:, 2]
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    limx = 1.3 * htan_fov[0]
    limy = 1.3 * htan_fov[1]
    tx = np.clip(txtz, -limx, limx) * tz
    ty = np.clip(tytz, -limy, limy) * tz
    tz2 = tz * tz
    fx, fy = focal
    # J_T columns (gswt.wgsl:228-232): math matrix J with J[row][col]
    J = np.zeros((s, 3, 3), np.float32)
    J[:, 0, 0] = fx / tz
    J[:, 1, 1] = fy / tz
    J[:, 2, 0] = -fx * tx / tz2
    J[:, 2, 1] = -fy * ty / tz2
    # T = transpose(view3) * J_T (gswt.wgsl:242)
    T = np.einsum("ij,njk->nik", view3.T, J)
    cov2d = np.einsum("nji,njk,nkl->nil", T, Vrk, T)

    mid_ = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    radius = np.sqrt(
        (0.5 * (cov2d[:, 0, 0] - cov2d[:, 1, 1])) ** 2 + cov2d[:, 0, 1] ** 2
    )
    lambda1 = mid_ + radius
    lambda2 = mid_ - radius
    diag = np.stack([cov2d[:, 0, 1], lambda1 - cov2d[:, 0, 0]], axis=1)
    dn = np.linalg.norm(diag, axis=1, keepdims=True)
    diag = np.where(dn > 0, diag / np.where(dn == 0, 1, dn), diag)
    with np.errstate(invalid="ignore"):
        major = np.minimum(
            np.sqrt(2.0 * np.maximum(lambda1, 0)), 1024.0
        )[:, None] * diag
        minor = np.minimum(
            np.sqrt(2.0 * np.maximum(lambda2, 0)), 1024.0
        )[:, None] * np.stack([diag[:, 1], -diag[:, 0]], axis=1)
    return cov2d, lambda1, lambda2, major, minor


def blend_fragments_np(frags):
    """The fragment shader + ROP blend (gswt.wgsl:424-435 +
    renderer.rs:118-129) for one pixel: frags = [(v_position (2,),
    rgb (3,), alpha)] in FRONT-TO-BACK draw order; the GPU composites
    back-to-front with ONE / ONE_MINUS_SRC_ALPHA. A < -4 discards.
    Returns premultiplied RGBA (4,)."""
    dst = np.zeros(4)
    for (vp, rgb, a) in reversed(list(frags)):
        A = -(vp[0] * vp[0] + vp[1] * vp[1])
        if A < -4.0:  # gswt.wgsl:427-430
            continue
        B = np.exp(A) * a
        src = np.array([B * rgb[0], B * rgb[1], B * rgb[2], B])
        dst = src + (1.0 - src[3]) * dst
    return dst


def project_draw_np(fi: FrameInputs, gs_index, map_id, lod_id, draw_id):
    """The vs_main math (gswt.wgsl:27-422), vectorized over a flat splat
    stream. Returns dict with:
      valid [S] bool, center_ndc [S,2], z_ndc [S], major_px [S,2],
      minor_px [S,2], color [S,4] (straight alpha, alpha already faded).
    """
    d = fi.draw
    sc = fi.scene
    cam = fi.cam
    s = gs_index.shape[0]
    gs = gs_index.astype(np.int64)
    lod_id = lod_id.astype(np.int64)
    valid = np.ones(s, bool)

    pos = fi.pos[gs].astype(np.float32)

    # per-instance tile uniforms
    row = draw_id.astype(np.int64)
    single = d.single_draw[row].astype(np.int64)
    changing = d.changing[row].astype(np.int64)
    to_lower = d.changing_to_lower[row].astype(np.int64)
    tile_lod = d.tile_lod[row].astype(np.int64)
    valid_lod = d.valid_lod_id[row].astype(np.int64)
    offset = d.offset[row].astype(np.float32)
    # the DRAW-uniform offset (u_tile.offset): the TileID debug tint is
    # seeded with this, one tint per merged draw (gswt.wgsl:277)
    offset_draw = offset.copy()

    # Early discard: wrong lod id (gswt.wgsl:39-42)
    valid &= ~((valid_lod >= 0) & (valid_lod != lod_id))

    # Offset: merged draws recompute from map_id (gswt.wgsl:52-64)
    map_h = 2 * sc.map_half_wh[1] + (0 if sc.surface_type == 2 else 1)
    mid = map_id.astype(np.int64)
    off_merged = np.stack(
        [
            (mid // map_h - sc.map_half_wh[0] + sc.center_coord[0]) * sc.tile_width,
            (mid % map_h - sc.map_half_wh[1] + sc.center_coord[1]) * sc.tile_width,
            np.zeros(s),
        ],
        axis=1,
    ).astype(np.float32)
    offset = np.where(single[:, None] == 1, off_merged, offset)
    center = pos + offset
    center = center * sc.scene_scale[None, :]
    ori_center = center.copy()

    # Surface mapping (gswt.wgsl:74-82). The shader maps per draw; our
    # vectorization calls it per unique draw row for the sphere path (which
    # reads u_tile.map_coord), and in one batch otherwise.
    surface_normal = np.tile(np.array([0, 0, 1], np.float32), (s, 1))
    mapped_center = np.concatenate(
        [center[:, :2], np.zeros((s, 1), np.float32)], axis=1
    )
    if sc.surface_type > 0:
        if sc.surface_type == 2:
            mapped_center = np.empty((s, 3), np.float32)
            transform = np.empty((s, 3, 3), np.float32)
            for r_ in np.unique(row):
                m = row == r_
                mapped_center[m], transform[m] = surface_mapping_gpu(
                    fi, center[m][:, :2], mid[m], int(r_)
                )
        else:
            mapped_center, transform = surface_mapping_gpu(
                fi, center[:, :2], mid, 0
            )
        center = mapped_center + np.einsum("nij,nj->ni", transform,
            np.stack([np.zeros(s), np.zeros(s), center[:, 2]], axis=1).astype(np.float32))
        surface_normal = transform[:, :, 2]
    else:
        transform = np.broadcast_to(np.eye(3, dtype=np.float32), (s, 3, 3))

    # z clip (gswt.wgsl:84-87)
    if sc.use_clip:
        valid &= ~(mapped_center[:, 2] < sc.clip_height)

    # LOD transition (gswt.wgsl:89-150)
    alpha_mul = np.ones(s, np.float32)
    if True:
        cam_dist = np.linalg.norm(center - cam.cam_pos[None, :], axis=1)
        trans = sc.transition_dist_vec
        num_lod = sc.num_lod
        # single-draw path: find higher lod from per-splat lod_id
        hl_single = np.where(
            lod_id == 0,
            0,
            np.where(
                lod_id == num_lod - 1,
                lod_id - 1,
                np.where(
                    (cam_dist - trans[np.clip(lod_id - 1, 0, 15)])
                    < (trans[np.clip(lod_id, 0, 15)] - cam_dist),
                    lod_id - 1,
                    lod_id,
                ),
            ),
        )
        hl_tile = np.where(to_lower == 1, tile_lod, tile_lod - 1)
        higher_lod = np.where(single == 1, hl_single, hl_tile)
        higher_lod = np.clip(higher_lod, 0, 15)
        t_dist = trans[higher_lod]
        half_w = sc.transition_width_ratio * t_dist
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ratio = np.clip((cam_dist - t_dist) / half_w + 0.5, 0.0, 1.0)
        t_ratio = np.nan_to_num(t_ratio, nan=1.0, posinf=1.0, neginf=0.0)
        is_changing = changing == 1
        discard_lo = (lod_id == higher_lod + 1) & (t_ratio == 0.0)
        discard_hi = (lod_id == higher_lod) & (t_ratio == 1.0)
        valid &= ~(is_changing & (discard_lo | discard_hi))
        amul = np.where(lod_id != higher_lod, t_ratio, 1.0 - t_ratio)
        alpha_mul = np.where(is_changing, amul, 1.0).astype(np.float32)

    # projection (gswt.wgsl:152-167)
    view = cam.view
    proj = OPENGL_TO_WGPU @ cam.projection
    cam4 = np.concatenate([center, np.ones((s, 1), np.float32)], axis=1) @ view.T
    pos2d = cam4 @ proj.T
    clip = 1.2 * pos2d[:, 3]
    valid &= ~(
        (pos2d[:, 2] < -clip)
        | (pos2d[:, 0] < -clip)
        | (pos2d[:, 0] > clip)
        | (pos2d[:, 1] < -clip)
        | (pos2d[:, 1] > clip)
    )

    # covariance (gswt.wgsl:169-205)
    cov6 = fi.cov[gs].astype(np.float32)
    a, b, c, dd, e, f = (cov6[:, i] for i in range(6))
    Vrk = np.empty((s, 3, 3), np.float32)
    Vrk[:, 0, 0] = a
    Vrk[:, 0, 1] = Vrk[:, 1, 0] = b
    Vrk[:, 0, 2] = Vrk[:, 2, 0] = c
    Vrk[:, 1, 1] = dd
    Vrk[:, 1, 2] = Vrk[:, 2, 1] = e
    Vrk[:, 2, 2] = f
    if sc.point_cloud_radius > 0.0:
        p_r = np.full(s, sc.point_cloud_radius, np.float32)
        if sc.draw_mode > 0:
            p_r = p_r * np.power(2.0, tile_lod).astype(np.float32)
        Vrk = np.zeros((s, 3, 3), np.float32)
        Vrk[:, 0, 0] = p_r
        Vrk[:, 1, 1] = p_r
        Vrk[:, 2, 2] = p_r
    if sc.surface_type > 0:
        Vrk = np.einsum("nij,njk,nlk->nil", transform, Vrk, transform)
    ss = sc.scene_scale
    Vrk = Vrk * (ss[None, :, None] * ss[None, None, :])

    cov2d, lambda1, lambda2, major, minor = ewa_project_cov_np(
        Vrk, center, view[:3, :3], cam.cam_pos, cam.focal, cam.htan_fov
    )
    valid &= ~(lambda2 < 0.0)

    # color (gswt.wgsl:260-265)
    rgba = fi.rgba[gs].astype(np.float32) / 255.0
    color = rgba.copy()

    # debug draw modes (gswt.wgsl:267-399)
    dm = sc.draw_mode
    if dm == 1:  # TileID
        gray = np.clip((color[:, 0] + color[:, 1] + color[:, 2]) / 0.6, 0.0, 1.0)
        dbg = np.stack([gray, gray, gray, color[:, 3]], axis=1)
        vpos = pos
        margin = 0.05 * sc.tile_width
        tile_id = d.tile_id[row].astype(np.int64)
        red = np.array([1.0, 0.0, 0.0])
        green = np.array([0.0, 1.0, 0.13])
        yellow = np.array([1.0, 0.85, 0.0])
        blue = np.array([0.0, 0.58, 1.0])
        gray5 = np.array([0.5, 0.5, 0.5])
        on_sphere = sc.surface_type == 2
        c_a = red if on_sphere else yellow
        c_b = green if on_sphere else blue

        def set_rgb(mask, rgb):
            dbg[mask, :3] = rgb

        in_y_margin = (vpos[:, 1] < margin) | (vpos[:, 1] > sc.tile_width - margin)
        west = vpos[:, 0] < margin
        east = vpos[:, 0] > sc.tile_width - margin
        south = vpos[:, 1] < margin
        north = vpos[:, 1] > sc.tile_width - margin
        set_rgb(west & in_y_margin, gray5)
        set_rgb(west & ~in_y_margin & (tile_id // 8 % 2 == 0), red)
        set_rgb(west & ~in_y_margin & (tile_id // 8 % 2 == 1), green)
        set_rgb(~west & east & in_y_margin, gray5)
        set_rgb(~west & east & ~in_y_margin & (tile_id // 2 % 2 == 0), red)
        set_rgb(~west & east & ~in_y_margin & (tile_id // 2 % 2 == 1), green)
        m = ~west & ~east & south
        set_rgb(m & (tile_id % 2 == 0), c_a)
        set_rgb(m & (tile_id % 2 == 1), c_b)
        m = ~west & ~east & ~south & north
        set_rgb(m & (tile_id // 4 % 2 == 0), c_a)
        set_rgb(m & (tile_id // 4 % 2 == 1), c_b)
        merged = single == 1
        if merged.any():
            dbg[merged, :3] = (
                np.stack([gray, gray, gray], axis=1)[merged]
                * _random_vec3(offset_draw[merged][:, :2])
            )
        color = dbg
    elif dm == 2:  # TileLOD
        mid_t = (t_ratio > 0.0) & (t_ratio < 1.0)
        lodv = tile_lod.astype(np.float32)
        cx = np.where(tile_lod < 3, (3.0 - lodv) / 3.0, 0.0)
        cy = np.where(tile_lod >= 3, (6.0 - lodv) / 3.0, 1.0)
        color = np.stack(
            [np.full(s, 0.5), cx, cy, color[:, 3]], axis=1
        ).astype(np.float32)
        color[mid_t, :3] = 0.0
        color[~mid_t & is_changing, :3] = np.array([0.0, 1.0, 0.0])
    elif dm == 3:  # LOD
        mid_t = (t_ratio > 0.0) & (t_ratio < 1.0)
        sl = d.single_lod_id[row].astype(np.int64)
        eff = np.where(sl >= 0, sl, lod_id).astype(np.float32)
        cx = np.where(eff < 3, (3.0 - eff) / 3.0, 0.0)
        cy = np.where(eff >= 3, (6.0 - eff) / 3.0, 1.0)
        color = np.stack(
            [np.full(s, 0.5), cx, cy, color[:, 3]], axis=1
        ).astype(np.float32)
        color[mid_t, :3] = 0.0
    elif dm == 4:  # View
        vid = d.view_id[row].astype(np.float32)
        cx = np.where(vid < 4, (4.0 - vid) / 4.0, 0.0)
        cy = np.where(vid >= 4, (8.0 - vid) / 4.0, 0.0)
        cx = np.where(vid >= 8, 1.0, cx)
        cy = np.where(vid >= 8, 1.0, cy)
        color = np.stack(
            [np.full(s, 0.5), cx, cy, color[:, 3]], axis=1
        ).astype(np.float32)

    # LOD alpha + near-plane fade (gswt.wgsl:401-410)
    color[:, 3] *= alpha_mul
    fade = np.clip(pos2d[:, 2] / pos2d[:, 3] + 1.0, 0.0, 1.0)
    color = color * fade[:, None]

    center_ndc = pos2d[:, :2] / pos2d[:, 3:4]
    z_ndc = pos2d[:, 2] / pos2d[:, 3]

    valid &= np.isfinite(center_ndc).all(axis=1)
    valid &= np.isfinite(major).all(axis=1) & np.isfinite(minor).all(axis=1)

    return dict(
        valid=valid,
        center_ndc=center_ndc.astype(np.float32),
        z_ndc=z_ndc.astype(np.float32),
        major_px=(major * sc.splat_scale).astype(np.float32),
        minor_px=(minor * sc.splat_scale).astype(np.float32),
        color=color.astype(np.float32),
    )


def render_oracle(fi: FrameInputs, width, height, background=None, depth=None):
    """Full-frame oracle render. background: [H,W,4] or None (black);
    depth: [H,W] proxy depth or None (cleared to 1.0).
    Returns float32 [H,W,4] premultiplied RGBA."""
    stream = assemble_stream_np(fi)
    p = project_draw_np(fi, **stream)
    img = (
        np.zeros((height, width, 4), np.float32)
        if background is None
        else background.astype(np.float32).copy()
    )
    zbuf = np.full((height, width), 1.0, np.float32) if depth is None else depth

    valid = p["valid"]
    order = np.where(valid)[0]
    vw = np.array([width, height], np.float32)
    for i in order:
        c = p["center_ndc"][i]
        z = p["z_ndc"][i]
        if z < 0.0 or z > 1.0:
            continue
        maj = p["major_px"][i]
        mnr = p["minor_px"][i]
        col = p["color"][i]
        # pixel-space center; ndc y up -> pixel y down
        cx = (c[0] * 0.5 + 0.5) * width
        cy = (0.5 - c[1] * 0.5) * height
        # pixel offset = ndc_offset * viewport/2 = s*(x*maj + y*minor)/2
        # with |x|,|y| <= 2 -> extent per axis = |maj| + |minor|
        ext = np.abs(maj) + np.abs(mnr)
        x0 = max(int(np.floor(cx - ext[0])), 0)
        x1 = min(int(np.ceil(cx + ext[0])) + 1, width)
        y0 = max(int(np.floor(cy - ext[1])), 0)
        y1 = min(int(np.ceil(cy + ext[1])) + 1, height)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = (np.arange(x0, x1) + 0.5).astype(np.float32)
        ys = (np.arange(y0, y1) + 0.5).astype(np.float32)
        pxx, pyy = np.meshgrid(xs, ys)
        # back to ndc deltas
        dndc_x = pxx / width * 2.0 - 1.0 - c[0]
        dndc_y = 1.0 - pyy / height * 2.0 - c[1]
        # solve quad coords: d_ndc*viewport = x*maj + y*minor (orthogonal)
        dx = dndc_x * width
        dy = dndc_y * height
        m2 = maj @ maj
        n2 = mnr @ mnr
        if m2 <= 0 or n2 <= 0:
            continue
        qx = (dx * maj[0] + dy * maj[1]) / m2
        qy = (dx * mnr[0] + dy * mnr[1]) / n2
        a_exp = -(qx * qx + qy * qy)
        mask = (a_exp >= -4.0) & (z < zbuf[y0:y1, x0:x1])
        if not mask.any():
            continue
        bfac = np.exp(a_exp) * col[3]
        src = np.empty(mask.shape + (4,), np.float32)
        src[..., 0] = bfac * col[0]
        src[..., 1] = bfac * col[1]
        src[..., 2] = bfac * col[2]
        src[..., 3] = bfac
        m3 = mask[..., None]
        dst = img[y0:y1, x0:x1]
        img[y0:y1, x0:x1] = np.where(m3, src + (1.0 - src[..., 3:4]) * dst, dst)
    return img
