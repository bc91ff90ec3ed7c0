"""The jitted TPU frame pipeline.

One frame = one XLA program over dense HBM arrays:

  cull draws -> assemble splat stream (ONE gather from a unified index table:
  resident presort entries + per-frame merged-stream tail) -> project
  (vs_main math, vectorized, ONE packed-store gather) -> tile binning (stable
  payload sort by image tile) -> Pallas ordered compositor -> composite over
  skybox/proxy background.

The splat store, preloaded presort tables and height map live in HBM across
frames (the analog of renderer.rs:236-327's resident GPU buffers); per frame
the host uploads only the draw table (padded to MAX_DRAWS) and the merged
streams (padded to MAX_MERGED) — the same split the reference uses between
preloaded and streaming index buffers (renderer.rs:270-327).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, CameraUniforms
from ..core.config import RenderConfig
from ..core.mathutil import OPENGL_TO_WGPU
from ..ops import binning, project, raster
from ..ops.project import GS_BITS
from ..ops.proxy import render_proxy
from ..ops.skybox import render_skybox
from ..tiles.structures import DrawTable
from .uniforms import SceneParams, flatten_preload


def _is_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@dataclass
class RendererConfig:
    width: int = 1920
    height: int = 1080
    tile_w: int = 128
    tile_h: int = 16
    chunk: int = 256
    max_draws: int = 16384
    max_stream: int = 1 << 22
    max_merged: int = 1 << 20
    max_pairs: int = 1 << 22
    interpret: bool | None = None  # None = auto (interpret off on TPU)


class Renderer:
    """Holds device-resident scene data + the jitted frame function."""

    def __init__(self, engine, config: RendererConfig | None = None):
        self.engine = engine
        self.cfg = config or RendererConfig()
        if self.cfg.interpret is None:
            self.cfg.interpret = not _is_tpu()

        store = engine.tile_splats_merged
        if store.pos is None:
            store.generate_arrays()
        n = store.splat_count
        rgba_u32 = (
            store.rgba[:, 0].astype(np.uint32)
            | (store.rgba[:, 1].astype(np.uint32) << 8)
            | (store.rgba[:, 2].astype(np.uint32) << 16)
            | (store.rgba[:, 3].astype(np.uint32) << 24)
        )
        packed_store = np.empty((10, n), np.float32)
        packed_store[0:3] = store.pos.T
        packed_store[3:9] = store.cov.T
        packed_store[9] = rgba_u32.view(np.float32)
        self.store_packed = jnp.asarray(packed_store)

        pgi, pgl, poff = flatten_preload(engine)
        assert n < (1 << GS_BITS), "splat store exceeds 26-bit index budget"
        preload_packed = (pgi.astype(np.int64) | (pgl.astype(np.int64) << GS_BITS)).astype(np.int32)
        self.preload_len = len(preload_packed)
        uni = np.zeros((2, self.preload_len + self.cfg.max_merged), np.int32)
        uni[0, : self.preload_len] = preload_packed
        self.unified_resident = jnp.asarray(uni)
        self.preload_offset_host = poff  # [n_lod, n_tile, n_view] i64 (host)

        self.height_map = None
        self.height_map_wh = (1, 1)
        self.skybox_tex = None
        self.skybox_equirect = True
        self.proxy_tex = None
        self.proxy_wh = (1, 1)
        self._frame_jit = {}
        self.last_aux = None

    # ------------------------------------------------------------------ #
    def configure(self, user_data):
        """Bind the height map after engine.configure (renderer.rs:351-405)."""
        if user_data.height_map is not None and len(user_data.height_map):
            self.height_map = jnp.asarray(user_data.height_map, jnp.float32)
            self.height_map_wh = tuple(user_data.height_map_wh)
        else:
            self.height_map = jnp.zeros(1, jnp.float32)
            self.height_map_wh = (1, 1)

    def set_skybox(self, tex, equirect=True):
        self.skybox_tex = jnp.asarray(tex, jnp.float32) if tex is not None else None
        self.skybox_equirect = equirect

    def set_proxy(self, tex):
        if tex is None:
            self.proxy_tex = None
            return
        t = np.asarray(tex, np.float32)
        self.proxy_tex = jnp.asarray(t)
        self.proxy_wh = (t.shape[1], t.shape[0])

    # ------------------------------------------------------------------ #
    def prepare_draws(self, dt: DrawTable):
        """Pad a DrawTable to static shapes (host-side)."""
        c = self.cfg
        n = min(dt.n_draws, c.max_draws)

        def pad_i(a, fill=0, dtype=np.int32):
            out = np.full(c.max_draws, fill, dtype)
            out[:n] = a[:n]
            return out

        counts = dt.splat_count[:n].astype(np.int64)
        cum = np.zeros(c.max_draws + 1, np.int64)
        cum[1 : n + 1] = np.cumsum(counts)
        cum[n + 1 :] = cum[n]
        # truncate draws that overflow the stream capacity
        over = np.searchsorted(cum, c.max_stream, side="right") - 1
        if over < n:
            n = int(over)
            cum[n + 1 :] = cum[n]
        total = int(cum[n])

        poff = np.zeros(c.max_draws, np.int64)
        bl = np.clip(dt.base_lod[:n], 0, self.preload_offset_host.shape[0] - 1)
        bt = np.clip(dt.base_tile[:n], 0, self.preload_offset_host.shape[1] - 1)
        bv = np.clip(dt.base_view[:n], 0, self.preload_offset_host.shape[2] - 1)
        poff[:n] = self.preload_offset_host[bl, bt, bv]

        corner = np.zeros((c.max_draws, 4, 3), np.float32)
        corner[:n] = dt.corner_pos[:n]
        offset = np.zeros((c.max_draws, 3), np.float32)
        offset[:n] = dt.offset[:n]
        offset = np.ascontiguousarray(offset.T)

        ms = len(dt.stream_gs_index)
        ms_c = min(ms, c.max_merged)
        spacked = np.zeros(c.max_merged, np.int32)
        spacked[:ms_c] = (
            dt.stream_gs_index[:ms_c].astype(np.int64)
            | (dt.stream_lod_id[:ms_c].astype(np.int64) << GS_BITS)
        ).astype(np.int32)
        smap = np.zeros(c.max_merged, np.int32)
        smap[:ms_c] = dt.stream_map_id[:ms_c].astype(np.int32)

        draw = dict(
            n_draws=np.int32(n),
            total_splats=np.int64(total),
            starts=cum.astype(np.int32),
            stream_start=pad_i(dt.stream_start, -1, np.int64).astype(np.int64),
            preload_off=poff.astype(np.int32),
            single_draw=pad_i(dt.single_draw),
            single_lod_id=pad_i(dt.single_lod_id, -1),
            single_valid_lod=pad_i(dt.valid_lod_id, -1),
            changing=pad_i(dt.changing),
            changing_to_lower=pad_i(dt.changing_to_lower, -1),
            tile_lod=pad_i(dt.tile_lod),
            tile_id=pad_i(dt.tile_id),
            view_id=pad_i(dt.view_id),
            map_index=pad_i(dt.map_index),
            has_corners=pad_i(dt.has_corners),
            offset_x=offset[0],
            offset_y=offset[1],
            offset_z=offset[2],
            corner_pos=corner,
        )
        streams = dict(packed=spacked, map=smap)
        return draw, streams

    def scene_dict(self, scene: SceneParams):
        return dict(
            splat_scale=jnp.float32(scene.splat_scale),
            tile_width=jnp.float32(scene.tile_width),
            use_clip=jnp.int32(scene.use_clip),
            clip_height=jnp.float32(scene.clip_height),
            sphere_radius=jnp.float32(scene.sphere_radius),
            point_cloud_radius=jnp.float32(scene.point_cloud_radius),
            transition_width_ratio=jnp.float32(scene.transition_width_ratio),
            num_lod=jnp.int32(scene.num_lod),
            map_half_wh=jnp.asarray(scene.map_half_wh, jnp.int32),
            center_coord=jnp.asarray(scene.center_coord, jnp.int32),
            transition_dist_vec=jnp.asarray(scene.transition_dist_vec, jnp.float32),
            height_map_scale=jnp.asarray(scene.height_map_scale, jnp.float32),
            scene_scale=jnp.asarray(scene.scene_scale, jnp.float32),
        )

    @staticmethod
    def cam_dict(cam: CameraUniforms):
        return dict(
            view=jnp.asarray(cam.view),
            proj_wgpu=jnp.asarray(OPENGL_TO_WGPU @ cam.projection),
            view_proj=jnp.asarray(cam.projection @ cam.view),
            focal=jnp.asarray(cam.focal),
            htan_fov=jnp.asarray(cam.htan_fov),
            cam_pos=jnp.asarray(cam.cam_pos),
        )

    # ------------------------------------------------------------------ #
    def _frame(self, store_packed, unified_resident, draw, streams, scene, cam,
               lod_enable, culling_dist, height_map, skybox_tex, proxy_tex, *,
               surface_type, draw_mode, point_cloud, use_skybox, use_proxy,
               proxy_opts):
        # the projection math needs true f32: default bf16 MXU passes break
        # the 1e-3 parity budget
        with jax.default_matmul_precision("highest"):
            c = self.cfg
            image_wh = (c.width, c.height)
            tile_wh = (c.tile_w, c.tile_h)

            # splice the per-frame merged streams into the unified table
            stream_tail = jnp.stack([streams["packed"], streams["map"]], axis=0)
            unified = jax.lax.dynamic_update_slice(
                unified_resident, stream_tail, (0, self.preload_len)
            )

            keep = project.cull_draws(draw, cam, culling_dist, lod_enable)
            p = project.assemble_and_project(
                draw, keep, unified, store_packed, scene, cam, height_map,
                self.height_map_wh, surface_type=surface_type,
                draw_mode=draw_mode, image_wh=image_wh,
                max_stream=c.max_stream, preload_len=self.preload_len,
                point_cloud=point_cloud,
            )
            binned = binning.bin_pairs(
                p, image_wh=image_wh, tile_wh=tile_wh, max_pairs=c.max_pairs,
                chunk=c.chunk,
            )

            # background + depth
            if use_skybox:
                bg = render_skybox(cam, image_wh, skybox_tex,
                                   equirect=self.skybox_equirect)
            else:
                bg = jnp.zeros((c.height, c.width, 4), jnp.float32)
            if use_proxy:
                pcol, depth, hit = render_proxy(
                    cam, scene, image_wh, height_map, self.height_map_wh,
                    proxy_tex, self.proxy_wh, surface_type=surface_type,
                    **proxy_opts,
                )
                bg = jnp.where(hit[..., None], pcol, bg)
            else:
                depth = jnp.ones((c.height, c.width), jnp.float32)
            depth_tiles = raster.image_to_depth_tiles(
                depth, image_wh=image_wh, tile_wh=tile_wh
            )

            tiles = raster.rasterize_pallas(
                binned, depth_tiles, image_wh=image_wh, tile_wh=tile_wh,
                chunk=c.chunk, interpret=c.interpret,
            )
            img = raster.tiles_to_image(tiles, image_wh=image_wh, tile_wh=tile_wh)
            # premultiplied-over: final = gs + T * background
            t_final = 1.0 - img[..., 3:4]
            out = img + t_final * bg
            return out, dict(n_pairs=binned["n_pairs"], overflow=binned["overflow"])

    def _get_jit(self, key):
        if key not in self._frame_jit:
            (surface_type, draw_mode, point_cloud, use_skybox, use_proxy,
             proxy_opts) = key
            fn = functools.partial(
                self._frame,
                surface_type=surface_type,
                draw_mode=draw_mode,
                point_cloud=point_cloud,
                use_skybox=use_skybox,
                use_proxy=use_proxy,
                proxy_opts=dict(proxy_opts),
            )
            self._frame_jit[key] = jax.jit(fn)
        return self._frame_jit[key]

    def render_args(self, dt: DrawTable, rc: RenderConfig):
        """Host-side staging: upload draw table + merged streams."""
        draw_np, streams_np = self.prepare_draws(dt)
        draw = {k: jnp.asarray(v) for k, v in draw_np.items()}
        streams = {k: jnp.asarray(v) for k, v in streams_np.items()}
        lod_enable = jnp.asarray(
            [1 if b else 0 for b in (rc.lod_enable or [True] * 16)], jnp.int32
        )
        return draw, streams, lod_enable

    def render(self, dt: DrawTable, camera: Camera, scene: SceneParams,
               render_config: RenderConfig | None = None, *,
               render_gs: bool = True, use_skybox: bool = False,
               use_proxy: bool = False, as_numpy: bool = True,
               staged=None):
        """Render one frame; returns [H, W, 4] float32."""
        rc = render_config or RenderConfig.new(self.engine.n_tiles[0])
        if staged is None:
            staged = self.render_args(dt, rc)
        draw, streams, lod_enable = staged
        if not render_gs:
            draw = dict(draw)
            draw["total_splats"] = jnp.int64(0)
            draw["n_draws"] = jnp.int32(0)
        proxy_opts = (
            ("height_offset", float(rc.proxy_height)),
            ("brightness", float(rc.proxy_brightness)),
            ("black_background", bool(rc.proxy_black_background)),
            ("use_clip", bool(rc.use_clip)),
            ("clip_height", float(rc.clip_height)),
        )
        key = (
            int(scene.surface_type),
            int(rc.draw_mode),
            bool(rc.draw_point_cloud),
            bool(use_skybox and self.skybox_tex is not None),
            bool(use_proxy and self.proxy_tex is not None),
            proxy_opts,
        )
        fn = self._get_jit(key)
        hm = self.height_map if self.height_map is not None else jnp.zeros(1, jnp.float32)
        sky = self.skybox_tex if self.skybox_tex is not None else jnp.zeros((1, 1, 3))
        prox = self.proxy_tex if self.proxy_tex is not None else jnp.zeros((1, 1, 3))
        img, aux = fn(
            self.store_packed, self.unified_resident, draw, streams,
            self.scene_dict(scene), self.cam_dict(CameraUniforms(camera)),
            lod_enable, jnp.float32(rc.culling_dist), hm, sky, prox,
        )
        self.last_aux = jax.device_get(aux)
        return np.asarray(jax.device_get(img)) if as_numpy else img
