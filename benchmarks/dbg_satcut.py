#!/usr/bin/env python
"""Distribution of the raster's saturation-slot record at the bench
camera: how many tiles saturate (record a cut), where the cuts sit in
the stream, and how many pairs they would cull — plus the per-tile
min-transmittance profile that explains non-saturating tiles."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.ops.raster import SAT_NOCUT
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    scene_vec = synthetic_scene_vec(n_lod=3, splats_per_tile=512, seed=0)
    eng = WangTileEngine(scene_vec)
    ud = UserData.from_ui(
        tile_map_half_wh=(48, 48), tile_width=4.0,
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        lod_transition_width_ratio=0.05, merge_dot_threshold=0.2,
        merge_topk=100, cache_size=1024,
    )
    eng.configure(ud)
    cam_pos = np.array([0.0, 0.0, 5.0], np.float32)
    eng.build_tiles(cam_pos)
    camera = Camera((1920, 1080), cam_pos, (0.0, 30.0, 2.0),
                    (0.0, 0.0, 1.0), np.deg2rad(45.0), 0.1, 1000.0)
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)
    r = Renderer(eng, RendererConfig(width=1920, height=1080))
    r.configure(ud)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(tex)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)

    def frame():
        img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False,
                       use_skybox=True, use_proxy=True)
        return jax.device_get(img[..., 3].sum())

    frame()
    frame()
    aux = {k: np.asarray(v).tolist() for k, v in (r.last_aux or {}).items()}
    print("aux after 2 frames:", {k: aux[k] for k in
          ("n_pairs", "n_pairs_kept", "n_live")})
    zc = np.asarray(jax.device_get(r._sat_zimg))
    cut = zc < SAT_NOCUT
    print(f"sat cut tiles: {cut.sum()}/{zc.size} "
          f"({100.0 * cut.mean():.1f}%)")
    if cut.any():
        print("cut slot percentiles:",
              np.percentile(zc[cut], [0, 25, 50, 75, 100]).astype(int))
    # per-row cut fraction (rows ~ distance at this camera)
    print("cut fraction per tile row:",
          np.array2string(cut.mean(axis=1), precision=2))

    # the alpha image explains non-saturation: per tile, the MIN pixel
    # alpha after full compositing (alpha < 1 - MIN_T <=> unsaturated)
    img = np.asarray(r.render(None, camera, sp, rc, staged=staged,
                              as_numpy=True, use_skybox=False,
                              use_proxy=True))
    a = img[..., 3]
    th, tw = r.cfg.tile_h, r.cfg.tile_w
    nty, ntx = -(-1080 // th), -(-1920 // tw)
    ap = np.pad(a, ((0, nty * th - 1080), (0, ntx * tw - 1920)))
    amin = ap.reshape(nty, th, ntx, tw).min(axis=(1, 3))
    amean = ap.reshape(nty, th, ntx, tw).mean(axis=(1, 3))
    print("per-tile MIN alpha percentiles:",
          np.percentile(amin, [0, 10, 25, 50, 75, 90, 100]).round(3))
    print("per-tile MEAN alpha percentiles:",
          np.percentile(amean, [0, 10, 25, 50, 75, 90, 100]).round(3))
    print("tiles with min alpha > 0.998:",
          (amin > 1.0 - 2.0 / 255.0).sum(), "/", amin.size)


if __name__ == "__main__":
    main()
