#!/usr/bin/env python
"""Quantify the fast profile's proxy-depth-test fidelity at the bench
camera: render the full config (skybox+proxy) in BOTH profiles at the
same camera and report (a) the image diff, (b) the pair mass failing
z<depth tile-wide under f32 vs bf16 depth keys.

Question under test: with the reference default proxy_height=-0.5 the
proxy sits 0.5 BELOW the splat surface, so in f32 splats win the depth
test; if the fast profile's bf16 z ties resolve to 'behind', distant
splats vanish and the proxy shows instead — a fidelity break, not
occlusion. This measures how big that break is.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(exact):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    width, height = 1920, 1080
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
    camera = Camera((width, height), cam_pos, (0.0, 30.0, 2.0),
                    (0.0, 0.0, 1.0), np.deg2rad(45.0), 0.1, 1000.0)
    dt = eng.sort_tiles(cam_pos, camera.view_proj())

    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)

    r = Renderer(eng, RendererConfig(width=width, height=height,
                                     exact=exact))
    r.configure(ud)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(tex)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)
    img = r.render(None, camera, sp, rc, staged=staged, as_numpy=True,
                   use_skybox=True, use_proxy=True)
    aux = {k: np.asarray(v).tolist() for k, v in (r.last_aux or {}).items()}
    return np.asarray(img), aux


def main():
    img_f, aux_f = build(exact=False)
    img_x, aux_x = build(exact=True)
    print("fast  aux:", aux_f)
    print("exact aux:", aux_x)
    d = np.abs(img_f - img_x)
    print("image diff: max %.4f  mean %.5f  p99 %.4f  frac>8/255 %.4f"
          % (d.max(), d.mean(), np.percentile(d, 99),
             (d > 8.0 / 255.0).mean()))
    # where do the diffs live? split by screen rows (distance correlates
    # with row at this camera: horizon near the top of the terrain region)
    rows = d.max(axis=(1, 2))
    h = len(rows)
    for lo, hi in [(0, h // 4), (h // 4, h // 2), (h // 2, 3 * h // 4),
                   (3 * h // 4, h)]:
        seg = d[lo:hi]
        print(f"rows {lo:4d}-{hi:4d}: max {seg.max():.4f} mean "
              f"{seg.mean():.5f} frac>8/255 {(seg > 8/255.).mean():.4f}")


if __name__ == "__main__":
    main()
