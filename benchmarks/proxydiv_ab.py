#!/usr/bin/env python
"""Same-session A/B of the fast profile's proxy resolution divisor.

The proxy pass (triangle raster + mips + attribute divides) is a ~21 ms
device line at div=2 (the fast profile's auto). This measures the full
config (skybox+proxy) at div in {2, 4} in ONE process, at the bench
fixed camera, and reports frame ms + the max |diff| between the two
variants' images (the fidelity cost of coarser depth/hit upsampling).

    python benchmarks/proxydiv_ab.py [-n 12] [--divs 2 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=12)
    ap.add_argument("--divs", type=int, nargs="+", default=[2, 4])
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData, hintstore
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

    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    rcfg0 = RendererConfig(width=width, height=height)
    hkey = (f"v1_{width}x{height}_s512_l3_full"
            f"_t{rcfg0.tile_w}x{rcfg0.tile_h}_c{rcfg0.chunk}"
            + ("_cull" if rcfg0.cull_exact else "")
            + ("_dc" if rcfg0.depth_cull else "")
            + ("_sat" if rcfg0.sat_cull and not rcfg0.exact else ""))
    hints = hintstore.load(hkey)

    def measure(div: int):
        r = Renderer(eng, RendererConfig(width=width, height=height,
                                         proxy_res_div=div))
        if hints:
            r.set_bucket_hints(hints)
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(tex)
        staged = r.stage(dt, camera, rc.culling_dist)

        def frame():
            img = r.render(None, camera, sp, rc, staged=staged,
                           as_numpy=False, use_skybox=True, use_proxy=True)
            jax.block_until_ready(img)
            return img

        t0 = time.time()
        img = frame()
        print(f"[div={div}] first frame (incl. compile) "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        for _ in range(3):
            img = frame()
        ts = []
        for _ in range(args.n):
            t0 = time.time()
            img = frame()
            ts.append((time.time() - t0) * 1000.0)
        ts = np.array(ts)
        print(f"[div={div}] frame ms: mean {ts.mean():.1f}  "
              f"median {np.median(ts):.1f}  min {ts.min():.1f}  (n={args.n})")
        return np.median(ts), img

    results = {}
    imgs = {}
    for d in args.divs:
        results[d], imgs[d] = measure(d)
    base = args.divs[0]
    for d in args.divs[1:]:
        diff = np.abs(np.asarray(jax.device_get(imgs[d]))
                      - np.asarray(jax.device_get(imgs[base])))
        print(f"div {d} vs {base}: median {results[d]:.1f} vs "
              f"{results[base]:.1f} ms; max|diff| {diff.max():.4f} "
              f"({diff.max()*255:.1f}/255), mean|diff| {diff.mean():.6f}, "
              f"px>8/255: {(diff.max(axis=-1) > 8/255).mean()*100:.3f}%")


if __name__ == "__main__":
    main()
