#!/usr/bin/env python
"""Why is the 4K full-config frame FASTER than 1080p? (VERDICT r3 weak #2)

Same scene, same camera (16:9 at both), same DrawTable: builds one
WangTileEngine, stages one sort, then renders through a 1080p and a 4K
Renderer in ONE process so the numbers are same-session comparable.
Per resolution it times three variants (gs-only / +skybox / full) and
dumps the live-vs-padded domain accounting (n_pairs, n_extra, n_live,
n_entries vs the compiled buckets) plus overflow flags, so the ~35 ms
inversion decomposes into (a) stage deltas and (b) padding waste.

    python benchmarks/inversion_ab.py [-n 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("--res", default="1920x1080,3840x2160",
                    help="comma list of WxH to compare")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
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

    sky = np.clip(
        np.linspace(0, 4, 64)[:, None, None] * np.ones((64, 128, 3), np.float32),
        0, 4)
    checker = np.kron(
        np.indices((64, 64)).sum(0) % 2, np.ones((8, 8))
    ).astype(np.float32)
    proxy = np.stack(
        [checker * 0.8 + 0.1, checker * 0.5 + 0.2, checker * 0.3 + 0.1],
        axis=-1)

    resolutions = []
    for tok in args.res.split(","):
        w, h = tok.lower().split("x")
        resolutions.append((int(w), int(h)))

    # one camera per aspect (identical here: both 16:9) -> one sort
    camera = Camera(
        resolutions[0], cam_pos, (0.0, 30.0, 2.0), (0.0, 0.0, 1.0),
        np.deg2rad(45.0), 0.1, 1000.0,
    )
    dt = eng.sort_tiles(cam_pos, camera.view_proj())

    def timed(r, sp, rc, staged, cam, use_skybox, use_proxy, n):
        img = r.render(None, cam, sp, rc, staged=staged, as_numpy=False,
                       use_skybox=use_skybox, use_proxy=use_proxy)
        _ = jax.device_get(img[..., 3].sum())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            img = r.render(None, cam, sp, rc, staged=staged, as_numpy=False,
                           use_skybox=use_skybox, use_proxy=use_proxy)
            _ = jax.device_get(img[..., 3].sum())
            ts.append((time.perf_counter() - t0) * 1e3)
        ts = np.array(ts)
        med = float(np.median(ts))
        kept = ts[ts <= 3.0 * med]
        return float(np.mean(kept)), len(ts) - len(kept)

    for (w, h) in resolutions:
        cam = Camera(
            (w, h), cam_pos, (0.0, 30.0, 2.0), (0.0, 0.0, 1.0),
            np.deg2rad(45.0), 0.1, 1000.0,
        )
        r = Renderer(eng, RendererConfig(width=w, height=h))
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(proxy)
        rc = RenderConfig.new(eng.n_tiles[0])
        sp = SceneParams.from_data(ud, eng.center_coord, rc)
        staged = r.stage(dt, cam, rc.culling_dist)
        s_pad = staged["s_pad"]
        row = {"res": f"{w}x{h}", "s_pad": int(s_pad)}
        for name, sb, px in (("gs", False, False), ("gs+sky", True, False),
                             ("full", True, True)):
            ms, dropped = timed(r, sp, rc, staged, cam, sb, px, args.n)
            row[name + "_ms"] = round(ms, 1)
            if dropped:
                row[name + "_stall_discards"] = dropped
            a = r.last_aux or {}
            if name == "full":
                mp = r._pairs_bucket(s_pad)
                ml = r._live_bucket(s_pad)
                row["aux"] = {
                    k: int(np.asarray(a[k]).item())
                    for k in ("n_pairs", "n_extra", "n_live", "n_entries",
                              "overflow")
                    if k in a
                }
                if "n_live_paths" in a:
                    row["aux"]["n_live_paths"] = [
                        int(x) for x in np.asarray(a["n_live_paths"]).tolist()
                    ]
                row["buckets"] = {
                    "max_pairs": int(mp), "max_live": int(ml),
                    "max_entries": int(r._ne_bucket(s_pad, mp, ml)),
                    "live_paths": [int(x)
                                   for x in r._live_path_buckets(s_pad, ml)],
                    "proxy_pairs": int(r._proxy_bucket()),
                }
                row["overflow_retries"] = int(
                    getattr(r, "last_overflow_retries", 0))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
