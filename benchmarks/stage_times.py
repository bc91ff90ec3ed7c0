#!/usr/bin/env python
"""Stage-split device timings for the headline 1080p frame.

xprof device traces are unavailable under the tunneled dev harness, so this
measures cumulative sub-pipelines as separately jitted programs (each reduced
to a scalar so outputs don't dominate):

  P   = assemble_and_project
  PB  = P + bin_pairs
  PBR = P + bin_pairs + rasterize_pallas (the full gs path)

Differences approximate per-stage cost (fusion boundaries shift a little).

    python benchmarks/stage_times.py [--small] [-n 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_frame import build  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    from gswt_renderer_tpu.core.camera import CameraUniforms
    from gswt_renderer_tpu.ops import binning, project, raster

    r, sp, rc, staged, camera = build(args.small)
    c = r.cfg
    image_wh = (c.width, c.height)
    tile_wh = (c.tile_w, c.tile_h)
    stream = staged["stream"]
    draw = staged["draw"]
    s_pad = staged["s_pad"]
    max_pairs = r._pairs_bucket(s_pad)
    max_live = r._live_bucket(s_pad)
    max_entries = r._ne_bucket(s_pad, max_pairs, max_live)
    uniforms = jnp.asarray(
        r.pack_frame_uniforms(
            sp, CameraUniforms(camera), [True] * 16, rc.culling_dist
        )
    )

    def stage_p(store_packed, panels, stream, draw, uniforms, hm4):
        scene, cam, lod_enable, culling_dist, gs_enable = (
            r.unpack_frame_uniforms(uniforms)
        )
        with jax.default_matmul_precision("highest"):
            keep = project.cull_draws(draw, cam, culling_dist, lod_enable)
            p = project.assemble_and_project(
                stream["blocks"], stream["merged"], panels, keep,
                store_packed, scene, cam, hm4, r.height_map_wh,
                surface_type=int(sp.surface_type), draw_mode=0,
                image_wh=image_wh, point_cloud=False, gs_enable=gs_enable,
                interpret=c.interpret, exact=c.exact,
            )
        return p

    def sum_p(p):
        acc = jnp.float32(0)
        for k, v in p.items():
            if v is None:
                continue
            if isinstance(v, (tuple, list)):
                for x in v:
                    acc += jnp.sum(x.astype(jnp.float32))
            else:
                acc += jnp.sum(v.astype(jnp.float32))
        return acc

    def f_p(*a):
        return sum_p(stage_p(*a))

    def stage_pb(*a):
        p = stage_p(*a)
        with jax.default_matmul_precision("highest"):
            binned = binning.bin_pairs(
                p, image_wh=image_wh, tile_wh=tile_wh, max_pairs=max_pairs,
                chunk=c.chunk, exact=c.exact, max_entries=max_entries,
                max_live=max_live, elem_paths=c.elem_paths,
            )
        return binned

    def f_pb(*a):
        binned = stage_pb(*a)
        acc = jnp.sum(binned["table"]) + jnp.sum(
            binned["entry_tf"].astype(jnp.float32)
        )
        return acc

    def f_pbr(*a):
        binned = stage_pb(*a)
        with jax.default_matmul_precision("highest"):
            depth = jnp.ones((c.height, c.width), jnp.float32)
            depth_tiles = raster.image_to_depth_tiles(
                depth, image_wh=image_wh, tile_wh=tile_wh
            )
            tiles = raster.rasterize_pallas(
                binned, depth_tiles, image_wh=image_wh, tile_wh=tile_wh,
                chunk=c.chunk, interpret=c.interpret,
            )
        return jnp.sum(tiles)

    fns = [("P  (project)", f_p), ("PB (+binning)", f_pb),
           ("PBR(+raster)", f_pbr)]
    argsv = (r.store_packed, r.panels, stream, draw, uniforms, r.hm4)
    results = {}
    for name, f in fns:
        jf = jax.jit(f)
        t0 = time.time()
        out = jf(*argsv)
        # axon's block_until_ready does NOT block on execution; a d2h fetch
        # of the (scalar) output is the only real completion barrier
        _ = jax.device_get(out)
        print(f"[stage] {name}: compile+1st {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(args.n):
            t0 = time.time()
            _ = jax.device_get(jf(*argsv))
            ts.append((time.time() - t0) * 1e3)
        results[name] = float(np.median(ts))
        print(f"[stage] {name}: median {results[name]:.1f} ms", file=sys.stderr)
    ks = list(results)
    print(f"\n[stage] breakdown (medians incl. ~27ms dispatch+fetch round trip):", file=sys.stderr)
    print(f"  project          {results[ks[0]]:.1f} ms", file=sys.stderr)
    print(f"  binning          {results[ks[1]] - results[ks[0]]:.1f} ms",
          file=sys.stderr)
    print(f"  raster           {results[ks[2]] - results[ks[1]]:.1f} ms",
          file=sys.stderr)
    print(f"  full gs path     {results[ks[2]]:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
