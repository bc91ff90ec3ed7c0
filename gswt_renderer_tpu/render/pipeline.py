"""The jitted TPU frame pipeline.

One frame = one XLA program over dense HBM arrays:

  cull draws -> assemble + project the splat stream (panel block-gather +
  vs_main math, vectorized) -> tile binning (scatter/cummax expansion +
  stable payload sort by image tile) -> Pallas ordered compositor ->
  composite over skybox/proxy.

Host/device split (mirrors the reference's preloaded vs streaming buffers,
renderer.rs:270-327, recast for TPU): the splat store, the materialized
presort panels and the height map live in HBM across frames; the *splat
stream* (concatenation of per-draw presorted lists, renderer.rs:466-591) is
described by a per-SORT block plan built on the host builder thread — a few
hundred KB of panel ids + per-draw bits — and assembled ON DEVICE by one
Pallas panel copy (ops/blockgather.py). Between sorts only the camera
changes, so a frame uploads ~450 bytes. Stream buffers are bucketed to
powers of two to keep shapes static with minimal padding.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, CameraUniforms
from ..core.config import RenderConfig
from ..core.mathutil import OPENGL_TO_WGPU
from ..ops import binning, project, raster
from ..ops.project import GS_BITS, pack_tex4
from ..ops.proxy import render_proxy
from ..ops.skybox import render_skybox
from ..tiles.structures import DrawTable
from .uniforms import SceneParams


def _is_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# host-section profiler (GSWT_PROF_HOST=1): accumulates wall seconds per
# frame-loop section to locate non-overlapped host work in the pipelined
# drain (the interactive-vs-batched gap). Zero-cost when off.
HOST_PROF: dict = {}
_PROF_ON = bool(int(os.environ.get("GSWT_PROF_HOST", "0") or 0))

def _packed_interactive() -> bool:
    """Fuse the front+back frame programs into ONE launch for steady-state
    (sat-off) interactive frames — pays the fixed per-launch cost once
    (PERFORMANCE.md "fixed program/dispatch overhead ~30 ms"). Read per
    call so tests/A-B scripts can flip GSWT_PACKED_INTERACTIVE at runtime."""
    return bool(int(os.environ.get("GSWT_PACKED_INTERACTIVE", "0") or 0))


class _hprof:
    __slots__ = ("name", "t0")

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        if _PROF_ON:
            import time

            self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        if _PROF_ON:
            import time

            e = HOST_PROF.setdefault(self.name, [0, 0.0])
            e[0] += 1
            e[1] += time.perf_counter() - self.t0
        return False


def host_prof_report() -> str:
    lines = []
    for name, (n, s) in sorted(HOST_PROF.items(), key=lambda kv: -kv[1][1]):
        lines.append(f"{name:24s} n={n:5d} total={s * 1e3:9.1f} ms "
                     f"avg={s / max(n, 1) * 1e3:7.3f} ms")
    return "\n".join(lines)


STREAM_BLOCK = 256  # stream panel width (ops/blockgather.py BLOCK)
PANEL_ROWS = 16     # pos xyz, cov 6, rgba u32, packed gs|lod, map id, 4 pad
# (content is 12 rows; padded to 16 so the panel DMA's row dimension is
# aligned to the (8,128) VMEM tiling Mosaic requires for raw HBM slices)


def _next_pow2(n, lo, hi):
    """Smallest bucket >= n from {p, 1.25p, 1.5p} power-of-two ladders in
    [lo, hi]. The 1.25 rung cuts average padding ~8% across every sort/
    gather/scan domain (binning cost is linear in the bucket); grow-only
    session floors keep the extra rung from causing recompile thrash."""
    v = lo
    while v < hi:
        if n <= v:
            return v
        if n <= v + v // 4:
            return v + v // 4
        if n <= v + v // 2:
            return v + v // 2
        v *= 2
    return hi


@dataclass
class RendererConfig:
    width: int = 1920
    height: int = 1080
    # 64x32 raster tiles won the 1080p autotune (240ms vs 259 at 128x32 vs
    # 259 at 32x32: finer tiles cut per-pair pixel work but grow pair count)
    tile_w: int = 64
    tile_h: int = 32
    chunk: int = 256
    max_draws: int = 16384
    max_stream: int = 1 << 22
    min_stream: int = 1 << 14
    # first-frame budgets as fractions of the stream bucket, chosen to land
    # the FIRST frame on the converged adaptive bucket (one frame-variant
    # compile) instead of paying an overflow retry + recompile:
    # - pairs_factor seeds the k>=elem_paths extra-pair budget
    #   (ops/binning.py; the first elem_paths tiles ride the compacted
    #   stream) — measured ~0.070 extras/lane at the 1080p bench with
    #   elem_paths=4; x1.5 hint headroom lands on the same 1.5p ladder
    #   rung the hint path converges to (no second compile)
    # - live_factor seeds the live-splat compaction bucket — measured
    #   ~0.28/lane (the stream is mostly culled splats at typical cameras)
    pairs_factor: float = 0.11
    live_factor: float = 0.38
    # per-path prefix budgets for the count-classed compaction
    # (ops/binning.py): path j >= 1 only reads splats overlapping > j
    # tiles, so its sort stripe buckets on #count>j instead of max_live.
    # Seeds are fractions of the stream bucket (grow-only hints take over
    # from the first frame's observed n_live_paths); measured on the 1080p
    # bench path: count>1/2/3 = 0.26/0.113/0.106 of s_pad, which lands on
    # the (1310720, 524288, 524288) rungs with the 1.35x headroom
    live_path_factors: tuple = (0.36, 0.15, 0.15)
    # how many of a splat's overlapped tiles are emitted elementwise at its
    # own compacted slot before the scatter+cummax extras path takes over
    # (ops/binning.py). Each unit adds a max_live stripe to the joint sort
    # but removes a whole rank from the extras domain; 4 measured best at
    # the 1080p bench (extras demand 0.90M -> 0.22M, frame 191 -> 174 ms;
    # 3 and 6 were worse).
    elem_paths: int = 4
    # exact ellipse-tile pair cull (ops/binning.py _cull_pair_tiles):
    # masks bbox pairs whose quadratic cannot reach the exp(-4) cutoff at
    # any pixel center of their tile — value-safe up to f32 re-association
    # (the kernel zeroes those fragments anyway, but removing them moves
    # the blocked scan's group boundaries: <=3e-6 image shifts, see
    # tests/test_binning_buckets.py), shrinks raster worklists by the
    # bbox-vs-ellipse waste (~4.5% at 64x32 tiles, grows as tiles shrink).
    # On by default:
    # the r3 on-chip sweep measured 126.9 vs 129.3/130.7 ms same-session
    # on the 1080p full config (GSWT_CULL_EXACT=0 reverts).
    cull_exact: bool = os.environ.get("GSWT_CULL_EXACT", "1") == "1"
    # proxy-depth occlusion cull (ops/binning.py occ_zimg): drops pairs
    # whose depth key fails the raster's `z < proxy depth` test at every
    # pixel of their tile — the TPU stand-in for the early-z the
    # reference's ROP applies per fragment (renderer.rs:179-185 over the
    # proxy depth pre-pass, proxy.rs:119-125). Value-safe up to the same
    # scan-group re-association as cull_exact. Only active in use_proxy
    # frame variants (no depth, no cull). OFF by default: at the
    # reference default proxy_height=-0.5 the proxy sits BELOW the
    # splats, so tile-wide occlusion is scene-dependent — the round-5
    # same-session A/B (benchmarks/cull_ab.py, 2026-08-20) measured it
    # culling 3-4% of pairs yet costing a net +1 ms/frame at both bench
    # cameras (161.3 vs 160.0 ms; its two compare passes + dilated-max
    # image outweigh the pair savings). GSWT_DEPTH_CULL=1 opts in for
    # scenes with real proxy occlusion (hilly terrain at grazing views).
    depth_cull: bool = os.environ.get("GSWT_DEPTH_CULL", "0") == "1"
    # temporal saturation cull: the raster records, per tile, the STREAM
    # SLOT beyond which nothing contributed this frame because the tile
    # was already opaque (its early exit was skipping whole entries —
    # ops/raster.py emit_zcut), and the NEXT frame's binning drops pairs
    # behind that cut (dilated sat_dilate tiles for camera-motion margin).
    # This is the per-PIXEL-bounded work reduction the reference gets from
    # the ROP's early-z/blend hardware. The cut is SLOT-keyed, which makes
    # the certificate self-renewing: the cull never removes anything
    # before the recorded slot, so the kept prefix's transmittance
    # upper-bounds the full stack's and each frame's record is sound for
    # its own content even right after a camera jump or stream re-sort —
    # stale cuts cause at most a one-frame under-composite (error bounded
    # by the tile's carried transmittance), then the loop is sound again.
    # When the prediction holds the culled pairs composite entirely behind
    # transmittance < MIN_T = 0.5/255, below the reference ROP's own
    # quantization. Fast profile only. OFF by default: the round-5
    # same-session A/B (benchmarks/cull_ab.py, 2026-08-20, static cameras
    # = the cull's best case, fully converged) measured +17-20 ms/frame
    # (178.2 vs 161.3 ms) for ~ZERO pairs culled beyond the depth cull —
    # the bench scene's tiles never saturate (transmittance stays above
    # MIN_T), so the zcut emission (8 accumulator rows vs 4 + per-entry
    # record pass) and band lookups are pure cost. The round-4 "10-17% of
    # pairs" motivation predates the u16-z fidelity fix. GSWT_SAT_CULL=1
    # opts in for genuinely opaque scenes; a motion gate (see render())
    # disables all cull overhead while the camera moves beyond the
    # dilation margin.
    sat_cull: bool = os.environ.get("GSWT_SAT_CULL", "0") == "1"
    sat_dilate: int = int(os.environ.get("GSWT_SAT_DILATE", "1"))
    # seed-scale for the adaptive-bucket FLOORS in occlusion/saturation-
    # culled variants: the splat-level cull shrinks observed
    # n_live/n_extra/n_entries far below the gs-only seed factors, and
    # grow-only floors would otherwise pin the sort domains at pre-cull
    # size forever. Applied once the sat cull is ACTIVE (a recorded cut
    # exists), or for depth-cull-only sessions with sat_cull disabled; a
    # camera that defeats the cull overflows once and the retry regrows.
    dc_seed_scale: float = 0.12
    # the proxy triangle raster's tile grid is independent of the splat
    # grid (its full-image depth output is re-tiled to the splat grid by
    # image_to_depth_tiles); 64x32 won its own trade between per-entry
    # pixel work and worklist entry count
    proxy_tile_w: int = 64
    proxy_tile_h: int = 32
    # render the proxy pass at (W/div, H/div) and upsample (depth/hit
    # nearest, color bilinear). The proxy is the smooth DISTANT-terrain
    # stand-in (proxy.rs:119-125), so halving its resolution is visually
    # benign while its per-pixel footprint/divide work scales ~1/div^2;
    # the depth test against splats quantizes to div-px blocks at
    # splat/proxy silhouettes. 1 = reference-exact full resolution;
    # 0 = auto: 1 in the exact profile, 2 in the fast profile (on-chip
    # A/B: full-config frame 129.0 -> 118.2 ms same-session).
    proxy_res_div: int = int(os.environ.get("GSWT_PROXY_RES_DIV", "0"))
    interpret: bool | None = None  # None = auto (interpret off on TPU)
    # exact=True follows the WGSL/oracle math ALGEBRAICALLY (the ln-alpha
    # exponent fold and per-tile recentering change f32 rounding, so it is
    # f32-rounding-identical, not bit-identical — parity-tested against
    # the unmodified per-pixel oracle at <=1e-3); the default fast profile
    # additionally packs the pair table (bf16 q + u8 rgba) and uses the
    # analytic height-map gradient — deviations bounded by ~1-2/255, under
    # the reference's own 8-bit ROP quantization (PARITY.md #8)
    exact: bool = False


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

        assert n < (1 << GS_BITS), "splat store exceeds 26-bit index budget"
        # Materialized presort panels: for every (lod, tile, view) the
        # REVERSED blended presort table (kind 0) and the reversed filtered
        # own-lod table (kind 1; a non-changing draw discards the blended
        # lower-lod entries in the shader anyway — valid_lod_id,
        # gswt.wgsl:39-42 — so assembling the filtered list is exact and
        # roughly halves the per-frame stream), each segment 256-aligned.
        # A draw's stream segment is then a PREFIX of its panel segment
        # (draws always carry the full table; stream lanes are globally
        # front-to-back, i.e. reversed), so per-sort stream assembly is a
        # pure panel block-gather (ops/blockgather.py) instead of per-splat
        # element gathers — the round-1 profile's largest line item.
        blk = STREAM_BLOCK
        n_lod, n_tile, n_view = engine.n_tiles
        self.seg_block = np.zeros((2, n_lod, n_tile, n_view), np.int64)
        self.seg_count = np.zeros((2, n_lod, n_tile, n_view), np.int64)
        segs = []  # (kind, l, t, v, idx_fwd, lod_fwd)
        base = 0
        for l in range(n_lod):
            for t in range(n_tile):
                for v in range(n_view):
                    bd = engine.tile_base_data[l][t][v]
                    own = bd.gs_lod_id == l
                    for kind, (gi, gl) in enumerate(
                        (
                            (bd.gs_index, bd.gs_lod_id),
                            (bd.gs_index[own], None),
                        )
                    ):
                        self.seg_block[kind, l, t, v] = base // blk
                        self.seg_count[kind, l, t, v] = len(gi)
                        segs.append((base, l, gi, gl))
                        base += -(-max(len(gi), 1) // blk) * blk
        np_panel = base
        est_gb = np_panel * PANEL_ROWS * 4 / 1e9
        if est_gb > 8.0:
            import sys

            print(
                f"[gswt] warning: materialized presort panels need "
                f"{est_gb:.1f} GB HBM; reduce views/lods or shard the scene",
                file=sys.stderr,
            )
        panels = np.zeros((PANEL_ROWS, np_panel), np.float32)
        for base_i, l, gi, gl in segs:
            m = len(gi)
            if m == 0:
                continue
            rev = gi[::-1].astype(np.int64)
            revlod = (
                gl[::-1].astype(np.int64)
                if gl is not None
                else np.full(m, l, np.int64)
            )
            panels[0:10, base_i : base_i + m] = packed_store[:, rev]
            panels[10, base_i : base_i + m] = (
                (rev | (revlod << GS_BITS)).astype(np.int32).view(np.float32)
            )
            # row 11 (map id) stays 0: only merged lanes carry map ids
        self.panels = jnp.asarray(panels)
        self.np_panel_blocks = np_panel // blk

        self.height_map_wh = (1, 1)
        self.hm4 = jnp.zeros((4, 1), jnp.float32)
        self.skybox_tex = None
        self.skybox_equirect = True
        self.proxy_tex = None
        self.proxy_wh = (1, 1)
        self._frame_jit = {}
        self.last_aux = None

    # ------------------------------------------------------------------ #
    def configure(self, user_data):
        """Bind the height map after engine.configure (renderer.rs:351-405)
        and build the proxy tile-map grid mesh (proxy.rs:215-258)."""
        if user_data.height_map is not None and len(user_data.height_map):
            w, h = user_data.height_map_wh
            self.height_map_wh = (int(w), int(h))
            # small-source fast path: sample the bicubic surface of the
            # pre-resize source directly (ops/project._smallmap_bicubic)
            # instead of gathering from the resized 1024^2 map per splat
            src = getattr(user_data, "height_map_src", None)
            self.hm_src = jnp.zeros((1, 1), jnp.float32)
            if (not self.cfg.exact) and src is not None:
                sw, sh = user_data.height_map_src_wh
                if sw * sh <= 4096:
                    self.hm_src = jnp.asarray(
                        np.asarray(src, np.float32).reshape(sh, sw)
                    )
            self.hm4 = jnp.asarray(
                pack_tex4(user_data.height_map, int(w), int(h))
            )
        else:
            self.height_map_wh = (1, 1)
            self.hm4 = jnp.zeros((4, 1), jnp.float32)
            self.hm_src = jnp.zeros((1, 1), jnp.float32)
        from ..ops.proxy import make_map_grid

        gv, gt = make_map_grid(
            user_data.tile_map_wh, user_data.tile_map_half_wh,
            user_data.tile_width,
        )
        self.proxy_verts = jnp.asarray(gv)
        self.proxy_tris = jnp.asarray(gt)

    def set_skybox(self, tex, equirect=True, bake=False, bake_resolution=2048):
        """Upload a skybox: equirect HDRI [H,W,3] or cube faces [6,R,R,3].
        bake=True runs the reference's 6-pass HDRI->cubemap bake
        (skybox.rs:341-455) so runtime sampling goes through the cubemap
        path; the default samples the equirect directly (identical output
        up to the cubemap's own resample, PARITY.md #5)."""
        if tex is None:
            self.skybox_tex = None
            return
        if equirect and bake:
            from ..ops.skybox import bake_hdri_to_cubemap

            self.skybox_tex = bake_hdri_to_cubemap(tex, bake_resolution)
            self.skybox_equirect = False
            return
        self.skybox_tex = jnp.asarray(tex, jnp.float32)
        self.skybox_equirect = equirect

    def set_proxy(self, tex):
        """Upload the proxy ground texture. tex: [H,W,3] (the Lanczos mip
        chain is built here, proxy.rs:513-554) or a prebuilt list of mip
        levels."""
        if tex is None:
            self.proxy_tex = None
            return
        from ..io.textures import build_mip_chain
        from ..ops.proxy import pack_mip_atlas

        mips = tex if isinstance(tex, (list, tuple)) else build_mip_chain(
            np.asarray(tex, np.float32)
        )
        atlas, meta = pack_mip_atlas(mips)
        self.proxy_tex = jnp.asarray(atlas)
        self.proxy_mip_meta = meta
        self.proxy_wh = (meta[0][0], meta[0][1])
        # block-diagonal pyramid for the gather-free fast-profile sampler
        from ..ops.texsample import pack_pyramid

        pyr, pyr_meta, l_min = pack_pyramid(mips)
        self.proxy_pyr = jnp.asarray(pyr)
        self.proxy_pyr_meta = (pyr_meta, l_min)

    # ------------------------------------------------------------------ #
    @staticmethod
    def host_cull(dt: DrawTable, n: int, view_proj: np.ndarray,
                  culling_dist: float) -> np.ndarray:
        """Per-draw viewport culling on the host (renderer.rs:471-494) with
        the stage-time camera. Used with a margin over the render-time
        culling distance so the exact per-frame device cull never disagrees.
        Returns keep mask [n]."""
        corners = dt.corner_pos[:n]  # [n,4,3]
        hom = np.concatenate(
            [corners, np.ones_like(corners[..., :1])], axis=-1
        )
        p = hom @ view_proj.T
        with np.errstate(divide="ignore", invalid="ignore"):
            pd = p[..., :3] / p[..., 3:4]
        px = np.min(np.abs(pd[..., 0]), axis=1)
        py = np.min(np.abs(pd[..., 1]), axis=1)
        pz = np.max(pd[..., 2], axis=1)
        culled = (pz < -culling_dist) | (px > culling_dist) | (py > culling_dist)
        culled &= (dt.single_draw[:n] == 0) & (dt.has_corners[:n] == 1)
        return ~culled

    def plan_blocks_host(self, dt: DrawTable, view_proj=None,
                         culling_dist: float = 1.0):
        """Build the per-sort block plan (renderer.rs:466-591's draw loop,
        recast as panel bookkeeping): walk draws front-to-back (reversed)
        and emit, per 256-lane block, the source panel id + per-draw uniform
        bits. Merged streams get a reversed copy into the aligned merged
        scratch. With view_proj given, host-culled draws are dropped (with a
        margin; the device cull stays exact).

        Returns (blocks [5, NB] i32, merged [2, M] i32, total, n,
        truncated_splats)."""
        from ..ops.project import pack_draw_bits

        c = self.cfg
        blk = STREAM_BLOCK
        n = min(dt.n_draws, c.max_draws)
        if n == 0:
            return (
                np.zeros((5, 0), np.int32),
                np.zeros((2, blk), np.int32), 0, 0, 0,
            )
        is_merged = dt.stream_start[:n] >= 0
        changing = dt.changing[:n] == 1
        bl = np.clip(dt.base_lod[:n], 0, self.seg_count.shape[1] - 1)
        bt = np.clip(dt.base_tile[:n], 0, self.seg_count.shape[2] - 1)
        bv = np.clip(dt.base_view[:n], 0, self.seg_count.shape[3] - 1)
        # non-merged, non-changing draws use the filtered (own-lod) panels
        kind = np.where(changing, 0, 1)
        seg_cnt = self.seg_count[kind, bl, bt, bv]
        seg_base = self.seg_block[kind, bl, bt, bv]
        counts = np.where(
            is_merged,
            dt.splat_count[:n].astype(np.int64),
            np.minimum(dt.splat_count[:n].astype(np.int64), seg_cnt),
        )
        if view_proj is not None:
            keep = self.host_cull(dt, n, view_proj, culling_dist * 1.25)
            counts = np.where(keep, counts, 0)

        # front-to-back walk = reversed draw order
        order = np.arange(n - 1, -1, -1)
        cnt_r = counts[order]
        nb_r = -(-cnt_r // blk)
        # truncate draws overflowing the stream block budget; a truncated
        # draw keeps its FRONT-most lanes. Surfaced via truncated_splats.
        max_blocks = c.max_stream // blk
        cum_b = np.cumsum(nb_r)
        requested = int(cnt_r.sum())
        over = int(np.searchsorted(cum_b, max_blocks, side="right"))
        if over < n:
            prev = int(cum_b[over - 1]) if over > 0 else 0
            cnt_r = cnt_r.copy()
            cnt_r[over] = min(cnt_r[over], (max_blocks - prev) * blk)
            cnt_r[over + 1 :] = 0
            nb_r = -(-cnt_r // blk)
            cum_b = np.cumsum(nb_r)
        total = int(cnt_r.sum())
        truncated = requested - total
        counts_final = np.zeros(n, np.int64)
        counts_final[order] = cnt_r

        # merged scratch: reversed lane copies, segment-aligned
        m_rows = order[is_merged[order] & (cnt_r > 0)]
        m_nb = -(-counts_final[m_rows] // blk)
        m_base = np.zeros(len(m_rows), np.int64)
        if len(m_rows):
            m_base[1:] = np.cumsum(m_nb)[:-1]
        m_total_blocks = int(m_nb.sum()) if len(m_rows) else 0
        merged = np.zeros((2, max(m_total_blocks, 1) * blk), np.int32)
        merged_base_of = np.zeros(n, np.int64)
        for r, mb in zip(m_rows, m_base):
            cnt = int(counts_final[r])
            # on truncation keep the FRONT-most lanes (stream is reversed,
            # so the front of a segment is the END of the forward slice)
            s1 = int(dt.stream_start[r]) + int(dt.splat_count[r])
            sl = slice(s1 - cnt, s1)
            merged[0, mb * blk : mb * blk + cnt] = (
                dt.stream_gs_index[sl].astype(np.int64)
                | (dt.stream_lod_id[sl].astype(np.int64) << GS_BITS)
            ).astype(np.int32)[::-1]
            merged[1, mb * blk : mb * blk + cnt] = (
                dt.stream_map_id[sl].astype(np.int32)[::-1]
            )
            merged_base_of[r] = mb

        # per-draw uniform bits (device applies culling via keep_draw)
        b1, b2 = pack_draw_bits(
            dt.single_draw[:n].astype(np.int64),
            dt.changing[:n].astype(np.int64),
            dt.changing_to_lower[:n].astype(np.int64),
            dt.tile_lod[:n].astype(np.int64),
            dt.valid_lod_id[:n].astype(np.int64),
            dt.view_id[:n].astype(np.int64),
            dt.tile_id[:n].astype(np.int64),
            dt.map_index[:n].astype(np.int64),
            dt.single_lod_id[:n].astype(np.int64),
        )
        src_of = np.where(
            is_merged, self.np_panel_blocks + merged_base_of, seg_base
        )

        # expand per-draw -> per-block
        live = nb_r > 0
        d_live = order[live]
        nb_live = nb_r[live]
        cnt_live = cnt_r[live]
        nb_total = int(nb_live.sum())
        draw_of_block = np.repeat(d_live, nb_live)
        k_within = np.arange(nb_total, dtype=np.int64) - np.repeat(
            np.cumsum(nb_live) - nb_live, nb_live
        )
        blocks = np.empty((5, nb_total), np.int32)
        blocks[0] = src_of[draw_of_block] + k_within
        blocks[1] = b1[draw_of_block]
        blocks[2] = b2[draw_of_block]
        blocks[3] = np.minimum(
            np.repeat(cnt_live, nb_live) - k_within * blk, blk
        )
        blocks[4] = draw_of_block
        return blocks, merged, total, n, truncated

    def prepare_draws(self, dt: DrawTable, n: int, total: int,
                      d_pad: int | None = None):
        """Pad the per-draw arrays the device still needs (render-time
        culling) to d_pad (grow-only bucket; default MAX_DRAWS)."""
        c = self.cfg
        d_pad = d_pad or c.max_draws

        def pad_i(a, fill=0, dtype=np.int32):
            out = np.full(d_pad, fill, dtype)
            out[:n] = a[:n]
            return out

        corner = np.zeros((d_pad, 4, 3), np.float32)
        corner[:n] = dt.corner_pos[:n]
        return dict(
            n_draws=np.int32(n),
            total_splats=np.int32(total),
            single_draw=pad_i(dt.single_draw),
            tile_lod=pad_i(dt.tile_lod),
            has_corners=pad_i(dt.has_corners),
            corner_pos=corner,
        )

    # ------------------------------------------------------------------ #
    # per-frame uniforms travel as ONE packed f32 vector: each separate
    # jnp.asarray is a host->device RPC (~1-5 ms each on the dev tunnel)
    UNIFORMS_LEN = 112

    @staticmethod
    def pack_frame_uniforms(scene: SceneParams, cam: CameraUniforms,
                            lod_enable, culling_dist: float,
                            render_gs: bool = True) -> np.ndarray:
        v = np.zeros(Renderer.UNIFORMS_LEN, np.float32)
        v[0:16] = cam.view.reshape(-1)
        v[16:32] = (OPENGL_TO_WGPU @ cam.projection).reshape(-1)
        v[32:48] = (cam.projection @ cam.view).reshape(-1)
        v[48:50] = cam.focal
        v[50:52] = cam.htan_fov
        v[52:55] = cam.cam_pos
        v[55] = scene.splat_scale
        v[56] = scene.tile_width
        v[57] = scene.use_clip
        v[58] = scene.clip_height
        v[59] = scene.sphere_radius
        v[60] = scene.point_cloud_radius
        v[61] = scene.transition_width_ratio
        v[62] = scene.num_lod
        v[63:65] = scene.map_half_wh
        v[65:67] = scene.center_coord
        v[67:83] = scene.transition_dist_vec
        v[83:86] = scene.height_map_scale
        v[86:89] = scene.scene_scale
        le = [1.0 if b else 0.0 for b in lod_enable][:16]
        v[89 : 89 + len(le)] = le
        v[105] = culling_dist
        v[106] = 1.0 if render_gs else 0.0
        return v

    @staticmethod
    def unpack_frame_uniforms(v):
        """Device-side unpack into (scene_dict, cam_dict, lod_enable,
        culling_dist)."""
        cam = dict(
            view=v[0:16].reshape(4, 4),
            proj_wgpu=v[16:32].reshape(4, 4),
            view_proj=v[32:48].reshape(4, 4),
            focal=v[48:50],
            htan_fov=v[50:52],
            cam_pos=v[52:55],
        )
        scene = dict(
            splat_scale=v[55],
            tile_width=v[56],
            use_clip=v[57].astype(jnp.int32),
            clip_height=v[58],
            sphere_radius=v[59],
            point_cloud_radius=v[60],
            transition_width_ratio=v[61],
            num_lod=v[62].astype(jnp.int32),
            map_half_wh=v[63:65].astype(jnp.int32),
            center_coord=v[65:67].astype(jnp.int32),
            transition_dist_vec=v[67:83],
            height_map_scale=v[83:86],
            scene_scale=v[86:89],
        )
        lod_enable = v[89:105].astype(jnp.int32)
        culling_dist = v[105]
        gs_enable = v[106].astype(jnp.int32)
        return scene, cam, lod_enable, culling_dist, gs_enable

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
    def _frame_packed(self, store_packed, panels, stream, draw, uniforms,
                      hm4, skybox_tex, proxy_tex, hm_src=None, **statics):
        """Whole-frame composition as ONE program (the driver entry and the
        sharded parallel paths jit this); the interactive render path runs
        _frame_front / _frame_back as separate programs so adaptive-bucket
        flips recompile less and XLA-cache at a finer grain."""
        binned, bg, depth_tiles, aux = self._frame_front(
            store_packed, panels, stream, draw, uniforms, hm4, skybox_tex,
            proxy_tex, hm_src=hm_src, **statics,
        )
        out = self._frame_back(
            binned, bg, depth_tiles, use_proxy=statics["use_proxy"]
        )
        return out, aux

    def _frame_front(self, store_packed, panels, stream, draw, uniforms,
                     hm4, skybox_tex, proxy_tex, hm_src=None, sat_zimg=None,
                     *, surface_type, draw_mode, point_cloud, use_skybox,
                     use_proxy, proxy_opts, max_pairs=None,
                     max_entries=None, max_live=None, live_buckets=None,
                     emit_block_demand=False):
        """Program A: projection + binning + background/proxy depth.
        Returns (binned, bg, depth_tiles, aux). Split from the raster so
        adaptive-bucket flips recompile less and the XLA cache is shared at
        a finer grain.

        sat_zimg ([nty*SAT_BANDS, ntx] f32 band-row-major, or None): the
        previous frame's dilated saturation-SLOT record
        (RendererConfig.sat_cull) — a pair whose stream slot is >= its
        band's cut composites entirely behind a transmittance < MIN_T
        (ops/binning.py sat_simg)."""
        scene, cam, lod_enable, culling_dist, gs_enable = (
            self.unpack_frame_uniforms(uniforms)
        )
        # the projection math needs true f32: default bf16 MXU passes break
        # the 1e-3 parity budget
        with jax.default_matmul_precision("highest"):
            c = self.cfg
            image_wh = (c.width, c.height)
            tile_wh = (c.tile_w, c.tile_h)
            s_pad = stream["blocks"].shape[1] * STREAM_BLOCK
            if max_pairs is None:
                max_pairs = int(s_pad * c.pairs_factor)
            max_pairs = max((max_pairs // c.chunk) * c.chunk, c.chunk)

            keep = project.cull_draws(draw, cam, culling_dist, lod_enable)
            p = project.assemble_and_project(
                stream["blocks"], stream["merged"], panels,
                keep, store_packed, scene, cam, hm4, self.height_map_wh,
                surface_type=surface_type, draw_mode=draw_mode,
                image_wh=image_wh, point_cloud=point_cloud,
                gs_enable=gs_enable, interpret=c.interpret,
                exact=c.exact, hm_src=hm_src,
            )

            # background + depth FIRST: the proxy depth feeds binning's
            # occlusion cull (the reference's early-z equivalent —
            # renderer.rs:179-185 tests splats against the proxy's depth
            # pre-pass; here fully-occluded pairs leave the worklist)
            if use_skybox:
                bg = render_skybox(cam, image_wh, skybox_tex,
                                   equirect=self.skybox_equirect)
            else:
                bg = jnp.zeros((c.height, c.width, 4), jnp.float32)
            if use_proxy:
                popts = dict(proxy_opts)
                mip_meta = popts.pop("mip_meta")
                proxy_pairs = popts.pop("proxy_pairs")
                # the proxy raster bins triangles on its OWN tile grid
                # (it returns a full-image depth buffer, re-tiled below to
                # the splat grid) — fine splat tiles would otherwise
                # multiply the proxy worklist 4-8x for no benefit
                div = int(c.proxy_res_div)
                if div <= 0:  # auto: reference-exact res in exact profile
                    div = 1 if c.exact else 2
                p_wh = (-(-c.width // div), -(-c.height // div))
                pcol, depth, hit, paux = render_proxy(
                    cam, scene, p_wh, hm4, self.height_map_wh,
                    proxy_tex, self.proxy_wh, surface_type=surface_type,
                    mip_meta=mip_meta,
                    tile_wh=(c.proxy_tile_w, c.proxy_tile_h), chunk=128,
                    interpret=c.interpret, proxy_pairs=proxy_pairs, **popts,
                )
                if div > 1:
                    # depth/hit upsample NEAREST (bilinear would blend
                    # across silhouettes and fabricate halo depths);
                    # color bilinear for smooth shading
                    def up_near(x):
                        x = jnp.repeat(jnp.repeat(x, div, 0), div, 1)
                        return x[: c.height, : c.width]

                    depth = up_near(depth)
                    hit = up_near(hit)
                    pcol = jax.image.resize(
                        pcol, (p_wh[1] * div, p_wh[0] * div, pcol.shape[-1]),
                        method="linear",
                    )[: c.height, : c.width]
                bg = jnp.where(hit[..., None], pcol, bg)
            else:
                depth = jnp.ones((c.height, c.width), jnp.float32)
            depth_tiles = raster.image_to_depth_tiles(
                depth, image_wh=image_wh, tile_wh=tile_wh
            )

            occ_zimg = None
            if use_proxy and c.depth_cull:
                ntx_g = -(-c.width // c.tile_w)
                nty_g = -(-c.height // c.tile_h)
                occ_zimg = jnp.max(depth_tiles, axis=1).reshape(nty_g, ntx_g)
            binned = binning.bin_pairs(
                p, image_wh=image_wh, tile_wh=tile_wh, max_pairs=max_pairs,
                chunk=c.chunk, exact=c.exact, max_entries=max_entries,
                max_live=max_live, elem_paths=c.elem_paths,
                live_buckets=live_buckets, cull_exact=c.cull_exact,
                occ_zimg=occ_zimg, sat_simg=sat_zimg,
                emit_block_demand=emit_block_demand,
            )
            binned.pop("grid_info")
            aux = dict(n_pairs=binned["n_pairs"], n_extra=binned["n_extra"],
                       n_entries=binned["n_entries"],
                       n_live=binned["n_live"],
                       n_pairs_kept=binned["n_pairs_kept"],
                       n_live_paths=binned["n_live_paths"],
                       overflow=binned["overflow"])
            if emit_block_demand:
                aux["block_demand"] = binned.pop("block_demand")
            if use_proxy:
                aux["overflow"] = aux["overflow"] | paux["proxy_overflow"]
                aux["proxy_pairs"] = paux["proxy_pairs"]
            return binned, bg, depth_tiles, aux

    def _frame_back(self, binned, bg, depth_tiles, *, use_proxy,
                    emit_zcut=False):
        """Program B: Pallas rasterizer + composite over the background.
        With emit_zcut, also returns the next frame's dilated
        saturation-slot image [nty*SAT_BANDS, ntx] band-row-major (see
        RendererConfig.sat_cull)."""
        with jax.default_matmul_precision("highest"):
            c = self.cfg
            image_wh = (c.width, c.height)
            tile_wh = (c.tile_w, c.tile_h)
            tiles = raster.rasterize_pallas(
                binned, depth_tiles, image_wh=image_wh, tile_wh=tile_wh,
                chunk=c.chunk, interpret=c.interpret, exact=c.exact,
                use_depth=bool(use_proxy), emit_zcut=emit_zcut,
            )
            if emit_zcut:
                tiles, zcut = tiles
            img = raster.tiles_to_image(tiles, image_wh=image_wh, tile_wh=tile_wh)
            # premultiplied-over: final = gs + T * background
            t_final = 1.0 - img[..., 3:4]
            out = img + t_final * bg
            if not emit_zcut:
                return out
            ntx_g = -(-c.width // c.tile_w)
            nty_g = -(-c.height // c.tile_h)
            n_b = raster.SAT_BANDS
            # [T, B] -> band-major rows [nty*B, ntx]: row = tile_row*B +
            # band (matching ops/binning.py's global band-row indexing)
            zimg = zcut.reshape(nty_g, ntx_g, n_b).transpose(0, 2, 1)
            zimg = zimg.reshape(nty_g * n_b, ntx_g)

            def _shift_max(a, axis):
                lo = [(0, 0), (0, 0)]
                hi = [(0, 0), (0, 0)]
                lo[axis] = (1, 0)
                hi[axis] = (0, 1)
                sl_lo = [slice(None), slice(None)]
                sl_hi = [slice(None), slice(None)]
                sl_lo[axis] = slice(None, -1)
                sl_hi[axis] = slice(1, None)
                return jnp.maximum(
                    a,
                    jnp.maximum(
                        jnp.pad(a[tuple(sl_hi)], hi, constant_values=0.0),
                        jnp.pad(a[tuple(sl_lo)], lo, constant_values=0.0),
                    ),
                )

            # camera-motion margin: a deeper neighboring cut wins (keeps
            # more) within sat_dilate BAND rows vertically and sat_dilate
            # tile columns horizontally. Small on purpose: the max takes
            # SAT_NOCUT from any unsaturated neighbor, so a large radius
            # poisons whole saturated regions (measured: +-1 tile of
            # dilation collapsed the bench cull from ~17% of pairs to
            # ~1.4%); a stale cut mispredicts for at most one frame and
            # self-heals (see sat_cull).
            for _ in range(max(int(c.sat_dilate), 0)):
                zimg = _shift_max(zimg, 1)
                zimg = _shift_max(zimg, 0)
            return out, zimg



    def _get_jit(self, key):
        """Jitted FRONT program (projection + binning + background) for a
        static-bucket key; the BACK program (_get_jit_back) is keyed only
        by use_proxy and retraces on table shapes."""
        if key not in self._frame_jit:
            import sys
            import time as _time

            self.compile_events = getattr(self, "compile_events", [])
            self.compile_events.append((_time.time(), key[:4]))
            print(f"[gswt] compiling frame variant s_pad={key[0]} "
                  f"max_pairs={key[1]} max_entries={key[2]} "
                  f"max_live={key[3]} live_paths={key[10]}", file=sys.stderr)
            (s_pad, max_pairs, max_entries, max_live, surface_type,
             draw_mode, point_cloud, use_skybox, use_proxy, proxy_opts,
             live_buckets) = key[:11]
            fn = functools.partial(
                self._frame_front,
                surface_type=surface_type,
                draw_mode=draw_mode,
                point_cloud=point_cloud,
                use_skybox=use_skybox,
                use_proxy=use_proxy,
                proxy_opts=dict(proxy_opts),
                max_pairs=max_pairs,
                max_entries=max_entries,
                max_live=max_live,
                live_buckets=live_buckets,
            )
            self._frame_jit[key] = jax.jit(fn)
        return self._frame_jit[key]

    def _get_jit_back(self, use_proxy: bool, emit_zcut: bool = False):
        if not hasattr(self, "_back_jit"):
            self._back_jit = {}
        key = (use_proxy, emit_zcut)
        if key not in self._back_jit:
            self._back_jit[key] = jax.jit(
                functools.partial(self._frame_back, use_proxy=use_proxy,
                                  emit_zcut=emit_zcut)
            )
        return self._back_jit[key]

    def _get_jit_packed(self, key):
        """Jitted WHOLE-FRAME program (front + back fused) for a
        static-bucket key. One program launch per frame instead of two —
        XLA can overlap the raster with the tail of binning and the fixed
        per-launch cost is paid once (GSWT_PACKED_INTERACTIVE). Used only
        for steady-state sat-off frames; bucket flips still recompile at
        the same key grain as the split path."""
        cache = self.__dict__.setdefault("_packed_jit", {})
        if key not in cache:
            import sys

            print(f"[gswt] compiling packed frame variant s_pad={key[0]} "
                  f"max_pairs={key[1]}", file=sys.stderr)
            (s_pad, max_pairs, max_entries, max_live, surface_type,
             draw_mode, point_cloud, use_skybox, use_proxy, proxy_opts,
             live_buckets) = key[:11]
            fn = functools.partial(
                self._frame_packed,
                surface_type=surface_type,
                draw_mode=draw_mode,
                point_cloud=point_cloud,
                use_skybox=use_skybox,
                use_proxy=use_proxy,
                proxy_opts=dict(proxy_opts),
                max_pairs=max_pairs,
                max_entries=max_entries,
                max_live=max_live,
                live_buckets=live_buckets,
            )
            cache[key] = jax.jit(fn)
        return cache[key]

    def _sat_motion_exceeds(self, camera, prev_vp, vp_now) -> bool:
        """True when the camera moved/rotated enough since the previous
        sat-eligible frame that screen positions can shift past the
        saturation cut's dilation margin (sat_dilate tile columns
        horizontally, sat_dilate 8-px band rows vertically — the ONLY
        slack the cut-image dilation provides, _frame_back).

        Probe: a 3x3 NDC ray grid through the CURRENT camera sampled at
        three scene depths, projected with both view-proj matrices; max
        pixel delta vs the margin. Host-side NumPy, ~30 points/frame.
        Conservative failure modes count as exceeded (probe behind either
        camera, singular matrix)."""
        if np.array_equal(prev_vp, vp_now):
            return False
        c = self.cfg
        from ..ops.raster import SAT_BANDS

        dil = max(int(c.sat_dilate), 0)
        margin_x = dil * c.tile_w
        margin_y = dil * max(c.tile_h // SAT_BANDS, 1)
        try:
            inv = np.linalg.inv(vp_now.astype(np.float64))
        except np.linalg.LinAlgError:  # pragma: no cover - degenerate cam
            return True
        g = np.array([-0.85, 0.0, 0.85], np.float64)
        xs, ys = np.meshgrid(g, g)
        ndc = np.stack([xs.ravel(), ys.ravel()], axis=1)  # [9, 2]

        def unproj(zc):
            h = np.concatenate(
                [ndc, np.full((9, 1), zc), np.ones((9, 1))], axis=1)
            w = h @ inv.T
            return w[:, :3] / w[:, 3:4]

        # two GL-clip depths span the frustum; sample world points at
        # fixed distances along the rays so near content (which moves
        # fastest in screen space) is represented
        near = unproj(-0.8)
        far = unproj(0.8)
        d = far - near
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
        pos = np.asarray(camera.position, np.float64)
        pts = np.concatenate(
            [pos + d * s for s in (2.0, 10.0, 50.0)], axis=0)
        pts_h = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)

        def to_px(m):
            h = pts_h @ m.astype(np.float64).T
            w = h[:, 3]
            ok = w > 1e-6
            x = (h[:, 0] / np.where(ok, w, 1.0) * 0.5 + 0.5) * c.width
            y = (h[:, 1] / np.where(ok, w, 1.0) * 0.5 + 0.5) * c.height
            return x, y, ok

        x0, y0, ok0 = to_px(prev_vp)
        x1, y1, ok1 = to_px(vp_now)
        both = ok0 & ok1
        if not np.all(both):  # a probe crossed a camera plane: big motion
            return True
        return bool(
            np.max(np.abs(x1 - x0)) > margin_x
            or np.max(np.abs(y1 - y0)) > margin_y
        )

    def _proxy_bucket(self) -> int:
        """Adaptive proxy-triangle pair budget (same pattern as
        _pairs_bucket). Seeded from the OBSERVED pair count (most grid
        triangles are offscreen at any camera, so the triangle count
        overestimates ~3x); overflow retries/grows like the pair budget.
        The hint is a grow-only session floor."""
        hint = getattr(self, "_proxy_hint", None)
        if hint is None:
            n_tris = getattr(self, "proxy_tris", np.zeros((3, 1))).shape[1]
            want = int(n_tris * 0.6)
        else:
            want = int(hint * 2.0)
        return _next_pow2(max(want, 1 << 12), 1 << 12, 1 << 22)

    @staticmethod
    def _shard_hint(hint, shards: int):
        """Scale a full-domain session hint to a per-shard demand estimate
        for the stream-sharded path: each of `shards` contiguous stream
        segments bins ~1/shards of the demand; x2 absorbs imbalance (front
        segments are denser — near splats project larger)."""
        if hint is None or shards <= 1:
            return hint
        return -(-hint * 2 // shards)

    def _pairs_bucket(self, s_pad: int, dc: bool = False,
                      shards: int = 1) -> int:
        """Adaptive EXTRA-pair budget (path-2 pairs of ops/binning.py; the
        first tile of every splat is budgeted by the stream itself): bucket
        on the last observed extra-pair count with headroom (overflow grows
        it for subsequent frames)."""
        c = self.cfg
        hint = self._shard_hint(getattr(self, "_pairs_hint", None), shards)
        # the seed is a session FLOOR: an interactive camera can observe a
        # low-demand frame first and would otherwise shrink the bucket,
        # paying a recompile now and another when demand grows back
        want = int(s_pad * c.pairs_factor * (c.dc_seed_scale if dc else 1.0))
        if hint is not None:
            # 1.5x headroom over the session max: extra-pair counts swing
            # relatively harder than total pairs; a mid-benchmark bucket
            # flip costs a full frame recompile, which dwarfs the padding
            want = max(want, int(hint * 1.5))
        want = max(want, c.chunk)
        return _next_pow2(want, c.chunk, 1 << 24)

    def _live_bucket(self, s_pad: int, dc: bool = False,
                     shards: int = 1) -> int:
        """Adaptive live-splat compaction bucket (ops/binning.py): the
        padded stream is mostly culled splats at typical cameras, so every
        binning domain downstream of the compaction sort shrinks to this.
        Seeded from live_factor; grows on observed n_live (overflow retries
        like the pair budget). Capped at s_pad = compaction disabled."""
        c = self.cfg
        hint = self._shard_hint(getattr(self, "_live_hint", None), shards)
        # seed = session floor (see _pairs_bucket)
        want = int(s_pad * c.live_factor * (c.dc_seed_scale if dc else 1.0))
        if hint is not None:
            # live counts swing with the camera; 1.35x headroom over the
            # session max avoids mid-run bucket flips
            want = max(want, int(hint * 1.35))
        want = max(want, c.chunk)
        return min(_next_pow2(want, c.chunk, 1 << 24), s_pad)

    def _live_path_buckets(self, s_pad: int, max_live: int,
                           dc: bool = False, shards: int = 1) -> tuple:
        """Per-path prefix budgets (ops/binning.py live_buckets): path j
        of the count-classed compaction reads only the splats overlapping
        more than j tiles, bucketed on the observed n_live_paths[j] with
        headroom (grow-only session floor, see _pairs_bucket)."""
        c = self.cfg
        hints = getattr(self, "_livep_hint", None)
        out = []
        for j in range(1, c.elem_paths):
            if j - 1 < len(c.live_path_factors):
                f = c.live_path_factors[j - 1]
            else:
                f = c.live_factor * (0.5 ** j)
            want = int(s_pad * f * (c.dc_seed_scale if dc else 1.0))
            if hints is not None and j < len(hints):
                want = max(
                    want, int(self._shard_hint(hints[j], shards) * 1.35)
                )
            want = max(want, c.chunk)
            out.append(min(_next_pow2(want, c.chunk, 1 << 24), max_live))
        return tuple(out)

    def _ne_bucket(self, s_pad: int, max_pairs: int, max_live: int,
                   dc: bool = False, shards: int = 1) -> int:
        """Adaptive worklist-entry budget: every Pallas grid step costs
        ~1-2us even when dead, so the static entry count is bucketed near
        the observed per-frame entry count instead of the worst case
        ((domain)/chunk + n_tiles). Overflow (dropped far tiles) flags
        aux['overflow'] and grows the bucket like the pair budget."""
        c = self.cfg
        ntx = -(-c.width // c.tile_w)
        nty = -(-c.height // c.tile_h)
        n_tiles = ntx * nty
        cap = (2 * max_live + max_pairs) // c.chunk + n_tiles
        hint = getattr(self, "_ne_hint", None)
        if hint is not None and shards > 1:
            # entries = chunk entries (scale with demand) + one per tile
            # (don't): split before scaling
            hint = self._shard_hint(max(hint - n_tiles, 0), shards) + n_tiles
        # seed with the SAME formula the hint path uses, applied to an
        # estimated entry count (live pairs ~ 0.85 * s_pad at 1080p), so
        # the first frame usually lands on the converged bucket; the seed
        # is also a session FLOOR (see _pairs_bucket)
        est = int(s_pad * 0.85 * (c.dc_seed_scale if dc else 1.0)) \
            // c.chunk + n_tiles
        want = int(est * 1.3) + 256
        if hint is not None:
            want = max(want, int(hint * 1.3) + 256)
        want = min(max(want, n_tiles + 1024), cap)
        return min(_next_pow2(want, 1 << 10, 1 << 24), cap)

    def stage(self, dt: DrawTable, camera: Camera | None = None,
              culling_dist: float = 1.0):
        """Per-SORT staging: assemble + upload the stream and draw tables.
        The result is reused across frames until the next SortData. With a
        camera, host-culls draws (coarse, margined) before upload."""
        vp = camera.view_proj() if camera is not None else None
        return self.stage_vp(dt, vp, culling_dist)

    def stage_vp(self, dt: DrawTable, vp=None, culling_dist: float = 1.0):
        """stage() taking a raw view-projection matrix (builder-thread use).

        Uploads per sort: the [5, NB] block plan (~a few hundred KB), the
        [2, M] merged scratch indices, and the slim draw dict — an order of
        magnitude less h2d traffic than uploading the assembled stream."""
        c = self.cfg
        blk = STREAM_BLOCK
        with _hprof("stage.plan"):
            blocks_np, merged_np, total, n, truncated = self.plan_blocks_host(
                dt, vp, culling_dist
            )
        self.last_stream_truncated = truncated
        if truncated:
            self.stream_truncated_events = (
                getattr(self, "stream_truncated_events", 0) + 1
            )
            import sys

            print(
                f"[gswt] warning: stream budget exceeded, dropped {truncated} "
                f"far splats (max_stream={c.max_stream})",
                file=sys.stderr,
            )
        d_pad = _next_pow2(max(n, 1), 256, c.max_draws)
        d_pad = max(d_pad, getattr(self, "_dpad_floor", 0))
        self._dpad_floor = d_pad
        with _hprof("stage.prep"):
            draw_np = self.prepare_draws(dt, n, total, d_pad)
        # grow-only bucketing: every new bucket is a fresh XLA compile of
        # the whole frame program, so never shrink within a session
        nb_pad = _next_pow2(
            max(blocks_np.shape[1], 1), c.min_stream // blk, c.max_stream // blk
        )
        nb_pad = max(nb_pad, getattr(self, "_nb_floor", 0))
        self._nb_floor = nb_pad
        blocks = np.zeros((5, nb_pad), np.int32)
        blocks[:, : blocks_np.shape[1]] = blocks_np
        m_pad = _next_pow2(merged_np.shape[1], 1 << 12, c.max_stream)
        m_pad = max(m_pad, getattr(self, "_mpad_floor", 0))
        self._mpad_floor = m_pad
        merged = np.zeros((2, m_pad), np.int32)
        k = min(merged_np.shape[1], m_pad)
        merged[:, :k] = merged_np[:, :k]
        # ONE h2d upload per sort: each transfer costs ~45 ms latency on
        # the tunneled dev harness (and a sync RPC on any host), so the
        # block plan, merged scratch, and draw arrays ride a single packed
        # i32 buffer; the pieces are carved out as device-side slices
        # (async dispatches, no host round trip)
        d = d_pad
        segs = [
            blocks.reshape(-1),
            merged.reshape(-1),
            draw_np["single_draw"],
            draw_np["tile_lod"],
            draw_np["has_corners"],
            draw_np["corner_pos"].reshape(-1).view(np.int32),
            np.array(
                [int(draw_np["n_draws"]), int(draw_np["total_splats"])]
                + [0] * 6,
                np.int32,
            ),
        ]
        with _hprof("stage.pack"):
            buf = np.concatenate(segs)
        with _hprof("stage.h2d"):
            dev = jnp.asarray(buf)
        offs = tuple(int(x) for x in np.cumsum([0] + [x.size for x in segs]))

        # ONE jitted carve instead of ~7 eager slice/reshape/bitcast ops:
        # each eager op costs a ~0.5 s compile on the tunneled dev
        # harness the first time its shape appears (jax never persists
        # sub-second compiles), so batching them into one program cuts
        # several seconds of per-session setup
        ckey = (offs, nb_pad, m_pad, d)
        carves = self.__dict__.setdefault("_carve_jit", {})
        if ckey not in carves:
            def _carve(dev, offs=offs, nb_pad=nb_pad, m_pad=m_pad, d=d):
                def take(i):
                    return jax.lax.slice(dev, (offs[i],), (offs[i + 1],))

                tail = take(6)
                return (
                    take(0).reshape(5, nb_pad),
                    take(1).reshape(2, m_pad),
                    tail[0], tail[1], take(2), take(3), take(4),
                    jax.lax.bitcast_convert_type(
                        take(5), jnp.float32).reshape(d, 4, 3),
                )

            carves[ckey] = jax.jit(_carve)
        with _hprof("stage.carve"):
            (blocks_d, merged_d, n_draws, total_splats, single_draw, tile_lod,
             has_corners, corner_pos) = carves[ckey](dev)
        stream = dict(blocks=blocks_d, merged=merged_d)
        draw = dict(
            n_draws=n_draws,
            total_splats=total_splats,
            single_draw=single_draw,
            tile_lod=tile_lod,
            has_corners=has_corners,
            corner_pos=corner_pos,
        )
        # blocks_host: the host copy of the block plan, kept for the
        # stream-parallel path's demand-weighted segment boundaries
        # (parallel/batched.py render_stream_sharded) — row 3 (nvalid,
        # live lanes per block) is the per-block demand proxy. A few
        # hundred KB, replaced per sort.
        return dict(stream=stream, draw=draw, s_pad=nb_pad * blk,
                    blocks_host=blocks)

    def render(self, dt: DrawTable, camera: Camera, scene: SceneParams,
               render_config: RenderConfig | None = None, *,
               render_gs: bool = True, use_skybox: bool = False,
               use_proxy: bool = False, as_numpy: bool = True,
               staged=None, pipeline_depth: int = 0):
        """Render one frame; returns [H, W, 4] float32.

        pipeline_depth > 0 keeps up to that many frames in flight and only
        blocks on the OLDEST one (per-frame aux lands one frame late, and a
        pair-budget overflow grows the budget for subsequent frames instead
        of retrying this one — `overflow_frames` counts those). Hides the
        host dispatch + sync round trips behind device work; the interactive
        engine and the benchmark use depth 2."""
        rc = render_config or RenderConfig.new(self.engine.n_tiles[0])
        if staged is None:
            staged = self.stage(dt, camera, rc.culling_dist)
        stream = staged["stream"]
        draw = staged["draw"]
        lod_enable = list(rc.lod_enable or [True] * 16)
        sky = self.skybox_tex if self.skybox_tex is not None else jnp.zeros((1, 1, 3))
        prox = dict(
            atlas=(
                self.proxy_tex
                if self.proxy_tex is not None
                else jnp.zeros((12, 1), jnp.float32)
            ),
            verts=getattr(self, "proxy_verts", jnp.zeros((2, 4), jnp.float32)),
            tris=getattr(self, "proxy_tris", jnp.zeros((3, 2), jnp.int32)),
        )
        # the fast profile samples mips via the gather-free pyramid kernel
        if not self.cfg.exact and getattr(self, "proxy_pyr", None) is not None:
            prox["pyr"] = self.proxy_pyr
        self.last_overflow_retries = 0
        # temporal saturation cull (RendererConfig.sat_cull): fast-profile
        # color frames only — debug draw modes and point clouds change
        # what "contributes" means, and the exact profile is the parity
        # reference
        from ..ops.raster import SAT_BANDS, SAT_NOCUT

        sat = bool(
            self.cfg.sat_cull and not self.cfg.exact and render_gs
            and not rc.draw_point_cloud and int(rc.draw_mode) == 0
            # the banded record + binning's band lookup assume uniform
            # band rows across the image (tile_h % SAT_BANDS == 0); odd
            # tile heights silently disable the cull instead of shipping
            # an unsound band mapping (ADVICE r4)
            and self.cfg.tile_h % SAT_BANDS == 0
        )
        if sat:
            # motion gate (ADVICE r4): the recorded cut is only sound
            # within the dilation margin (sat_dilate band rows / tile
            # columns of screen motion). Beyond it a stale cut would
            # mispredict EVERY frame under sustained motion (flicker,
            # not the documented one-frame transient) — so a moving
            # frame drops the cut AND runs the plain non-sat variants
            # (no slot row through the sort, no band lookups, no zcut
            # emission: zero cull overhead while the camera moves); the
            # first static-enough frame re-certifies from its own run.
            vp_now = np.asarray(camera.view_proj(), np.float32).reshape(4, 4)
            prev_vp = getattr(self, "_sat_vp", None)
            moved = prev_vp is not None and self._sat_motion_exceeds(
                camera, prev_vp, vp_now
            )
            self._sat_vp = vp_now
            if moved:
                sat = False
                self._sat_zimg = None
        if sat:
            ntx_g = -(-self.cfg.width // self.cfg.tile_w)
            nty_g = -(-self.cfg.height // self.cfg.tile_h)
            shp = (nty_g * SAT_BANDS, ntx_g)
            sat_zin = getattr(self, "_sat_zimg", None)
            if sat_zin is None or sat_zin.shape != shp:
                sat_zin = jnp.full(shp, SAT_NOCUT, jnp.float32)
        else:
            sat_zin = None
        for _attempt in range(3):
            # proxy_opts rebuilt per attempt: a proxy-pair overflow grows
            # _proxy_hint, so the retry needs the re-evaluated bucket
            proxy_opts = (
                ("height_offset", float(rc.proxy_height)),
                ("brightness", float(rc.proxy_brightness)),
                ("black_background", bool(rc.proxy_black_background)),
                ("use_clip", bool(rc.use_clip)),
                ("clip_height", float(rc.clip_height)),
                ("mip_meta", getattr(self, "proxy_mip_meta", ((1, 1, 0),))),
                ("mip_pyr",
                 getattr(self, "proxy_pyr_meta", None)
                 if not self.cfg.exact else None),
                ("proxy_pairs", self._proxy_bucket() if use_proxy else 1 << 12),
            )
            dc = bool(
                use_proxy and self.proxy_tex is not None and self.cfg.depth_cull
            )
            # Scaled-down bucket seeds are only safe when the SATURATION
            # cull is active (a recorded cut exists — frame 2 of a session
            # on): the proxy-depth cull alone is scene-dependent (at the
            # reference default proxy_height=-0.5 it removes ~nothing) and
            # seeding 0.12x on it would overflow frame 1 and bake the full
            # pre-cull demand into the grow-only hints. Until the cut
            # exists the seeds stay full-size and the first frame's demand
            # is kept OUT of the hints (hint_poison below) so the
            # converged buckets reflect culled demand.
            sat_active = sat and getattr(self, "_sat_zimg", None) is not None
            dc = sat_active if sat else dc
            mp = self._pairs_bucket(staged["s_pad"], dc)
            ml = self._live_bucket(staged["s_pad"], dc)
            key = (
                staged["s_pad"],
                mp,
                self._ne_bucket(staged["s_pad"], mp, ml, dc),
                ml,
                int(scene.surface_type),
                int(rc.draw_mode),
                bool(rc.draw_point_cloud),
                bool(use_skybox and self.skybox_tex is not None),
                bool(use_proxy and self.proxy_tex is not None),
                proxy_opts,
                self._live_path_buckets(staged["s_pad"], ml, dc),
                sat,
            )
            fn = self._get_jit(key)
            fn_back = self._get_jit_back(bool(key[8]), sat)
            with _hprof("render.uniforms"):
                uniforms = jnp.asarray(
                    self.pack_frame_uniforms(
                        scene, CameraUniforms(camera), lod_enable,
                        rc.culling_dist, render_gs=render_gs,
                    )
                )
            fn_args = (
                self.store_packed, self.panels, stream, draw, uniforms,
                self.hm4, sky, prox, getattr(self, "hm_src", None),
                sat_zin,
            )
            if not sat and _packed_interactive():
                # one program launch per frame: front + back fused, so the
                # fixed per-launch cost is paid once and XLA overlaps the
                # raster with binning's tail (A/B: benchmarks/
                # profile_hostloop.py --packed)
                fnp = self._get_jit_packed(key)
                with _hprof("render.dispatch_packed"):
                    img, aux = fnp(*fn_args[:9])
            else:
                # overlap the BACK program's compile/load with the FRONT's:
                # the dev tunnel charges ~5-45 s per program load (measured
                # 2026-08-20: front 46 s, back 5.5 s, cache hit or miss
                # alike — the axon server's load dominates, not XLA), and
                # the loads run concurrently, so threading the back compile
                # behind the front's first call saves its whole cost at
                # session start
                back_th = None
                warmed = self.__dict__.setdefault("_prewarmed", set())
                if key not in warmed:
                    warmed.add(key)
                    try:
                        import threading

                        specs = jax.eval_shape(fn, *fn_args)

                        def _warm_back(s=specs):
                            try:
                                fn_back.lower(s[0], s[1], s[2]).compile()
                            except Exception:  # pragma: no cover - advisory
                                pass

                        back_th = threading.Thread(target=_warm_back,
                                                   daemon=True)
                        back_th.start()
                    except Exception:  # pragma: no cover - advisory
                        back_th = None
                with _hprof("render.dispatch_front"):
                    binned, bg, depth_tiles, aux = fn(*fn_args)
                if back_th is not None:
                    back_th.join()
                if sat and not sat_active:
                    # pre-cut demand: keep it out of the grow-only hints or
                    # every later frame pays pre-cull sort domains
                    aux = dict(aux, hint_poison=True)
                with _hprof("render.dispatch_back"):
                    img = fn_back(binned, bg, depth_tiles)
                if sat:
                    img, self._sat_zimg = img
            if pipeline_depth > 0 and not as_numpy:
                # schedule the aux scalars' d2h copy now (async, returns
                # immediately): by the time this frame is drained the data
                # has landed and the per-frame aux read doesn't block
                with _hprof("render.aux_async"):
                    try:
                        for leaf in jax.tree_util.tree_leaves(aux):
                            if hasattr(leaf, "copy_to_host_async"):
                                leaf.copy_to_host_async()
                    except Exception:  # pragma: no cover - backend-dependent
                        pass
                self._inflight = getattr(self, "_inflight", None) or []
                self._inflight.append((aux, img, int(key[1])))
                with _hprof("render.drain"):
                    while len(self._inflight) > pipeline_depth:
                        self._drain_one()
                return img
            # one combined d2h: aux + a pixel probe (completion barrier for
            # the whole frame; aux alone is computed before the rasterizer)
            fetched = jax.device_get((aux, img[0, 0, 0]))
            self.last_aux = fetched[0]
            self._absorb_aux()
            if not bool(self.last_aux["overflow"]):
                break
            # overflow: n_extra is the TRUE demand (binning counts before
            # clamping), and the hint already absorbed it above — re-render
            # with the right-sized budget for a complete frame
            self.last_overflow_retries += 1
        return np.asarray(jax.device_get(img)) if as_numpy else img

    # pipelined blocking round trips (combined aux + pixel-probe d2h) per
    # N drained frames; 1 restores the per-frame fetch for A/Bs
    AUX_FETCH_EVERY = int(os.environ.get("GSWT_AUX_FETCH_EVERY", "4") or 4)

    def _absorb_aux(self):
        """Fold a fetched aux dict into the grow-only bucket hints
        (shrinking would flip buckets and recompile)."""
        a = self.last_aux
        if a.get("hint_poison") and not bool(a["overflow"]):
            # pre-sat-cut demand (frame 1 of a session): keeping it out of
            # the grow-only hints is what lets the sort domains shrink to
            # the culled steady state. An overflowed frame absorbs anyway —
            # the retry/regrow machinery needs the true demand.
            return
        self._pairs_hint = max(
            int(a["n_extra"]), getattr(self, "_pairs_hint", 1) or 1
        )
        self._ne_hint = max(
            int(a["n_entries"]), getattr(self, "_ne_hint", 1) or 1
        )
        self._live_hint = max(
            int(a["n_live"]), getattr(self, "_live_hint", 1) or 1
        )
        if "n_live_paths" in a:
            lp = [int(x) for x in np.asarray(a["n_live_paths"])]
            prev = getattr(self, "_livep_hint", None)
            if prev is not None and len(prev) == len(lp):
                lp = [max(x, y) for x, y in zip(lp, prev)]
            self._livep_hint = lp
        if "proxy_pairs" in a:
            self._proxy_hint = max(
                int(a["proxy_pairs"]), getattr(self, "_proxy_hint", 1) or 1
            )

    def bucket_hints(self) -> dict:
        """Session maxima of the adaptive-bucket demands, JSON-serializable.
        Persist across sessions and feed back via set_bucket_hints so the
        first frame of a future run lands on the converged buckets (one
        XLA compile per program instead of a grow-ladder of variants —
        tunnel compiles are 40-200s each on the dev harness)."""
        # absorb any drained-but-unfetched aux (the pipelined drain batches
        # its blocking d2h reads) so the export reflects every drained frame
        pend = getattr(self, "_aux_pending", None)
        if pend:
            self._aux_pending = []
            for a in jax.device_get(pend):
                self.last_aux = a
                self._absorb_aux()
        return dict(
            n_extra=int(getattr(self, "_pairs_hint", 0) or 0),
            n_live=int(getattr(self, "_live_hint", 0) or 0),
            n_entries=int(getattr(self, "_ne_hint", 0) or 0),
            n_live_paths=[
                int(x) for x in getattr(self, "_livep_hint", None) or []
            ],
            proxy_pairs=int(getattr(self, "_proxy_hint", 0) or 0),
        )

    def set_bucket_hints(self, hints: dict) -> None:
        """Seed the grow-only hints from a previous session's
        bucket_hints(). Merges as floors (max with any current hint);
        zero/absent entries are ignored so a partial dict is safe."""
        def _floor(attr, v):
            if v and int(v) > 0:
                setattr(self, attr, max(
                    int(v), getattr(self, attr, 0) or 0))

        _floor("_pairs_hint", hints.get("n_extra"))
        _floor("_live_hint", hints.get("n_live"))
        _floor("_ne_hint", hints.get("n_entries"))
        _floor("_proxy_hint", hints.get("proxy_pairs"))
        lp = [int(x) for x in hints.get("n_live_paths") or []]
        if lp:
            prev = getattr(self, "_livep_hint", None)
            if prev is not None and len(prev) == len(lp):
                lp = [max(x, y) for x, y in zip(lp, prev)]
            self._livep_hint = lp

    def _drain_one(self, fetch: bool | None = None):
        """Pop the oldest in-flight frame. Every frame's AUX scalars are
        read and absorbed (overflow counting + grow-only hints), but the
        blocking device_get runs only every AUX_FETCH_EVERY pops — one
        combined fetch of all pending aux dicts PLUS the image pixel probe
        (the completion barrier proving the popped frame executed). drain()
        forces a final flush, so nothing is lost at loop end."""
        aux, img, bucket = self._inflight.pop(0)
        self._drain_count = getattr(self, "_drain_count", 0) + 1
        if fetch is None:
            fetch = self._drain_count % self.AUX_FETCH_EVERY == 0
        # batch the aux reads: ONE device_get per AUX_FETCH_EVERY pops
        # (combined with the pixel probe) instead of one per frame. A
        # blocking d2h costs a full ~40 ms tunnel round trip whenever the
        # copy_to_host_async pre-land is not honored by the backend, so
        # per-frame aux fetches can silently serialize the pipelined loop.
        # Every frame's aux is still read and absorbed — just up to
        # AUX_FETCH_EVERY frames late, which only delays bucket-hint
        # growth/overflow accounting (pipelined frames never retry anyway).
        pend = self.__dict__.setdefault("_aux_pending", [])
        pend.append(aux)
        if not fetch:
            return
        with _hprof("drain.fetch"):
            fetched = jax.device_get((pend, img[0, 0, 0]))
        self._aux_pending = []
        for a in fetched[0]:
            self.last_aux = a
            self._absorb_aux()
            if bool(a["overflow"]):
                # too late to retry (those frames already rendered
                # truncated); the hint absorbed the true demand above, so
                # subsequent frames get a right-sized budget
                self.overflow_frames = getattr(
                    self, "overflow_frames", 0) + 1

    def drain(self):
        """Block until all in-flight pipelined frames are device-complete."""
        while getattr(self, "_inflight", None):
            self._drain_one(fetch=len(self._inflight) == 1)
