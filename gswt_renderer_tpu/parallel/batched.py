"""Multi-chip rendering over a jax.sharding.Mesh.

The reference has no multi-device story (SURVEY §2: its parallelism is a
host worker thread + the GPU itself); this module is the new TPU-native
scaling design (BASELINE config 5):

- **Camera parallel (dp)**: a batch of cameras sharded across devices; each
  device renders its cameras with the full resident scene (dataset
  generation: 64 cameras over a v5e-8 mesh). No collectives on the hot path.

- **Stream parallel (sp)**: ONE camera whose front-to-back splat stream is
  sharded across devices. Ordered alpha compositing factors through the
  associative operator
      (c1, T1) o (c2, T2) = (c1 + T1*c2, T1*T2)
  so each device composites its contiguous stream segment locally and the
  per-device (premultiplied color, transmittance) images fold across the
  mesh axis in stream order — the sequence-parallel analog for splatting,
  with one all_gather of images as the only collective.

Both modes compose on a 2D ('dp', 'sp') mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("dp", "sp"), devices=None):
    """Create a Mesh over the available devices; shape defaults to
    (n_devices, 1)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    dev = np.array(devices).reshape(shape)
    return Mesh(dev, axis_names)


def _hm_src(renderer):
    """Replicated small-source height map (ops/project fast path); a (1,1)
    zero disables it (e.g. exact profile or big texture maps)."""
    hm = getattr(renderer, "hm_src", None)
    return hm if hm is not None else jnp.zeros((1, 1), jnp.float32)


def composite_over(front, back):
    """Premultiplied front-over-back for (rgb, alpha) images [..., 4]:
    out = front + (1 - front_alpha) * back."""
    t = 1.0 - front[..., 3:4]
    return front + t * back


def _bg_inputs(renderer, rc, use_skybox: bool, use_proxy: bool):
    """Background-pass inputs mirroring Renderer.render(): the resolved
    (use_skybox, use_proxy) flags, replicated textures, and the static
    proxy_opts tuple (part of the jit cache key)."""
    import jax.numpy as jnp

    use_skybox = bool(use_skybox and renderer.skybox_tex is not None)
    use_proxy = bool(use_proxy and renderer.proxy_tex is not None)
    sky = renderer.skybox_tex if use_skybox else jnp.zeros((1, 1, 3))
    prox = dict(
        atlas=(renderer.proxy_tex if use_proxy
               else jnp.zeros((12, 1), jnp.float32)),
        verts=getattr(renderer, "proxy_verts", jnp.zeros((2, 4), jnp.float32)),
        tris=getattr(renderer, "proxy_tris", jnp.zeros((3, 2), jnp.int32)),
    )
    # the fast profile samples proxy mips via the gather-free pyramid
    # kernel — same inputs the interactive render() passes
    if (use_proxy and not renderer.cfg.exact
            and getattr(renderer, "proxy_pyr", None) is not None):
        prox["pyr"] = renderer.proxy_pyr
    proxy_opts = (
        ("height_offset", float(rc.proxy_height)),
        ("brightness", float(rc.proxy_brightness)),
        ("black_background", bool(rc.proxy_black_background)),
        ("use_clip", bool(rc.use_clip)),
        ("clip_height", float(rc.clip_height)),
        ("mip_meta", getattr(renderer, "proxy_mip_meta", ((1, 1, 0),))),
        ("mip_pyr",
         getattr(renderer, "proxy_pyr_meta", None)
         if (use_proxy and not renderer.cfg.exact) else None),
        ("proxy_pairs",
         renderer._proxy_bucket() if use_proxy else 1 << 12),
    )
    return use_skybox, use_proxy, sky, prox, proxy_opts


def _bucket_kwargs(renderer, s_pad, use_proxy, shards: int = 1):
    """Converged adaptive buckets for the sharded frame programs — the
    SAME _pairs_bucket family (session hints included) the interactive
    render() uses. Without these the sharded programs ran at worst-case
    domains (max_live=None = live compaction disabled entirely), which
    measured ~1.6x an interactive frame per camera even for IDENTICAL
    cameras (PERFORMANCE.md 4b). shards>1 scales the hints for the
    stream-sharded path (each shard bins ~1/shards of the demand).

    The sharded frame programs never thread the SATURATION cull (no
    sat_zimg input), so (a) dc=False always — the interactive path's
    0.12x dc_seed_scale is only sound when a sat cut exists (ADVICE r4),
    and (b) session hints that converged during a sat-culled interactive
    session undersize the uncalled sharded demand (~8x per the repo's
    measurements) and are skipped — seeds size the buckets instead; an
    overflow still falls back to worst-case domains."""
    sat_tainted = bool(
        renderer.cfg.sat_cull and not renderer.cfg.exact
        and getattr(renderer, "_sat_zimg", None) is not None
    )
    saved = {}
    if sat_tainted:
        for h in ("_pairs_hint", "_ne_hint", "_live_hint", "_livep_hint"):
            if hasattr(renderer, h):
                saved[h] = getattr(renderer, h)
                delattr(renderer, h)
    try:
        mp = renderer._pairs_bucket(s_pad, False, shards)
        ml = renderer._live_bucket(s_pad, False, shards)
        return dict(
            max_pairs=mp,
            max_live=ml,
            live_buckets=renderer._live_path_buckets(s_pad, ml, False, shards),
            max_entries=renderer._ne_bucket(s_pad, mp, ml, False, shards),
        )
    finally:
        for h, v in saved.items():
            setattr(renderer, h, v)


def pack_camera_batch(renderer, scene_params, cameras, render_config=None):
    """Stack per-camera packed uniform vectors [B, UNIFORMS_LEN]."""
    from ..core.camera import CameraUniforms
    from ..core.config import RenderConfig

    rc = render_config or RenderConfig.new(renderer.engine.n_tiles[0])
    lod_enable = list(rc.lod_enable or [True] * 16)
    vecs = [
        renderer.pack_frame_uniforms(
            scene_params, CameraUniforms(c), lod_enable, rc.culling_dist
        )
        for c in cameras
    ]
    return jnp.asarray(np.stack(vecs))


def render_cameras_sharded(renderer, staged, scene_params, cam_batch, mesh,
                           render_config=None, *, use_skybox=False,
                           use_proxy=False):
    """Render a batch of cameras, sharded over the mesh 'dp' axis.

    cam_batch: [B, UNIFORMS_LEN] packed uniforms (pack_camera_batch). B must
    divide by mesh dp size. Returns images [B, H, W, 4] sharded over dp.
    use_skybox/use_proxy render the full paper frame per camera
    (state.rs:384-401) with the renderer's uploaded textures.
    """
    from ..core.config import RenderConfig

    rc = render_config or RenderConfig.new(renderer.engine.n_tiles[0])
    stream = staged["stream"]
    draw = staged["draw"]
    use_skybox, use_proxy, sky, prox, proxy_opts = _bg_inputs(
        renderer, rc, use_skybox, use_proxy
    )

    def launch(buckets):
        frame = functools.partial(
            renderer._frame_packed,
            surface_type=int(scene_params.surface_type),
            draw_mode=int(rc.draw_mode),
            point_cloud=bool(rc.draw_point_cloud),
            use_skybox=use_skybox,
            use_proxy=use_proxy,
            proxy_opts=dict(proxy_opts),
            **buckets,
        )

        # small per-device batches UNROLL the camera loop: lax.scan's
        # sequential carry prevents XLA from overlapping any work across
        # iterations (the interactive path gets that overlap from frame
        # pipelining); unrolling restores it at the cost of a program
        # ~B_local x the frame size, so it's bounded by GSWT_DP_UNROLL
        # (per-device cameras; 0 disables)
        import os as _os

        unroll_max = int(_os.environ.get("GSWT_DP_UNROLL", "4"))

        def per_device(cams_local, store, panels, stream, draw, hm4, hm_src,
                       sky, prox):
            b_local = cams_local.shape[0]
            if 0 < b_local <= unroll_max:
                ovf = jnp.bool_(False)
                imgs = []
                for k in range(b_local):
                    img, aux = frame(store, panels, stream, draw,
                                     cams_local[k], hm4, sky, prox,
                                     hm_src=hm_src)
                    ovf = ovf | aux["overflow"]
                    imgs.append(img)
                return jnp.stack(imgs), ovf[None]

            def body(carry, cam):
                img, aux = frame(store, panels, stream, draw, cam, hm4, sky,
                                 prox, hm_src=hm_src)
                return carry | aux["overflow"], img

            ovf, imgs = jax.lax.scan(body, jnp.bool_(False), cams_local)
            return imgs, ovf[None]

        # cache the traced+compiled sharded program: rebuilding shard_map
        # per call re-traces the whole frame (~8s of host time at 1080p)
        key = ("dp", tuple(mesh.shape.items()), cam_batch.shape,
               staged["s_pad"], int(rc.draw_mode),
               int(scene_params.surface_type), bool(rc.draw_point_cloud),
               use_skybox, use_proxy, proxy_opts,
               tuple(sorted(buckets.items())), unroll_max)
        cache = renderer.__dict__.setdefault("_sharded_jit", {})
        if key not in cache:
            cache[key] = jax.jit(jax.shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P("dp"), P(), P(), P(), P(), P(), P(), P(), P()),
                out_specs=(P("dp"), P("dp")),
                check_vma=False,
            ))
        return cache[key](
            cam_batch, renderer.store_packed, renderer.panels, stream, draw,
            renderer.hm4, _hm_src(renderer), sky, prox,
        )

    # converged interactive buckets first; batch cameras can exceed the
    # single-camera session maxima, so an overflow falls back to the
    # worst-case domains (the pre-bucket behavior — always complete)
    imgs, ovf = launch(_bucket_kwargs(renderer, staged["s_pad"], use_proxy))
    renderer.last_batch_overflow = ovf
    if bool(np.any(jax.device_get(ovf))):
        imgs, ovf = launch(dict(
            max_pairs=None, max_live=None, live_buckets=None,
            max_entries=None,
        ))
        renderer.last_batch_overflow = ovf
    return imgs


def render_stream_sharded(renderer, staged, scene_params, camera, mesh,
                          render_config=None, *, use_skybox=False,
                          use_proxy=False):
    """Render ONE camera with the splat stream sharded over the 'sp' axis.

    Each device projects/bins/composites its contiguous front-to-back stream
    segment; the segment images fold with the associative over-operator in
    stream order (front segment = shard 0). With skybox/proxy on, every
    shard computes the SAME background + proxy depth (per-pixel work,
    independent of the stream; the depth test needs it on every shard —
    proxy.rs:119-125 semantics), shards composite their splat segments over
    a ZERO background, and the folded result lands on the background once:
      final = fold(gs_0 ... gs_{n-1}) + T_total * bg
    which is algebraically the single-device  gs + T * bg. Returns the
    final [H, W, 4] image (replicated)."""
    from ..core.camera import CameraUniforms
    from ..core.config import RenderConfig

    rc = render_config or RenderConfig.new(renderer.engine.n_tiles[0])
    uniforms = jnp.asarray(
        renderer.pack_frame_uniforms(
            scene_params, CameraUniforms(camera),
            list(rc.lod_enable or [True] * 16), rc.culling_dist,
        )
    )
    stream = staged["stream"]
    draw = staged["draw"]
    n_sp = mesh.shape["sp"]
    nb = stream["blocks"].shape[1]

    use_skybox, use_proxy, sky, prox, proxy_opts = _bg_inputs(
        renderer, rc, use_skybox, use_proxy
    )
    # per-shard stream domain: demand-WEIGHTED contiguous block segments
    # (VERDICT r4 #7 — equal block counts split pairs 2.5x unevenly: front
    # segments are denser, near splats project larger). Boundaries are
    # chosen on the host at equal quantiles of the per-block live-lane
    # count (blocks_host row 3), each segment padded to a shared grow-only
    # max_seg window so shard_map shapes stay static; padding blocks have
    # the live bit clear (dead lanes). Order is preserved — segment i is a
    # contiguous front-to-back range — so the over-operator fold across
    # 'sp' is unchanged. Buckets scale the session hints to ~1/n_sp demand
    # (x2 imbalance headroom, _bucket_kwargs) so each device's
    # binning/raster domains shrink with its pair share — the precondition
    # for the ~n_sp raster/binning speedup this mode claims (PERFORMANCE.md
    # roadmap #4).
    from ..render.pipeline import STREAM_BLOCK, _next_pow2

    bh = staged.get("blocks_host")
    winmap = None
    if n_sp > 1 and bh is not None:
        # LANE-granular demand-balanced boundaries: live lanes can't see
        # PAIR density (near splats overlap more tiles each) and pair
        # mass can concentrate in a handful of blocks, so the sharded
        # front program exports the EXACT per-window-block pair demand
        # (ops/binning.py emit_block_demand) and the previous call's
        # observation weights this call's cut — the same temporal-
        # adaptation pattern as the bucket hints, converging over a few
        # calls even when a single 256-lane block must be SPLIT across
        # shards (block-plan row 5 = first live lane, ops/project.py).
        # First call (no observation yet) weights by live lane counts.
        n_lanes = nb * STREAM_BLOCK
        blk = STREAM_BLOCK
        fb = renderer.__dict__.get("_sp_feedback")
        segs = None
        if (fb and fb.get("n_sp") == n_sp
                and fb.get("n_lanes") == n_lanes
                and fb.get("segs") is not None):
            segs = fb["segs"]
        if segs is None:
            g0 = np.arange(nb, dtype=np.int64) * blk
            segs = (g0, g0 + blk,
                    np.maximum(bh[3].astype(np.float64), 0.0))
        s0, s1, dm = segs
        ln = np.maximum(s1 - s0, 1).astype(np.float64)
        w = np.maximum(dm, 0.0) + 1e-9 * ln  # eps: dead spans stay cuttable
        cum = np.concatenate([[0.0], np.cumsum(w)])
        tot = float(cum[-1])
        lane_bounds = [0]
        for i in range(1, n_sp):
            t = tot * i / n_sp
            j = int(np.searchsorted(cum, t, side="right")) - 1
            j = min(max(j, 0), len(s0) - 1)
            frac = (t - cum[j]) / max(float(w[j]), 1e-12)
            lane = int(round(s0[j] + frac * (s1[j] - s0[j])))
            lane_bounds.append(min(max(lane, lane_bounds[-1]), n_lanes))
        lane_bounds.append(n_lanes)
        # window entries per shard: whole blocks, with the boundary
        # blocks' live range narrowed via (lane_lo, nvalid)
        win_entries = []
        max_len = 1
        for i in range(n_sp):
            l0, l1 = lane_bounds[i], lane_bounds[i + 1]
            ents = []
            for b in range(l0 // blk, -(-l1 // blk)):
                lo = max(0, l0 - b * blk)
                hi = min(blk, l1 - b * blk)
                nv_w = min(int(bh[3][b]), hi)
                if nv_w > lo:
                    ents.append((b, lo, nv_w))
            win_entries.append(ents)
            max_len = max(max_len, len(ents))
        max_seg = _next_pow2(max_len, 16, nb + n_sp)
        # grow-only per-n_sp floor: a new max_seg is a fresh frame-program
        # compile, so never shrink within a session
        floors = renderer.__dict__.setdefault("_spseg_floor", {})
        max_seg = max(max_seg, floors.get(n_sp, 0))
        floors[n_sp] = max_seg
        stacked = np.zeros((6, n_sp, max_seg), np.int32)
        winmap = []
        for i, ents in enumerate(win_entries):
            rows = []
            for j, (b, lo, nv_w) in enumerate(ents):
                stacked[0:5, i, j] = bh[:, b]
                stacked[3, i, j] = nv_w
                stacked[5, i, j] = lo
                rows.append((b * blk + lo, b * blk + nv_w))
            winmap.append(rows)
        blocks_in = jnp.asarray(stacked)
        renderer.last_sp_bounds = lane_bounds
    else:
        assert nb % n_sp == 0, (nb, n_sp)
        max_seg = nb // n_sp
        blocks_in = stream["blocks"].reshape(5, n_sp, max_seg)
        renderer.last_sp_bounds = list(
            range(0, (nb + 1) * STREAM_BLOCK, max_seg * STREAM_BLOCK))
    s_pad_local = max_seg * STREAM_BLOCK

    def launch(buckets):
        front = functools.partial(
            renderer._frame_front,
            surface_type=int(scene_params.surface_type),
            draw_mode=int(rc.draw_mode),
            point_cloud=bool(rc.draw_point_cloud),
            use_skybox=use_skybox,
            use_proxy=use_proxy,
            proxy_opts=dict(proxy_opts),
            emit_block_demand=True,
            **buckets,
        )

        def per_device(blocks_local, store, panels, merged, draw, uniforms,
                       hm4, hm_src, sky, prox):
            # each shard assembles + composites its contiguous block range
            # of the front-to-back stream (panels + merged scratch
            # replicated); blocks_local arrives [5, 1, max_seg]
            binned, bg, depth_tiles, aux = front(
                store, panels,
                dict(blocks=blocks_local.reshape(blocks_local.shape[0], -1),
                     merged=merged),
                draw, uniforms, hm4, sky, prox, hm_src=hm_src,
            )
            # splat segment over a zero background (the real bg lands after
            # the fold); the proxy depth still gates every shard's raster
            gs = renderer._frame_back(
                binned, jnp.zeros_like(bg), depth_tiles, use_proxy=use_proxy
            )
            # fold segment images front-to-back across 'sp'
            imgs = jax.lax.all_gather(gs, "sp")  # [n_sp, H, W, 4]

            def fold(carry, nxt):
                return composite_over(carry, nxt), None

            out, _ = jax.lax.scan(fold, imgs[0], imgs[1:])
            out = out + (1.0 - out[..., 3:4]) * bg
            return (out[None], aux["overflow"][None],
                    aux["n_pairs_kept"][None], aux["block_demand"][None])

        # cached compiled program (see render_cameras_sharded)
        key = ("sp", tuple(mesh.shape.items()), max_seg, staged["s_pad"],
               int(rc.draw_mode), int(scene_params.surface_type),
               bool(rc.draw_point_cloud), use_skybox, use_proxy, proxy_opts,
               tuple(sorted(buckets.items())))
        cache = renderer.__dict__.setdefault("_sharded_jit", {})
        if key not in cache:
            cache[key] = jax.jit(jax.shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(None, "sp", None), P(), P(), P(), P(), P(), P(),
                          P(), P(), P()),
                out_specs=(P(), P("sp"), P("sp"), P("sp")),
                check_vma=False,
            ))
        return cache[key](
            blocks_in, renderer.store_packed, renderer.panels,
            stream["merged"], draw, uniforms, renderer.hm4, _hm_src(renderer),
            sky, prox,
        )

    out, ovf, pairs_kept, block_demand = launch(
        _bucket_kwargs(renderer, s_pad_local, use_proxy, shards=n_sp)
    )
    # per-device binned pair domains — the dryrun asserts these shrink to
    # ~1/n_sp of the single-device count
    renderer.last_shard_pairs_kept = pairs_kept
    renderer.last_batch_overflow = ovf
    if bool(np.any(jax.device_get(ovf))):
        out, ovf, pairs_kept, block_demand = launch(dict(
            max_pairs=None, max_live=None, live_buckets=None,
            max_entries=None,
        ))
        renderer.last_shard_pairs_kept = pairs_kept
        renderer.last_batch_overflow = ovf
    if n_sp > 1 and winmap is not None:
        # map per-window-block demands back to global lane segments and
        # record them for the next call's cut (boundary blocks that were
        # split report each side separately, so the within-block density
        # refines call over call)
        bd_win = np.asarray(jax.device_get(block_demand)).reshape(n_sp, -1)
        s0l, s1l, dl = [], [], []
        for i, rows in enumerate(winmap):
            for j, (g0_, g1_) in enumerate(rows):
                s0l.append(g0_)
                s1l.append(g1_)
                dl.append(float(bd_win[i, j]))
        renderer._sp_feedback = dict(
            n_sp=n_sp, n_lanes=nb * STREAM_BLOCK,
            segs=(np.asarray(s0l, np.int64), np.asarray(s1l, np.int64),
                  np.asarray(dl, np.float64)),
        )
    return out
