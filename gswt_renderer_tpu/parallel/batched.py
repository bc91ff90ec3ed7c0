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
                           render_config=None):
    """Render a batch of cameras, sharded over the mesh 'dp' axis.

    cam_batch: [B, UNIFORMS_LEN] packed uniforms (pack_camera_batch). B must
    divide by mesh dp size. Returns images [B, H, W, 4] sharded over dp.
    """
    from ..core.config import RenderConfig

    rc = render_config or RenderConfig.new(renderer.engine.n_tiles[0])
    stream = staged["stream"]
    draw = staged["draw"]
    frame = functools.partial(
        renderer._frame_packed,
        surface_type=int(scene_params.surface_type),
        draw_mode=int(rc.draw_mode),
        point_cloud=bool(rc.draw_point_cloud),
        use_skybox=False,
        use_proxy=False,
        proxy_opts={},
    )
    sky = jnp.zeros((1, 1, 3))
    prox = dict(
        atlas=jnp.zeros((12, 1), jnp.float32),
        verts=jnp.zeros((2, 4), jnp.float32),
        tris=jnp.zeros((3, 2), jnp.int32),
    )

    def per_device(cams_local, store, panels, stream, draw, hm4, hm_src):
        def body(carry, cam):
            img, _ = frame(store, panels, stream, draw, cam, hm4, sky, prox,
                           hm_src=hm_src)
            return carry, img

        _, imgs = jax.lax.scan(body, 0, cams_local)
        return imgs

    # cache the traced+compiled sharded program: rebuilding shard_map per
    # call re-traces the whole frame (~8s of host time at 1080p)
    key = ("dp", tuple(mesh.shape.items()), cam_batch.shape,
           staged["s_pad"], int(rc.draw_mode),
           int(scene_params.surface_type), bool(rc.draw_point_cloud))
    cache = renderer.__dict__.setdefault("_sharded_jit", {})
    if key not in cache:
        cache[key] = jax.jit(jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("dp"), P(), P(), P(), P(), P(), P()),
            out_specs=P("dp"),
            check_vma=False,
        ))
    return cache[key](
        cam_batch, renderer.store_packed, renderer.panels, stream, draw,
        renderer.hm4, _hm_src(renderer),
    )


def render_stream_sharded(renderer, staged, scene_params, camera, mesh,
                          render_config=None):
    """Render ONE camera with the splat stream sharded over the 'sp' axis.

    Each device projects/bins/composites its contiguous front-to-back stream
    segment; the segment images fold with the associative over-operator in
    stream order (front segment = shard 0). Returns the final [H, W, 4]
    image (replicated)."""
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
    assert nb % n_sp == 0, (nb, n_sp)

    frame = functools.partial(
        renderer._frame_packed,
        surface_type=int(scene_params.surface_type),
        draw_mode=int(rc.draw_mode),
        point_cloud=bool(rc.draw_point_cloud),
        use_skybox=False,
        use_proxy=False,
        proxy_opts={},
    )
    sky = jnp.zeros((1, 1, 3))
    prox = dict(
        atlas=jnp.zeros((12, 1), jnp.float32),
        verts=jnp.zeros((2, 4), jnp.float32),
        tris=jnp.zeros((3, 2), jnp.int32),
    )

    def per_device(blocks_local, store, panels, merged, draw, uniforms,
                   hm4, hm_src):
        # each shard assembles + composites its contiguous block range of
        # the front-to-back stream (panels + merged scratch replicated)
        img, _ = frame(
            store, panels, dict(blocks=blocks_local, merged=merged),
            draw, uniforms, hm4, sky, prox, hm_src=hm_src,
        )
        # fold segment images front-to-back across 'sp'
        imgs = jax.lax.all_gather(img, "sp")  # [n_sp, H, W, 4]

        def fold(carry, nxt):
            return composite_over(carry, nxt), None

        out, _ = jax.lax.scan(fold, imgs[0], imgs[1:])
        return out[None]

    # cached compiled program (see render_cameras_sharded)
    key = ("sp", tuple(mesh.shape.items()), nb, staged["s_pad"],
           int(rc.draw_mode), int(scene_params.surface_type),
           bool(rc.draw_point_cloud))
    cache = renderer.__dict__.setdefault("_sharded_jit", {})
    if key not in cache:
        cache[key] = jax.jit(jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(None, "sp"), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        ))
    return cache[key](
        stream["blocks"], renderer.store_packed, renderer.panels,
        stream["merged"], draw, uniforms, renderer.hm4, _hm_src(renderer),
    )
