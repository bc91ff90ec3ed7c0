import numpy as np
import pytest

from gswt_renderer_tpu.io import (
    SH_C0,
    Scene,
    load_scene_zip,
    make_synthetic_tile_set,
    pack_splats,
    write_ply,
    write_tile_zip,
)
from gswt_renderer_tpu.io.synth import synthetic_scene_vec


def _one_splat_fields():
    position = np.array([[1.0, 2.0, 3.0]], np.float32)
    log_scale = np.log(np.array([[0.5, 0.25, 0.125]], np.float32))
    color_dc = np.array([[0.7, -0.3, 0.1]], np.float32)
    alpha_logit = np.array([2.0], np.float32)
    rotation = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
    return position, log_scale, color_dc, alpha_logit, rotation


def test_pack_single_splat_golden():
    """Hand-computed 32-byte row (scene.rs:149-211)."""
    pos, ls, col, al, rot = _one_splat_fields()
    buf = np.frombuffer(pack_splats(pos, ls, col, al, rot), np.uint8).reshape(1, 32)
    f = buf[:, :24].copy().view("<f4").reshape(-1)
    assert np.allclose(f[:3], [1.0, 2.0, 3.0])
    assert np.allclose(f[3:6], [0.5, 0.25, 0.125], rtol=1e-6)
    rgba = buf[0, 24:28]
    assert rgba[0] == int((0.5 + SH_C0 * 0.7) * 255)
    assert rgba[1] == int(np.trunc((0.5 + SH_C0 * -0.3) * 255))
    assert rgba[3] == int((1 / (1 + np.exp(-2.0))) * 255)
    quat = buf[0, 28:32]
    assert quat[0] == 255  # w=1 -> ((1)+1)*0.5*255 = 255


def test_pack_quat_quantization():
    pos, ls, col, al, rot = _one_splat_fields()
    buf = np.frombuffer(pack_splats(pos, ls, col, al, rot), np.uint8).reshape(1, 32)
    quat = buf[0, 28:32]
    assert quat[0] == 255 and quat[1] == 127 and quat[2] == 127 and quat[3] == 127


def test_importance_sort_descending():
    rng = np.random.default_rng(1)
    n = 100
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    ls = rng.uniform(-3, 0, (n, 3)).astype(np.float32)
    col = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    al = rng.uniform(-2, 4, n).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    s = Scene(splat_count=n, buffer=pack_splats(pos, ls, col, al, rot))
    # importance in the *original* order, from original fields
    # (scene.rs:127-135: exp(scale) product * sigmoid(alpha))
    vol = np.exp(ls).prod(axis=1)
    imp = vol * (1 / (1 + np.exp(-al)))
    # map each packed row back to its original index by exact position match
    origin = {pos[i].tobytes(): i for i in range(n)}
    packed_imp = np.array(
        [imp[origin[s.positions()[i].tobytes()]] for i in range(n)]
    )
    # packed order must be importance-descending
    assert np.all(np.diff(packed_imp) <= 1e-12)


def test_ply_roundtrip_and_cov():
    pos, ls, col, al, rot = _one_splat_fields()
    data = write_ply(pos, ls, col, al, rot)
    s = Scene.from_ply_bytes(data)
    assert s.splat_count == 1
    s.generate_arrays()
    assert np.allclose(s.pos[0], [1.0, 2.0, 3.0])
    # identity rotation (after u8 quantization ~ near identity):
    # cov ~ 4 * diag(scale^2), f16 rounded
    expect = 4.0 * np.array([0.5**2, 0.25**2, 0.125**2], np.float32)
    got = s.cov[0][[0, 3, 5]]
    assert np.allclose(got, expect, rtol=0.02)
    # off-diagonals small (quantization noise only)
    assert np.all(np.abs(s.cov[0][[1, 2, 4]]) < 0.02)


def test_cov_quantized_through_u8_quat():
    """Covariance must be computed from the u8-dequantized quaternion, not the
    float one (scene.rs:360-367)."""
    rng = np.random.default_rng(3)
    rot = rng.normal(size=(1, 4)).astype(np.float32)
    pos = np.zeros((1, 3), np.float32)
    ls = np.zeros((1, 3), np.float32)
    col = np.zeros((1, 3), np.float32)
    al = np.zeros(1, np.float32)
    s = Scene(1, pack_splats(pos, ls, col, al, rot)).generate_arrays()
    q = s.quats_u8()[0].astype(np.float32) / 255.0 * 2.0 - 1.0
    # rebuild Sigma from quantized q, scale=1
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    Sg = 4.0 * (R @ R.T)
    expect = np.array([Sg[0, 0], Sg[0, 1], Sg[0, 2], Sg[1, 1], Sg[1, 2], Sg[2, 2]])
    assert np.allclose(s.cov[0], expect.astype(np.float16).astype(np.float32), atol=1e-6)


def test_zip_loader(tmp_path):
    p = tmp_path / "tiles.zip"
    write_tile_zip(p, n_lod=2, n_center_options=1, splats_per_tile=64)
    sv = load_scene_zip(p)
    assert len(sv) == 2 and len(sv[0]) == 16
    assert all(s.splat_count > 0 for lod in sv for s in lod)
    # matches direct synthesis
    sv2 = synthetic_scene_vec(n_lod=2, n_center_options=1, splats_per_tile=64)
    assert sv[0][3].buffer == sv2[0][3].buffer


def test_scene_ops():
    sv = synthetic_scene_vec(n_lod=1, splats_per_tile=64)
    s = sv[0][0]
    n0 = s.splat_count
    (lo, hi), center = s.compute_aabb_and_center()
    assert np.all(lo <= center) and np.all(center <= hi)
    t = s.translated([1.0, 0.0, -2.0])
    (lo2, hi2), _ = t.compute_aabb_and_center()
    assert np.allclose(lo2 - lo, [1.0, 0.0, -2.0], atol=1e-5)
    s2 = Scene(s.splat_count, s.buffer).merge(t)
    assert s2.splat_count == 2 * n0
    assert s.compute_scale_sum() > 0
