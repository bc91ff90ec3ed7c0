import numpy as np
import pytest

from gswt_renderer_tpu.core import (
    Camera,
    CameraUniforms,
    IncrementalMA,
    UserData,
    look_at_rh,
    perspective,
)
from gswt_renderer_tpu.core.mathutil import (
    colmajor_flat,
    pack_half_2x16,
    unpack_half_2x16,
    quat_to_mat3,
    vp_z_row,
)


def test_perspective_matches_opengl_convention():
    p = perspective(np.deg2rad(45.0), 16 / 9, 0.1, 2400.0)
    f = 1.0 / np.tan(np.deg2rad(45.0) / 2)
    assert np.isclose(p[0, 0], f / (16 / 9))
    assert np.isclose(p[1, 1], f)
    assert np.isclose(p[3, 2], -1.0)
    # a point on the near plane maps to z/w = -1 (OpenGL)
    v = p @ np.array([0, 0, -0.1, 1.0], np.float32)
    assert np.isclose(v[2] / v[3], -1.0, atol=1e-5)


def test_look_at_rh_properties():
    eye = np.array([1.0, 2.0, 3.0])
    m = look_at_rh(eye, [4.0, 2.0, 3.0], [0.0, 0.0, 1.0])
    # eye maps to origin
    assert np.allclose((m @ np.append(eye, 1.0))[:3], 0.0, atol=1e-6)
    # forward direction maps to -z
    fwd = m @ np.array([2.0, 2.0, 3.0, 1.0])
    assert np.allclose(fwd[:3], [0, 0, -1], atol=1e-6)


def test_colmajor_flat_indexing():
    """vp[2], vp[6], vp[10] in the reference's flattening are row 2 of the
    math matrix (scene.rs:459-461)."""
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    flat = colmajor_flat(m)
    assert flat[2] == m[2, 0] and flat[6] == m[2, 1] and flat[10] == m[2, 2]
    assert np.allclose(vp_z_row(m), [flat[2], flat[6], flat[10]])


def test_pack_half_roundtrip():
    x = np.array([1.5, -0.25, 3000.0], np.float32)
    y = np.array([0.125, 7.0, -1e-3], np.float32)
    lo, hi = unpack_half_2x16(pack_half_2x16(x, y))
    assert np.allclose(lo, x.astype(np.float16).astype(np.float32))
    assert np.allclose(hi, y.astype(np.float16).astype(np.float32))


def test_quat_to_mat3_rotation():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    c = np.cos(np.pi / 4)
    m = quat_to_mat3(c, 0.0, 0.0, c)
    v = m @ np.array([1.0, 0.0, 0.0])
    assert np.allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_camera_uniforms_focal():
    cam = Camera.default((1920, 1080))
    u = CameraUniforms(cam)
    w, h = 1920, 1080
    assert np.isclose(u.focal[0], abs(0.5 * cam.projection[0, 0] * w))
    assert np.isclose(u.focal[1], abs(-0.5 * cam.projection[1, 1] * h))
    htany = np.tan(cam.fovy / 2)
    assert np.allclose(u.htan_fov, [htany / h * w, htany], rtol=1e-6)
    assert u.flat().shape == (42,)


def test_camera_pitch_yaw_keep_position():
    cam = Camera.default((640, 480))
    p0 = cam.position.copy()
    d0 = cam.view_direction()
    cam.pitch(0.1)
    cam.yaw(-0.2)
    assert np.allclose(cam.position, p0)
    assert not np.allclose(cam.view_direction(), d0)
    # view direction remains unit length
    assert np.isclose(np.linalg.norm(cam.view_direction()), 1.0, atol=1e-5)


def test_incremental_ma_windowed():
    ma = IncrementalMA(3)
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        ma.add(v)
    # window holds [2,3,4]
    avg, std = ma.calc()
    assert np.isclose(avg, 3.0)
    assert np.isclose(std, np.sqrt(2.0 / 3.0))
    ma.clear()
    assert ma.calc() == (0.0, 0.0)


def test_userdata_from_ui_transforms():
    ud = UserData.from_ui(update_dist=2.0, lod_max_dist=96.0, tile_width=4.0,
                          height_map_scale=(1.5, 0.7))
    assert ud.update_distance2 == 4.0
    assert ud.lod_max_dist == 96.0 * 4.0
    assert ud.height_map_scale == (1.5, 1.5, 0.7)


def test_userdata_json_roundtrip():
    ud = UserData.from_ui(merge_topk=42)
    s = ud.to_json()
    ud2 = UserData.from_json(s)
    assert ud2.merge_topk == 42
    assert ud2.surface_type == ud.surface_type
    assert ud2.tile_map_half_wh == ud.tile_map_half_wh
