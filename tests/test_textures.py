import numpy as np
import pytest

from gswt_renderer_tpu.io.textures import (
    build_mip_chain,
    load_exr,
    load_height_map,
    load_skybox_faces,
)
from gswt_renderer_tpu.viewer.headless import write_png


def test_height_map_normalization(tmp_path):
    img = np.zeros((8, 16, 3), np.float32)
    img[0, :, 0] = 1.0  # top row bright red
    p = write_png(tmp_path / "h.png", img)
    hm, (w, h) = load_height_map(p)
    assert (w, h) == (16, 8)
    # vertical flip: the bright top row lands at the END of the flat array
    assert hm[-16:].mean() > 0.9
    assert hm.min() >= -1.0 and hm.max() <= 1.0
    assert np.isclose(hm.max(), 1.0)


def test_skybox_faces_loader(tmp_path):
    paths = []
    for i in range(6):
        img = np.full((8, 8, 3), i / 6.0, np.float32)
        paths.append(write_png(tmp_path / f"f{i}.png", img))
    faces = load_skybox_faces(paths)
    assert faces.shape == (6, 8, 8, 3)
    assert faces[3].mean() > faces[0].mean()


def _write_minimal_exr(path, rgb):
    """Uncompressed scanline EXR writer for testing the reader."""
    import struct

    h, w = rgb.shape[:2]
    out = bytearray()
    out += b"\x76\x2f\x31\x01" + struct.pack("<i", 2)

    def attr(name, typ, data):
        return name.encode() + b"\x00" + typ.encode() + b"\x00" + struct.pack(
            "<i", len(data)
        ) + data

    chans = b""
    for c in ("B", "G", "R"):
        chans += c.encode() + b"\x00" + struct.pack("<i", 2)  # float
        chans += struct.pack("<i", 0) + struct.pack("<2i", 1, 1)
    chans += b"\x00"
    out += attr("channels", "chlist", chans)
    out += attr("compression", "compression", b"\x00")
    out += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    out += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    out += attr("lineOrder", "lineOrder", b"\x00")
    out += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    out += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    out += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    out += b"\x00"
    # offset table placeholder
    table_pos = len(out)
    out += b"\x00" * (8 * h)
    offsets = []
    for y in range(h):
        offsets.append(len(out))
        line = struct.pack("<i", y) + struct.pack("<i", 12 * w)
        # channels alphabetical: B, G, R
        line += rgb[y, :, 2].astype("<f4").tobytes()
        line += rgb[y, :, 1].astype("<f4").tobytes()
        line += rgb[y, :, 0].astype("<f4").tobytes()
        out += line
    for i, off in enumerate(offsets):
        struct.pack_into("<Q", out, table_pos + 8 * i, off)
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_exr_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 4, (6, 5, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    _write_minimal_exr(p, rgb)
    got = load_exr(p)
    assert got.shape == (6, 5, 3)
    assert np.allclose(got, rgb, atol=1e-6)


def test_mip_chain():
    img = np.random.default_rng(1).uniform(0, 1, (32, 64, 3)).astype(np.float32)
    mips = build_mip_chain(img)
    assert mips[0].shape == (32, 64, 3)
    assert mips[1].shape == (16, 32, 3)
    assert len(mips) >= 5
    # energy approximately preserved per level
    assert abs(mips[1].mean() - img.mean()) < 0.05
