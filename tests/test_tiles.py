import numpy as np
import pytest

from gswt_renderer_tpu.core import Camera, UserData
from gswt_renderer_tpu.core.config import (
    SelectiveMergeType,
    SurfaceType,
    TileSortType,
)
from gswt_renderer_tpu.io.synth import synthetic_scene_vec
from gswt_renderer_tpu.tiles import MergeStatus, TransitionStatus, WangTileEngine


@pytest.fixture(scope="module")
def engine():
    sv = synthetic_scene_vec(n_lod=3, splats_per_tile=128)
    return WangTileEngine(sv)


def _configure(engine, **kw):
    kw.setdefault("tile_map_half_wh", (4, 4))
    kw.setdefault("height_map_scale", (1.0, 0.3))
    kw.setdefault("lod_max_dist", 8.0)
    ud = UserData.from_ui(**kw)
    engine.configure(ud)
    return ud


CAM = np.array([0.0, 0.0, 5.0], np.float32)


def test_preprocess_shapes(engine):
    n_lod, n_tile, n_view = engine.n_tiles
    assert (n_lod, n_tile, n_view) == (3, 16, 9)
    assert engine.splats_merge_offset.shape == (3, 16)
    # merged offsets are the prefix sums of per-scene splat counts
    total = engine.tile_splats_merged.splat_count
    offs = engine.splats_merge_offset.reshape(-1)
    assert offs[0] == 0 and np.all(np.diff(offs) > 0) and offs[-1] < total
    # lod avg scales strictly increasing (wangtile.rs:139)
    assert all(
        b > a for a, b in zip(engine.lod_avg_scale, engine.lod_avg_scale[1:])
    )


def test_presort_blended_orders(engine):
    """Each (lod, tile, view) presorted order pairs lod i with lod i+1
    (wangtile.rs:221-254)."""
    n_lod, n_tile, n_view = engine.n_tiles
    bd = engine.tile_base_data[0][5][3]
    n0 = engine.tile_splats_vec[0][5].splat_count
    n1 = engine.tile_splats_vec[1][5].splat_count
    assert bd.splat_count == n0 + n1
    assert set(np.unique(bd.gs_lod_id)) <= {0, 1}
    # indices must fall inside the two tiles' ranges in the merged store
    off0 = engine.splats_merge_offset[0, 5]
    off1 = engine.splats_merge_offset[1, 5]
    in0 = (bd.gs_index >= off0) & (bd.gs_index < off0 + n0)
    in1 = (bd.gs_index >= off1) & (bd.gs_index < off1 + n1)
    assert np.all(in0 | in1)
    assert in0.sum() == n0 and in1.sum() == n1
    # last lod has no lower lod to blend with
    bd_last = engine.tile_base_data[n_lod - 1][5][3]
    assert bd_last.splat_count == engine.tile_splats_vec[n_lod - 1][5].splat_count


def test_configure_map_dims(engine):
    ud = _configure(engine)
    assert ud.tile_map_wh == (9, 9)
    assert len(ud.lod_transition_dist) == 3
    # distances scale with avg lod scale; last = lod_max_dist (wangtile.rs:416-423)
    assert np.isclose(ud.lod_transition_dist[-1], ud.lod_max_dist)
    assert all(
        b > a
        for a, b in zip(ud.lod_transition_dist, ud.lod_transition_dist[1:])
    )


def test_build_spawns_consistent_wang_tiling(engine):
    _configure(engine)
    engine.build_tiles(CAM)
    w, h = engine.user_data.tile_map_wh
    assert engine.occupied.all()
    for i in range(w - 1):
        for j in range(h):
            east = engine.tile_id_to_color(int(engine.tile_id[i, j]))[2]
            west = engine.tile_id_to_color(int(engine.tile_id[i + 1, j]))[0]
            assert east == west
    for i in range(w):
        for j in range(h - 1):
            north = engine.tile_id_to_color(int(engine.tile_id[i, j]))[1]
            south = engine.tile_id_to_color(int(engine.tile_id[i, j + 1]))[3]
            assert north == south


def test_scroll_preserves_surviving_tiles(engine):
    ud = _configure(engine)
    engine.build_tiles(CAM)
    before = engine.tile_id.copy()
    # move camera one tile east: map scrolls by (1, 0)
    engine.build_tiles(CAM + np.array([ud.tile_width, 0, 0], np.float32))
    after = engine.tile_id
    assert np.array_equal(after[:-1, :], before[1:, :])
    # and the wang property still holds on the fresh column
    w, h = engine.user_data.tile_map_wh
    for j in range(h):
        east = engine.tile_id_to_color(int(after[w - 2, j]))[2]
        west = engine.tile_id_to_color(int(after[w - 1, j]))[0]
        assert east == west


def test_lod_increases_with_distance(engine):
    _configure(engine)
    engine.build_tiles(CAM)
    w, h = engine.user_data.tile_map_wh
    center_lod = engine.lod_id[w // 2, h // 2]
    corner_lod = engine.lod_id[0, 0]
    assert center_lod <= corner_lod
    assert engine.lod_id.max() <= engine.n_tiles[0] - 1
    # border tiles get Spawning fade status (wangtile.rs:1587-1604); with the
    # camera exactly on a tile corner cam_u = cam_v = 0, so the east/north
    # borders fade (blend *= cam_u -> 0) while west/south keep blend 1.0
    w, h = engine.user_data.tile_map_wh
    assert np.all(engine.trans_status[w - 1, :] == TransitionStatus.SPAWNING)
    assert np.all(engine.trans_status[:, h - 1] == TransitionStatus.SPAWNING)


def test_rng_determinism(engine):
    _configure(engine)
    engine.build_tiles(CAM)
    ids1 = engine.tile_id.copy()
    _configure(engine)  # reset_rng=True by default
    engine.build_tiles(CAM)
    assert np.array_equal(ids1, engine.tile_id)


def test_sort_distance_order_far_to_near(engine):
    _configure(
        engine,
        merge_type=SelectiveMergeType.NONE,
        tile_sort_type=TileSortType.DISTANCE,
    )
    engine.build_tiles(CAM)
    cam = Camera.default((640, 480))
    dt = engine.sort_tiles(CAM, cam.view_proj())
    w, h = engine.user_data.tile_map_wh
    assert dt.n_draws == w * h
    centers = engine.tile_center.reshape(-1, 3)[dt.map_index]
    d2 = np.sum((centers - CAM) ** 2, axis=1)
    assert np.all(np.diff(d2) <= 1e-4)


def test_sort_graph_respects_edge_orientation(engine):
    _configure(
        engine,
        merge_type=SelectiveMergeType.NONE,
        tile_sort_type=TileSortType.GRAPH,
    )
    engine.build_tiles(CAM)
    cam = Camera.default((640, 480))
    dt = engine.sort_tiles(CAM, cam.view_proj())
    # painter constraint: if edge normal points away from camera at a shared
    # edge, the far tile must be drawn first
    pos_in_order = {int(m): k for k, m in enumerate(dt.map_index)}
    w, h = engine.user_data.tile_map_wh
    violations = 0
    checked = 0
    for i in range(w):
        for j in range(h):
            for e in range(2, 4):  # east, south enough for coverage
                nb = engine._neighbor((i, j), e)
                if nb is None:
                    continue
                n_mc, _ = nb
                a = i * h + j
                b = int(n_mc[0]) * h + int(n_mc[1])
                if a not in pos_in_order or b not in pos_in_order:
                    continue
                vd = engine.edge_pos[i, j, e] - CAM
                dot = float(engine.edge_normal[i, j, e] @ vd)
                if dot > 1e-6:
                    checked += 1
                    # a before b in back-to-front => a further: a must come
                    # AFTER b is wrong; edge a->b means draw b... verify via
                    # reversed toposort: a -> b edge means b drawn before a
                    if pos_in_order[b] > pos_in_order[a]:
                        violations += 1
    assert checked > 0
    assert violations == 0


def test_edge_merge_groups_and_cache(engine):
    _configure(
        engine,
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.5,
        merge_topk=40,
        tile_sort_type=TileSortType.GRAPH,
    )
    # grazing view across the terrain gives edge-on edges
    cam = np.array([0.0, 0.0, 1.0], np.float32)
    engine.build_tiles(cam)
    camera = Camera.default((640, 480))
    dt = engine.sort_tiles(cam, camera.view_proj())
    n_merged = int(dt.single_draw.sum())
    assert n_merged >= 1
    assert len(engine.merge_groups) == n_merged
    # all MergedTo tiles point at a MergedFrom host
    w, h = engine.user_data.tile_map_wh
    for i in range(w):
        for j in range(h):
            if engine.merge_status[i, j] == MergeStatus.MERGED_TO:
                host = int(engine.merge_to[i, j])
                assert engine.merge_status[host // h, host % h] == MergeStatus.MERGED_FROM
    # stream arrays cover all merged draws
    merged_rows = np.where(dt.single_draw == 1)[0]
    total = int(dt.splat_count[merged_rows].sum())
    assert len(dt.stream_gs_index) == total
    # merged stream indices are valid into the merged store
    assert dt.stream_gs_index.max() < engine.tile_splats_merged.splat_count

    # second sort with identical state hits the LRU (cache keys equal)
    n_cache = len(engine.sort_lru_cache)
    dt2 = engine.sort_tiles(cam, camera.view_proj())
    assert len(engine.sort_lru_cache) == n_cache  # no new entries
    assert np.array_equal(dt2.stream_gs_index, dt.stream_gs_index)


def test_merged_stream_is_depth_sorted(engine):
    _configure(
        engine,
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.5,
        merge_topk=40,
        tile_sort_type=TileSortType.GRAPH,
        use_cache=False,
    )
    cam = np.array([0.0, 0.0, 1.0], np.float32)
    engine.build_tiles(cam)
    camera = Camera.default((640, 480))
    dt = engine.sort_tiles(cam, camera.view_proj())
    merged_rows = np.where(dt.single_draw == 1)[0]
    assert len(merged_rows) > 0
    # for each merged draw: per-splat world depth along the chosen presort
    # direction must be (bucket-)non-increasing (back-to-front)
    store = engine.tile_splats_merged
    store.generate_arrays()
    row = merged_rows[0]
    s0 = int(dt.stream_start[row])
    cnt = int(dt.splat_count[row])
    gs = dt.stream_gs_index[s0 : s0 + cnt]
    # positions + per-splat tile offset via map id
    mids = dt.stream_map_id[s0 : s0 + cnt].astype(np.int64)
    h = engine.user_data.tile_map_wh[1]
    offs = engine.all_tile_offsets().reshape(-1, 3)[mids]
    pos = store.pos[gs] + offs
    # depth along the presort view's z row in *local* space was used, so we
    # only sanity-check monotonicity loosely via projection on the view dir
    view_id = int(dt.view_id[row])
    d = pos @ engine.presort_dirs[view_id]
    # allow bucket-quantization wiggle
    assert np.mean(np.diff(d) <= 0.05) > 0.9


def test_sphere_topology():
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=64)
    eng = WangTileEngine(sv)
    ud = UserData.from_ui(
        tile_map_half_wh=(5, 2),
        surface_type=SurfaceType.SPHERE,
        sphere_radius=20.0,
        merge_type=SelectiveMergeType.NONE,
        tile_sort_type=TileSortType.DISTANCE,
        lod_max_dist=8.0,
    )
    eng.configure(ud)
    assert ud.tile_map_wh == (10, 4)
    # every tile has all 4 neighbors (wraparound topology)
    assert np.all(eng.neighbor_coord[..., 0] >= 0)
    # neighbor relation is symmetric: if b is a's neighbor at slot e with
    # back-edge be, then a is b's neighbor at slot be
    w, h = ud.tile_map_wh
    for i in range(w):
        for j in range(h):
            for e in range(4):
                n_mc, back = eng._neighbor((i, j), e)
                back_mc, _ = eng._neighbor((int(n_mc[0]), int(n_mc[1])), back)
                assert (int(back_mc[0]), int(back_mc[1])) == (i, j)
    eng.build_tiles(np.array([25.0, 0.0, 0.0], np.float32))
    assert eng.occupied.all()
    # tiles live on the sphere of radius ~20 (+/- local height)
    r = np.linalg.norm(eng.tile_center.reshape(-1, 3), axis=1)
    assert np.all(np.abs(r - 20.0) < 3.0)


def test_sphere_seam_corners_shared():
    """Across the 5x2 sphere block seams, adjacent tiles must hold IDENTICAL
    corner values (wangtile.rs:1623-1652 copies corner frames from spawned
    neighbors; the vectorized rebuild owns each lattice point canonically —
    PARITY.md #3)."""
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=64)
    eng = WangTileEngine(sv)
    ud = UserData.from_ui(
        tile_map_half_wh=(5, 2),
        surface_type=SurfaceType.SPHERE,
        sphere_radius=20.0,
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.5,
        merge_topk=10,
        tile_sort_type=TileSortType.GRAPH,
        lod_max_dist=8.0,
    )
    eng.configure(ud)
    eng.build_tiles(np.array([25.0, 0.0, 0.0], np.float32))
    w, h = ud.tile_map_wh
    # corner k of tile (i,j) sits at lattice (i+d[k].x, j+d[k].y) with
    # d = [(0,0),(0,1),(1,1),(1,0)]; tile (i,j)'s corner 3 and tile
    # (i+1,j)'s corner 0 share lattice (i+1, j) — including across the
    # block seams at i+1 multiples of w/5
    mismatches = 0
    for i in range(w - 1):
        for j in range(h):
            a = eng.corner_pos[i, j, 3]
            b = eng.corner_pos[i + 1, j, 0]
            if not np.array_equal(a, b):
                mismatches += 1
            aw = eng.corner_to_world[i, j, 3]
            bw = eng.corner_to_world[i + 1, j, 0]
            if not np.array_equal(aw, bw):
                mismatches += 1
    # vertical sharing: corner 1 of (i,j) == corner 0 of (i,j+1)
    for i in range(w):
        for j in range(h - 1):
            if not np.array_equal(
                eng.corner_pos[i, j, 1], eng.corner_pos[i, j + 1, 0]
            ):
                mismatches += 1
    assert mismatches == 0, f"{mismatches} shared corners disagree"


def test_axis_merge_rows(engine):
    _configure(
        engine,
        tile_map_half_wh=(5, 5),
        merge_type=SelectiveMergeType.AXIS,
        merge_tile_dist=(2, 4),
        tile_sort_type=TileSortType.DISTANCE,
    )
    cam = np.array([0.0, 0.0, 2.0], np.float32)
    engine.build_tiles(cam)
    from gswt_renderer_tpu.core import Camera

    camera = Camera((640, 480), cam, (0.0, 10.0, 1.0), (0.0, 0.0, 1.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam, camera.view_proj())
    merged = np.where(dt.single_draw == 1)[0]
    # merge_tile_dist (2, 4) -> two 3-wide rows ahead of the camera
    assert len(merged) == 2
    for row in merged:
        host = int(dt.map_index[row])
        assert len(engine.merge_groups[host]) == 3
    # MergedTo tiles are excluded from the draw list
    w, h = engine.user_data.tile_map_wh
    assert dt.n_draws == w * h - 2 * 2  # 2 groups x 2 absorbed neighbors


def test_viewport_and_bfs_orderings(engine):
    from gswt_renderer_tpu.core import Camera

    for sort_type in (TileSortType.VIEWPORT, TileSortType.OBJECT):
        _configure(
            engine,
            merge_type=SelectiveMergeType.NONE,
            tile_sort_type=sort_type,
        )
        cam = np.array([0.3, -1.0, 3.0], np.float32)
        engine.build_tiles(cam)
        camera = Camera((640, 480), cam, (0.3, 10.0, 1.0), (0.0, 0.0, 1.0),
                        np.deg2rad(60.0), 0.1, 200.0)
        dt = engine.sort_tiles(cam, camera.view_proj())
        w, h = engine.user_data.tile_map_wh
        assert dt.n_draws == w * h
        assert sorted(dt.map_index.tolist()) == list(range(w * h))
        if sort_type == TileSortType.VIEWPORT:
            # far-to-near along the view z row
            zrow = camera.view_proj()[2, :3]
            c = engine.tile_center.reshape(-1, 3)[dt.map_index]
            keys = c @ zrow
            assert np.all(np.diff(keys) <= 1e-4)
        else:
            # BFS reversed: the LAST drawn tile is the nearest one
            last = engine.tile_center.reshape(-1, 3)[dt.map_index[-1]]
            d_last = np.sum((last - cam) ** 2)
            dists = np.sum(
                (engine.tile_center.reshape(-1, 3) - cam) ** 2, axis=1
            )
            assert np.isclose(d_last, dists.min())


def test_always_sort_flag(engine):
    ud = _configure(engine, always_sort=True)
    assert ud.always_sort
