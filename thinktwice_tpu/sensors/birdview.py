"""Privileged BEV rasterizer: the Roach ChauffeurNet observation, in-graph.

Re-implements roach/obs_manager/birdview/chauffeurnet.py:38-290 as a pure
function of (town, ego pose, history rings, route window):

channel layout (= masks stack at chauffeurnet.py:186-187, normalized /255):
  0: road          1: route          2: lane (broken lanes at 120/255)
  3-6:   vehicle history  at history_idx (-16, -11, -6, -1)
  7-10:  walker history
  11-14: traffic light + stop-sign history (green 80, yellow 170, red 255,
         stop signs 255)

Geometry (chauffeurnet.py:_get_warp_transform/_world_to_pixel): 192x192 px at
5 px/m, ego `pixels_ev_to_bottom`=40 px from the bottom edge, heading up;
cv2.warpAffine's source sampling is replaced by direct bilinear gathers of the
pre-baked town rasters at each output pixel's map coordinate, and the
cv2.fillConvexPoly / polylines / line draws by analytic coverage tests
(point-in-OBB for actor boxes, distance-to-segment for route and stop lines)
— identical geometry, no host round-trip, vmappable over worlds.

Two equivalent paths exist: render_birdview_flat tests every pixel against
every (ego-proximity-culled) primitive — simple, the correctness oracle —
while render_birdview (the default) additionally culls primitives per
48 x 48 px tile with a conservative distance bound + top_k keep, cutting the
pair-op count ~4x at bitwise-identical output (capacity headroom on the real
towns is asserted by tests/test_birdview_tiling.py). The legacy Pallas kernel
(ops/birdview_pallas.py) remains an opt-in for low-density procedural towns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import BirdviewConfig
from thinktwice_tpu.maps.town import TownMap, TL_GREEN, TL_RED, TL_YELLOW
from thinktwice_tpu.sim.state import HistoryState, WorldState

LANE_BROKEN_VALUE = 120.0 / 255.0
TL_GREEN_VALUE = 80.0 / 255.0
TL_YELLOW_VALUE = 170.0 / 255.0
TL_RED_VALUE = 1.0


def _pixel_world_coords(cfg: BirdviewConfig, ego_pos, ego_yaw):
    """World xy of every BEV pixel -> (W, W, 2). Row 0 is ahead of the ego."""
    W = cfg.width
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    right = jnp.stack([-jnp.sin(ego_yaw), jnp.cos(ego_yaw)])
    rows = jax.lax.broadcasted_iota(jnp.float32, (W, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (W, W), 1)
    a = (W - cfg.pixels_ev_to_bottom - rows) / cfg.pixels_per_meter  # forward m
    b = (cols - 0.5 * W) / cfg.pixels_per_meter                      # right m
    return ego_pos[None, None, :] + a[..., None] * fwd + b[..., None] * right


def _sample_map(raster, town: TownMap, pts_world):
    """Bilinear sample of a town raster at world points (..., 2) -> (...,)
    float in [0, 1]; zero outside the map."""
    px = town.world_to_pixel(pts_world)
    x, y = px[..., 0], px[..., 1]
    H, Wm = raster.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < Wm) & (yi >= 0) & (yi < H)
        v = raster[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, Wm - 1)]
        return jnp.where(inb, v.astype(jnp.float32), 0.0)

    v = (
        tap(x0, y0) * (1 - fx) * (1 - fy)
        + tap(x0 + 1, y0) * fx * (1 - fy)
        + tap(x0, y0 + 1) * (1 - fx) * fy
        + tap(x0 + 1, y0 + 1) * fx * fy
    )
    return jnp.clip(v, 0.0, 1.0)


def _boxes_mask(pts, pose, active, min_extent=0.0, scale=1.0):
    """Coverage of a set of OBBs. pts (P, 2); pose (N, 5) = x,y,yaw,ex,ey;
    active (N,) -> (P,) bool. `scale`/`min_extent` mirror
    _get_surrounding_actors' bbox scaling (vehicles x1, walkers x2, 0.8 m
    floor when scale_bbox is on)."""
    pos = pose[:, :2]
    yaw = pose[:, 2]
    ext = jnp.maximum(pose[:, 3:5] * scale, min_extent)
    rel = pts[None, :, :] - pos[:, None, :]                  # (N, P, 2)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[:, None] + rel[..., 1] * s[:, None]
    ly = -rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    inside = (
        (jnp.abs(lx) <= ext[:, None, 0])
        & (jnp.abs(ly) <= ext[:, None, 1])
        & active[:, None]
    )
    return jnp.any(inside, axis=0)


SEG_CHUNK = 512   # segments per scan step — bounds the (N, P) intermediate.
                  # At imported-Town05 capacities (8192 road + 8192 lane segs)
                  # one unchunked mask is segs x pixels x worlds ~ 29 GB under
                  # vmap; chunked it is <= 512 x 36864 x 4 B = 75 MB per world.

CULL_K = 1024     # segments kept per table after the distance cull. The BEV
                  # reaches at most ~36 m from the ego; the densest point on
                  # the 10 Town05 Long routes sees 614 road / 642 lane
                  # segments within 42 m (measured), so 1024 has ~1.6x
                  # headroom while cutting the raster work 8x vs the full
                  # 8192-row tables.


def _cull_segments(segs, valid, center, radius):
    """Keep the CULL_K nearest segments to `center` (conservative bound:
    midpoint distance minus half-length minus half-width), dropping any
    beyond `radius`. Output shapes are static -> jit/vmap friendly."""
    n = segs.shape[0]
    if n <= CULL_K:
        return segs, valid
    a, b = segs[:, 0:2], segs[:, 2:4]
    mid = 0.5 * (a + b)
    half = 0.5 * jnp.linalg.norm(b - a, axis=-1) + segs[:, 4]
    d = jnp.linalg.norm(mid - center[None], axis=-1) - half
    d = jnp.where(valid, d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, CULL_K)
    return segs[idx], valid[idx] & (-neg_d < radius)


def _bev_reach_m(cfg: BirdviewConfig) -> float:
    """Farthest world distance any BEV pixel sits from the ego (+ margin)."""
    fwd = (cfg.width - cfg.pixels_ev_to_bottom) / cfg.pixels_per_meter
    lat = 0.5 * cfg.width / cfg.pixels_per_meter
    return float((fwd**2 + lat**2) ** 0.5 + 2.0)


def _segments_mask(pts, seg_a, seg_b, valid, half_width):
    """Coverage of thick segments. pts (P, 2); seg_a/b (N, 2); half_width
    scalar or (N,) -> (P,) bool."""
    N = seg_a.shape[0]
    hw = jnp.broadcast_to(jnp.asarray(half_width, jnp.float32), (N,))

    def chunk_mask(a, b, v, h):
        ab = b - a                                           # (C, 2)
        denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)      # (C,)
        rel = pts[None, :, :] - a[:, None, :]                # (C, P, 2)
        t = jnp.clip(
            jnp.einsum("npc,nc->np", rel, ab) / denom[:, None], 0.0, 1.0
        )
        proj = a[:, None, :] + t[..., None] * ab[:, None, :]
        d = jnp.linalg.norm(pts[None] - proj, axis=-1)       # (C, P)
        return jnp.any((d <= h[:, None]) & v[:, None], axis=0)

    if N <= SEG_CHUNK:
        return chunk_mask(seg_a, seg_b, valid, hw)

    pad = (-N) % SEG_CHUNK
    a = jnp.pad(seg_a, ((0, pad), (0, 0)))
    b = jnp.pad(seg_b, ((0, pad), (0, 0)))
    v = jnp.pad(valid, (0, pad))
    h = jnp.pad(hw, (0, pad))
    n_chunks = (N + pad) // SEG_CHUNK
    chunks = (
        a.reshape(n_chunks, SEG_CHUNK, 2),
        b.reshape(n_chunks, SEG_CHUNK, 2),
        v.reshape(n_chunks, SEG_CHUNK),
        h.reshape(n_chunks, SEG_CHUNK),
    )

    def body(acc, ch):
        ca, cb, cv, chw = ch
        return acc | chunk_mask(ca, cb, cv, chw), None

    out, _ = jax.lax.scan(body, jnp.zeros(pts.shape[0], bool), chunks)
    return out


def _segments_mask_multi(pts, seg_a, seg_b, valids, half_width):
    """K coverage masks from ONE distance pass. pts (P, 2); seg_a/b (N, 2);
    valids (K, N) bool; half_width scalar or (N,) -> (K, P) bool.

    The distance-to-segment math is ~20 VPU flops per (segment, pixel) pair
    and dominates the raster cost; callers that need several masks over the
    same geometry (solid vs broken lane markings) must not pay it twice."""
    N = seg_a.shape[0]
    K = valids.shape[0]
    hw = jnp.broadcast_to(jnp.asarray(half_width, jnp.float32), (N,))

    def chunk_masks(a, b, v, h):
        ab = b - a
        denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)
        rel = pts[None, :, :] - a[:, None, :]
        t = jnp.clip(
            jnp.einsum("npc,nc->np", rel, ab) / denom[:, None], 0.0, 1.0
        )
        proj = a[:, None, :] + t[..., None] * ab[:, None, :]
        d = jnp.linalg.norm(pts[None] - proj, axis=-1)          # (C, P)
        cov = d <= h[:, None]                                   # (C, P)
        return jnp.any(cov[None] & v[:, :, None], axis=1)       # (K, P)

    if N <= SEG_CHUNK:
        return chunk_masks(seg_a, seg_b, valids, hw)

    pad = (-N) % SEG_CHUNK
    a = jnp.pad(seg_a, ((0, pad), (0, 0)))
    b = jnp.pad(seg_b, ((0, pad), (0, 0)))
    v = jnp.pad(valids, ((0, 0), (0, pad)))
    h = jnp.pad(hw, (0, pad))
    n_chunks = (N + pad) // SEG_CHUNK
    chunks = (
        a.reshape(n_chunks, SEG_CHUNK, 2),
        b.reshape(n_chunks, SEG_CHUNK, 2),
        v.reshape(K, n_chunks, SEG_CHUNK).swapaxes(0, 1),
        h.reshape(n_chunks, SEG_CHUNK),
    )

    def body(acc, ch):
        ca, cb, cv, chw = ch
        return acc | chunk_masks(ca, cb, cv, chw), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((K, pts.shape[0]), bool), chunks
    )
    return out


def _tl_value_images(pts, town: TownMap, vals, half_width):
    """Traffic-light stop-line paint, one distance pass shared across all
    history frames AND light states. vals (Hh, L) is the paint value of each
    stop line per history frame (0 = unlit/invalid); the composed image is
    max over lights of coverage * value -> (Hh, P) float.

    Max-composition is exactly the reference's sequential green->yellow->red
    overwrite (chauffeurnet.py paint order) because the paint values are
    strictly increasing in that order (80 < 170 < 255)."""
    seg_a, seg_b = town.tl_stopline[:, 0], town.tl_stopline[:, 1]
    N = seg_a.shape[0]
    Hh = vals.shape[0]
    hw = jnp.broadcast_to(jnp.asarray(half_width, jnp.float32), (N,))

    def chunk_img(a, b, v, h):
        ab = b - a
        denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)
        rel = pts[None, :, :] - a[:, None, :]
        t = jnp.clip(
            jnp.einsum("npc,nc->np", rel, ab) / denom[:, None], 0.0, 1.0
        )
        proj = a[:, None, :] + t[..., None] * ab[:, None, :]
        d = jnp.linalg.norm(pts[None] - proj, axis=-1)          # (C, P)
        cov = (d <= h[:, None]).astype(jnp.float32)             # (C, P)
        return jnp.max(v[:, :, None] * cov[None], axis=1)       # (Hh, P)

    if N <= SEG_CHUNK:
        return chunk_img(seg_a, seg_b, vals, hw)

    pad = (-N) % SEG_CHUNK
    a = jnp.pad(seg_a, ((0, pad), (0, 0)))
    b = jnp.pad(seg_b, ((0, pad), (0, 0)))
    v = jnp.pad(vals, ((0, 0), (0, pad)))
    h = jnp.pad(hw, (0, pad))
    n_chunks = (N + pad) // SEG_CHUNK
    chunks = (
        a.reshape(n_chunks, SEG_CHUNK, 2),
        b.reshape(n_chunks, SEG_CHUNK, 2),
        v.reshape(Hh, n_chunks, SEG_CHUNK).swapaxes(0, 1),
        h.reshape(n_chunks, SEG_CHUNK),
    )

    def body(acc, ch):
        ca, cb, cv, chw = ch
        return jnp.maximum(acc, chunk_img(ca, cb, cv, chw)), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((Hh, pts.shape[0])), chunks
    )
    return out


# ---------------------------------------------------------------------------
# Tiled rendering. The flat path above tests every pixel against every culled
# primitive (1024 road + 1024 lane segments, 256 stop lines, 136 actors x 4
# history frames) — ~108 M pair-ops per observation, ~93% of the Config-5
# benchmark macro step. A 48 x 48 px tile spans only 9.6 m; the primitives
# within its reach are a small, position-dependent subset (measured on
# imported Town05 along the Long routes: <= ~120 road / ~130 lane segments
# per tile). Culling per tile with a conservative bound (midpoint distance
# minus half-length minus half-width) and a top_k keep is exact whenever the
# per-tile capacity exceeds the true overlap count — validated with 2x
# headroom on the real towns by tests/test_birdview_tiling.py. This is the
# density-robust redesign of the K_CAP-limited Pallas kernel (which silently
# dropped layers on Town05); pure XLA, ~4x fewer pair-ops.

TILE_PX = 48      # tile side in px; 192/48 -> 4x4 = 16 tiles
TILE_SEG_K = 256  # per-tile road/lane segment capacity after the cull
TILE_TL_K = 64    # per-tile stop-line capacity
TILE_BOX_K = 48   # per-tile actor-box capacity (per history frame)
TILE_ROUTE_K = 48 # per-tile route-polyline segment capacity


def _to_tiles(img_pts, tile):
    """(W, W, C) -> (T, tile*tile, C) tile-major."""
    W = img_pts.shape[0]
    g = W // tile
    x = img_pts.reshape(g, tile, g, tile, -1)
    return x.transpose(0, 2, 1, 3, 4).reshape(g * g, tile * tile, -1)


def _tiles_to_image(tiled, W, tile):
    """(..., T, tile*tile) -> (..., W, W)."""
    g = W // tile
    lead = tiled.shape[:-2]
    x = tiled.reshape(*lead, g, g, tile, tile)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, W, W)


def _tile_reach_m(cfg: BirdviewConfig) -> float:
    """Farthest distance a tile pixel sits from the tile center (+ margin)."""
    side = TILE_PX / cfg.pixels_per_meter
    return float(side * (2.0**0.5) / 2.0 + 0.25)


def _tile_cull(centers, bound_d, K):
    """Keep the K smallest-bound primitives per tile. bound_d (T, N) is a
    conservative lower bound on the distance from the tile center to any
    covered point (inf = invalid). Returns (idx (T, K), kept_d (T, K))."""
    N = bound_d.shape[1]
    if N <= K:
        idx = jnp.broadcast_to(jnp.arange(N), (bound_d.shape[0], N))
        return idx, bound_d
    neg, idx = jax.lax.top_k(-bound_d, K)
    return idx, -neg


def _seg_bound(centers, seg_a, seg_b, hw, valid):
    """(T, N) conservative distance bound from tile centers to thick
    segments: |center - midpoint| - half_length - half_width."""
    mid = 0.5 * (seg_a + seg_b)
    half = 0.5 * jnp.linalg.norm(seg_b - seg_a, axis=-1) + hw
    d = jnp.linalg.norm(centers[:, None, :] - mid[None], axis=-1) - half[None]
    return jnp.where(valid[None], d, jnp.inf)


def _tiled_seg_masks(pts_t, centers, reach, seg_a, seg_b, half_width,
                     valids, K):
    """Boolean coverage per valid-row, tiled. pts_t (T, Pt, 2); valids
    (R, N) rows sharing the segment geometry -> (R, T, Pt) bool."""
    N = seg_a.shape[0]
    hw = jnp.broadcast_to(jnp.asarray(half_width, jnp.float32), (N,))
    idx, kept_d = _tile_cull(
        centers, _seg_bound(centers, seg_a, seg_b, hw, jnp.any(valids, 0)), K
    )
    sa = seg_a[idx]                                   # (T, K, 2)
    sb = seg_b[idx]
    h = hw[idx]
    v = valids[:, idx] & (kept_d <= reach)[None]      # (R, T, K)

    ab = sb - sa
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)   # (T, K)
    rel = pts_t[:, None, :, :] - sa[:, :, None, :]    # (T, K, Pt, 2)
    t = jnp.clip(
        jnp.einsum("tkpc,tkc->tkp", rel, ab) / denom[..., None], 0.0, 1.0
    )
    proj = sa[:, :, None, :] + t[..., None] * ab[:, :, None, :]
    d = jnp.linalg.norm(pts_t[:, None] - proj, axis=-1)   # (T, K, Pt)
    cov = d <= h[..., None]
    return jnp.any(cov[None] & v[..., None], axis=2)      # (R, T, Pt)


def _tiled_tl_images(pts_t, centers, reach, town: TownMap, vals, half_width):
    """Tiled version of _tl_value_images: vals (Hh, L) per-frame paint value
    of each stop line -> (Hh, T, Pt) float."""
    seg_a, seg_b = town.tl_stopline[:, 0], town.tl_stopline[:, 1]
    N = seg_a.shape[0]
    hw = jnp.broadcast_to(jnp.asarray(half_width, jnp.float32), (N,))
    any_lit = jnp.any(vals > 0.0, axis=0)
    idx, kept_d = _tile_cull(
        centers, _seg_bound(centers, seg_a, seg_b, hw, any_lit), TILE_TL_K
    )
    sa, sb, h = seg_a[idx], seg_b[idx], hw[idx]
    v = vals[:, idx] * (kept_d <= reach)[None]            # (Hh, T, K)

    ab = sb - sa
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)
    rel = pts_t[:, None, :, :] - sa[:, :, None, :]
    t = jnp.clip(
        jnp.einsum("tkpc,tkc->tkp", rel, ab) / denom[..., None], 0.0, 1.0
    )
    proj = sa[:, :, None, :] + t[..., None] * ab[:, :, None, :]
    d = jnp.linalg.norm(pts_t[:, None] - proj, axis=-1)
    cov = (d <= h[..., None]).astype(jnp.float32)          # (T, K, Pt)
    return jnp.max(v[..., None] * cov[None], axis=2)       # (Hh, T, Pt)


def _tiled_boxes_mask(pts_t, centers, reach, pose, active,
                      min_extent=0.0, scale=1.0):
    """Tiled OBB coverage: pose (N, 5), active (N,) -> (T, Pt) bool."""
    ext = jnp.maximum(pose[:, 3:5] * scale, min_extent)    # (N, 2)
    rad = jnp.linalg.norm(ext, axis=-1)
    d = (
        jnp.linalg.norm(centers[:, None, :] - pose[None, :, :2], axis=-1)
        - rad[None]
    )
    d = jnp.where(active[None], d, jnp.inf)
    idx, kept_d = _tile_cull(centers, d, TILE_BOX_K)
    p = pose[idx]                                          # (T, K, 5)
    a = active[idx] & (kept_d <= reach)                    # (T, K)

    pos, yaw = p[..., :2], p[..., 2]
    e = jnp.maximum(p[..., 3:5] * scale, min_extent)
    rel = pts_t[:, None, :, :] - pos[:, :, None, :]        # (T, K, Pt, 2)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[..., None] + rel[..., 1] * s[..., None]
    ly = -rel[..., 0] * s[..., None] + rel[..., 1] * c[..., None]
    inside = (
        (jnp.abs(lx) <= e[..., 0][..., None])
        & (jnp.abs(ly) <= e[..., 1][..., None])
        & a[..., None]
    )
    return jnp.any(inside, axis=1)                         # (T, Pt)


def _history_slot(hist: HistoryState, idx: int):
    """Ring slot for negative history index (-1 = latest); clamps to the
    oldest available entry like chauffeurnet.py:_get_history_masks."""
    Hh = hist.veh_pose.shape[0]
    clamped = jnp.maximum(jnp.asarray(idx), -hist.count)
    return jnp.mod(hist.ptr + clamped, Hh)


def render_birdview_flat(
    cfg: BirdviewConfig,
    town: TownMap,
    ego_pos,
    ego_yaw,
    hist: HistoryState,
    route_window,          # (n_route_points, 2) world xy of upcoming waypoints
    stop_pose=None,        # optional (NS, 5) active stop-sign boxes
    stop_active=None,
):
    """Untiled reference path: every pixel against every culled primitive.
    Kept as the correctness oracle for render_birdview (the tiled default);
    tests assert bitwise-equal outputs. -> (n_channels, W, W) in [0, 1]."""
    W = cfg.width
    pts2d = _pixel_world_coords(cfg, ego_pos, ego_yaw)       # (W, W, 2)
    pts = pts2d.reshape(-1, 2)                               # (P, 2)

    # static channels from the analytic segment geometry (TownMap.road_segs /
    # lane_segs). Rationale: gathering 3 rasters x 4 bilinear taps for every
    # BEV pixel costs ~240 ms per 64-world batch on TPU (gathers from a
    # megapixel table don't vectorize), while distance-to-segment coverage of
    # the same layers costs ~1 ms of pure VPU math.
    reach = _bev_reach_m(cfg)
    road_segs, road_valid = _cull_segments(
        town.road_segs, town.road_seg_valid, ego_pos, reach
    )
    c_road = (
        _segments_mask(
            pts, road_segs[:, 0:2], road_segs[:, 2:4],
            road_valid, road_segs[:, 4],
        )
        .reshape(W, W)
        .astype(jnp.float32)
    )
    lane_segs, lane_v = _cull_segments(
        town.lane_segs, town.lane_seg_valid, ego_pos, reach
    )
    lane_solid, lane_broken = _segments_mask_multi(
        pts, lane_segs[:, 0:2], lane_segs[:, 2:4],
        jnp.stack([lane_v & (lane_segs[:, 5] < 0.5),
                   lane_v & (lane_segs[:, 5] >= 0.5)]),
        lane_segs[:, 4],
    )
    # broken-white segments render at 120/255 (chauffeurnet.py:171-173)
    c_lane = jnp.where(
        lane_broken, LANE_BROKEN_VALUE, lane_solid.astype(jnp.float32)
    ).reshape(W, W)

    # route channel: thick polyline over the next n_route_points waypoints
    seg_a = route_window[:-1]
    seg_b = route_window[1:]
    seg_valid = jnp.ones((seg_a.shape[0],), bool)
    half_w_m = cfg.route_thickness / cfg.pixels_per_meter
    c_route = (
        _segments_mask(pts, seg_a, seg_b, seg_valid, half_w_m)
        .reshape(W, W)
        .astype(jnp.float32)
    )

    veh_ch, wlk_ch, tl_vals = [], [], []
    for idx in cfg.history_idx:
        slot = _history_slot(hist, idx)
        veh = _boxes_mask(pts, hist.veh_pose[slot], hist.veh_active[slot],
                          min_extent=0.8 if cfg.scale_bbox else 0.0, scale=1.0)
        wlk = _boxes_mask(pts, hist.wlk_pose[slot], hist.wlk_active[slot],
                          min_extent=0.8 if cfg.scale_bbox else 0.0,
                          scale=2.0 if cfg.scale_bbox else 1.0)
        veh_ch.append(veh.reshape(W, W).astype(jnp.float32))
        wlk_ch.append(wlk.reshape(W, W).astype(jnp.float32))

        # per-history paint value of each stop line (0 = unlit/invalid);
        # the geometry pass below is shared across history frames/colors
        tls = hist.tl_state[slot]
        v = jnp.where(tls == TL_GREEN, TL_GREEN_VALUE, 0.0)
        v = jnp.where(tls == TL_YELLOW, TL_YELLOW_VALUE, v)
        v = jnp.where(tls == TL_RED, TL_RED_VALUE, v)
        tl_vals.append(jnp.where(town.tl_valid, v, 0.0))

    # traffic lights: ONE distance pass over the stop lines for all history
    # frames and all three colors (was 12 passes — the single largest raster
    # cost at 256-light capacity)
    half_tl_m = cfg.stopline_thickness / cfg.pixels_per_meter
    tl_imgs = _tl_value_images(pts, town, jnp.stack(tl_vals), half_tl_m)
    if stop_pose is not None:
        # active stop signs paint at the red value into every history frame
        # (stop_pose/stop_active are current-state, identical per frame)
        sm = _boxes_mask(pts, stop_pose, stop_active)
        tl_imgs = jnp.where(sm[None], 1.0, tl_imgs)
    tl_ch = [tl_imgs[i].reshape(W, W) for i in range(len(cfg.history_idx))]

    return jnp.stack(
        [c_road, c_route, c_lane, *veh_ch, *wlk_ch, *tl_ch], axis=0
    )


def render_birdview(
    cfg: BirdviewConfig,
    town: TownMap,
    ego_pos,
    ego_yaw,
    hist: HistoryState,
    route_window,
    stop_pose=None,
    stop_active=None,
):
    """Tile-culled renderer (default): identical output to
    render_birdview_flat at ~4x fewer pair-ops. -> (n_channels, W, W)."""
    W = cfg.width
    pts2d = _pixel_world_coords(cfg, ego_pos, ego_yaw)       # (W, W, 2)
    pts_t = _to_tiles(pts2d, TILE_PX)                        # (T, Pt, 2)
    centers = pts_t.mean(axis=1)                             # (T, 2)
    t_reach = _tile_reach_m(cfg)
    reach = _bev_reach_m(cfg)

    road_segs, road_valid = _cull_segments(
        town.road_segs, town.road_seg_valid, ego_pos, reach
    )
    (road_t,) = _tiled_seg_masks(
        pts_t, centers, t_reach, road_segs[:, 0:2], road_segs[:, 2:4],
        road_segs[:, 4], road_valid[None], TILE_SEG_K,
    )
    c_road = _tiles_to_image(road_t, W, TILE_PX).astype(jnp.float32)

    lane_segs, lane_v = _cull_segments(
        town.lane_segs, town.lane_seg_valid, ego_pos, reach
    )
    lane_solid, lane_broken = _tiled_seg_masks(
        pts_t, centers, t_reach, lane_segs[:, 0:2], lane_segs[:, 2:4],
        lane_segs[:, 4],
        jnp.stack([lane_v & (lane_segs[:, 5] < 0.5),
                   lane_v & (lane_segs[:, 5] >= 0.5)]),
        TILE_SEG_K,
    )
    c_lane = _tiles_to_image(
        jnp.where(lane_broken, LANE_BROKEN_VALUE,
                  lane_solid.astype(jnp.float32)),
        W, TILE_PX,
    )

    seg_a, seg_b = route_window[:-1], route_window[1:]
    half_w_m = cfg.route_thickness / cfg.pixels_per_meter
    (route_t,) = _tiled_seg_masks(
        pts_t, centers, t_reach, seg_a, seg_b, half_w_m,
        jnp.ones((1, seg_a.shape[0]), bool), TILE_ROUTE_K,
    )
    c_route = _tiles_to_image(route_t, W, TILE_PX).astype(jnp.float32)

    veh_ch, wlk_ch, tl_vals = [], [], []
    for idx in cfg.history_idx:
        slot = _history_slot(hist, idx)
        veh = _tiled_boxes_mask(
            pts_t, centers, t_reach, hist.veh_pose[slot],
            hist.veh_active[slot],
            min_extent=0.8 if cfg.scale_bbox else 0.0, scale=1.0,
        )
        wlk = _tiled_boxes_mask(
            pts_t, centers, t_reach, hist.wlk_pose[slot],
            hist.wlk_active[slot],
            min_extent=0.8 if cfg.scale_bbox else 0.0,
            scale=2.0 if cfg.scale_bbox else 1.0,
        )
        veh_ch.append(_tiles_to_image(veh, W, TILE_PX).astype(jnp.float32))
        wlk_ch.append(_tiles_to_image(wlk, W, TILE_PX).astype(jnp.float32))

        tls = hist.tl_state[slot]
        v = jnp.where(tls == TL_GREEN, TL_GREEN_VALUE, 0.0)
        v = jnp.where(tls == TL_YELLOW, TL_YELLOW_VALUE, v)
        v = jnp.where(tls == TL_RED, TL_RED_VALUE, v)
        tl_vals.append(jnp.where(town.tl_valid, v, 0.0))

    half_tl_m = cfg.stopline_thickness / cfg.pixels_per_meter
    tl_t = _tiled_tl_images(
        pts_t, centers, t_reach, town, jnp.stack(tl_vals), half_tl_m
    )                                                        # (Hh, T, Pt)
    if stop_pose is not None:
        sm = jnp.stack([
            _tiled_boxes_mask(pts_t, centers, t_reach, stop_pose, stop_active)
        ])                                                   # (1, T, Pt)
        tl_t = jnp.where(sm, 1.0, tl_t)
    tl_imgs = _tiles_to_image(tl_t, W, TILE_PX)
    tl_ch = [tl_imgs[i] for i in range(len(cfg.history_idx))]

    return jnp.stack(
        [c_road, c_route, c_lane, *veh_ch, *wlk_ch, *tl_ch], axis=0
    )


def render_birdview_rgb(cfg: BirdviewConfig, masks, ego_extent=None):
    """Compose the channel stack into the ObsManager debug RGB image
    (chauffeurnet.py:143-166 'rendered', tint-faded history). masks
    (C, W, W) in [0,1] -> (W, W, 3) float RGB in [0,1]."""
    W = cfg.width
    img = jnp.zeros((W, W, 3))

    def paint(img, mask, color, alpha=1.0):
        c = jnp.asarray(color) / 255.0
        return jnp.where(mask[..., None] > 0.1, c * alpha + img * 0, img)

    img = paint(img, masks[0], (83, 87, 83))          # road (ALUMINIUM_5)
    img = paint(img, masks[1], (136, 138, 133))       # route (ALUMINIUM_3)
    img = paint(img, masks[2], (255, 0, 255))         # lanes (MAGENTA)
    h_len = len(cfg.history_idx) - 1
    for i in range(len(cfg.history_idx)):
        fade = 1.0 - 0.2 * (h_len - i)
        img = paint(img, masks[3 + i], (0, 0, 255), fade)            # vehicles
        img = paint(img, masks[3 + len(cfg.history_idx) + i], (0, 255, 255), fade)  # walkers
        tl = masks[3 + 2 * len(cfg.history_idx) + i]
        img = paint(img, (tl > 0.25) & (tl < 0.4), (0, 255, 0), fade)    # green
        img = paint(img, (tl > 0.6) & (tl < 0.75), (255, 255, 0), fade)  # yellow
        img = paint(img, tl > 0.9, (255, 0, 0), fade)                    # red
    # ego box in white at the canonical position
    if ego_extent is not None:
        r0 = W - cfg.pixels_ev_to_bottom
        ppm = cfg.pixels_per_meter
        ex = int(float(ego_extent[0]) * ppm)
        ey = int(float(ego_extent[1]) * ppm)
        img = img.at[r0 - ex : r0 + ex, W // 2 - ey : W // 2 + ey].set(1.0)
    return img


def birdview_from_state(cfg: BirdviewConfig, town: TownMap, state: WorldState,
                        use_pallas: bool | None = None):
    """Convenience wrapper: observation for the current WorldState, using the
    upcoming route window from the criteria's route index (route_plan[0:80]
    in chauffeurnet.get_observation).

    On TPU the tile-culled Pallas kernel renders the stack (exact parity,
    ~2.6x faster — ops/birdview_pallas.py); elsewhere the XLA path runs."""
    idx = state.criteria.route_idx
    offs = jnp.arange(cfg.n_route_points)
    win = jnp.clip(idx + offs, 0, state.route.shape[0] - 1)
    route_window = state.route[win, :2]

    # active stop signs render into the TL channel at the red value
    # (chauffeurnet.py:179 c_tl[stop_masks]=255): a stop is active while the
    # ego is near it and has not completed the stop (criteria state machine)
    d_stop = jnp.linalg.norm(town.stop_pos - state.ego.pos[None], axis=-1)
    stop_active = (
        town.stop_valid
        & ~state.criteria.stop_has_stopped
        & (d_stop < 30.0)
    )
    ns = town.stop_pos.shape[0]
    stop_pose = jnp.concatenate(
        [
            town.stop_pos,
            town.stop_yaw[:, None],
            jnp.tile(jnp.asarray([[0.6, 2.8]]), (ns, 1)),
        ],
        axis=-1,
    )

    if use_pallas is None:
        # Default to the exact tile-culled XLA path (render_birdview): per
        # 48 x 48 px tile, a top_k cull keeps the nearest primitives with
        # >= 2x measured headroom on the real towns, so the output is
        # bitwise-equal to the flat path (tests/test_birdview_tiling.py).
        # The legacy Pallas kernel holds at most K_CAP primitives per
        # (8 x 128)-pixel tile; imported Town05 reaches ~430 road+lane
        # segments per such tile, so the cap silently dropped the route /
        # traffic-light / actor layers — opt in only where the town's
        # density is known to fit (procedural grids).
        use_pallas = False
    if use_pallas:
        from thinktwice_tpu.ops.birdview_pallas import render_birdview_pallas

        return render_birdview_pallas(
            cfg, town, state.ego.pos, state.ego.yaw, state.history,
            route_window, stop_pose=stop_pose, stop_active=stop_active,
        )
    return render_birdview(
        cfg, town, state.ego.pos, state.ego.yaw, state.history, route_window,
        stop_pose=stop_pose, stop_active=stop_active,
    )
