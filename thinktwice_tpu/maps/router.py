"""Lane-graph routing: A* waypoint planner + random route generation.

≡ agents/navigation/global_route_planner.py:20-387 (networkx A* over the
CARLA lane topology, used by interpolate_trajectory for dense eval routes)
and dataset/tools/generate_random_routes.py (random spawn-pair routes for
collection). Host-side numpy, like the reference's planners; the output
polylines feed the in-graph route followers.

The graph is built from the TownMap lane network: nodes = lane waypoints,
edges = successor links plus "lane-change / junction" links between nearby,
heading-aligned waypoints of different lanes — which is what makes routing
across the reference's disjoint lane loops possible.
"""

from __future__ import annotations

import heapq

import numpy as np

from thinktwice_tpu.maps.town import TownMap


class LaneGraph:
    def __init__(self, pts: np.ndarray, yaw: np.ndarray, adj: list[list[tuple[int, float]]]):
        self.pts = pts
        self.yaw = yaw
        self.adj = adj

    def nearest(self, xy) -> int:
        return int(np.argmin(np.linalg.norm(self.pts - np.asarray(xy)[None], axis=1)))


def build_graph(town: TownMap, link_radius: float = 6.0,
                heading_tol: float = np.deg2rad(75.0)) -> LaneGraph:
    valid = np.asarray(town.lane_valid)
    pts = np.asarray(town.lane_pts)[valid]
    yaw = np.asarray(town.lane_yaw)[valid]
    nxt_all = np.asarray(town.lane_next)
    # remap successor indices into the compacted valid set
    remap = -np.ones(len(valid), int)
    remap[np.nonzero(valid)[0]] = np.arange(valid.sum())
    nxt = remap[nxt_all[valid]]

    n = len(pts)
    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for i in range(n):
        j = int(nxt[i])
        if j >= 0:
            adj[i].append((j, float(np.linalg.norm(pts[j] - pts[i]))))

    # cross links: nearby waypoints with compatible heading (lane changes and
    # junction hops). Grid hash for O(n) neighborhood queries.
    cell = link_radius
    grid: dict[tuple[int, int], list[int]] = {}
    for i, p in enumerate(pts):
        grid.setdefault((int(p[0] // cell), int(p[1] // cell)), []).append(i)
    for i, p in enumerate(pts):
        cx, cy = int(p[0] // cell), int(p[1] // cell)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in grid.get((cx + dx, cy + dy), ()):
                    if j == i or j == int(nxt[i]):
                        continue
                    d = float(np.linalg.norm(pts[j] - pts[i]))
                    if d > link_radius or d < 0.5:
                        continue
                    dyaw = abs(np.arctan2(np.sin(yaw[j] - yaw[i]),
                                          np.cos(yaw[j] - yaw[i])))
                    if dyaw < heading_tol:
                        # the target must lie roughly ahead of i
                        fwd = np.asarray([np.cos(yaw[i]), np.sin(yaw[i])])
                        if np.dot(pts[j] - pts[i], fwd) > 0.0:
                            adj[i].append((j, d * 1.5))  # mild lane-change cost
    return LaneGraph(pts, yaw, adj)


def plan_route(graph: LaneGraph, start_xy, goal_xy) -> np.ndarray | None:
    """A* shortest path -> (K, 3) polyline (x, y, yaw) or None."""
    s = graph.nearest(start_xy)
    g = graph.nearest(goal_xy)
    goal_p = graph.pts[g]

    dist = {s: 0.0}
    prev: dict[int, int] = {}
    pq = [(float(np.linalg.norm(graph.pts[s] - goal_p)), s)]
    visited = set()
    while pq:
        _, u = heapq.heappop(pq)
        if u == g:
            break
        if u in visited:
            continue
        visited.add(u)
        for v, w in graph.adj[u]:
            nd = dist[u] + w
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                prev[v] = u
                h = float(np.linalg.norm(graph.pts[v] - goal_p))
                heapq.heappush(pq, (nd + h, v))
    if g not in dist:
        return None
    path = [g]
    while path[-1] != s:
        path.append(prev[path[-1]])
    path.reverse()
    pts = graph.pts[path]
    yaw = graph.yaw[path]
    return np.concatenate([pts, yaw[:, None]], axis=1).astype(np.float32)


def generate_random_routes(
    town: TownMap,
    n_routes: int,
    min_length: float = 100.0,
    max_length: float = 1500.0,
    seed: int = 0,
    max_tries: int = 200,
) -> list[np.ndarray]:
    """Random spawn-pair routes ≡ generate_random_routes.py (spawn pairs
    filtered by planned distance)."""
    graph = build_graph(town)
    spawns = np.asarray(town.spawn)[np.asarray(town.spawn_valid)]
    rng = np.random.RandomState(seed)
    routes = []
    tries = 0
    while len(routes) < n_routes and tries < max_tries:
        tries += 1
        a, b = spawns[rng.randint(len(spawns))], spawns[rng.randint(len(spawns))]
        r = plan_route(graph, a[:2], b[:2])
        if r is None:
            continue
        length = float(np.linalg.norm(np.diff(r[:, :2], axis=0), axis=1).sum())
        if min_length <= length <= max_length:
            routes.append(r)
    return routes
