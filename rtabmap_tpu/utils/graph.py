"""Pose-graph toolbox: shortest paths, nearest nodes, radius filtering.

Capability parity: the reference's ``graph`` namespace utilities
(/root/reference/corelib/src/Graph.cpp — Dijkstra/A* ``computePath``
Graph.h:243-276, ``findNearestNodes``, ``radiusPosesFiltering``,
``getPosesInRadius``; metrics live in utils/metrics.py).
Host-side (graph bookkeeping is control-plane).
"""
from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def compute_path(poses: Dict[int, np.ndarray], links: Dict[int, Dict[int, float]],
                 start: int, goal: int,
                 updated_costs: bool = True) -> List[int]:
    """Dijkstra (A* with Euclidean heuristic when poses known) over the
    link topology; edge cost = link length. Returns node-id path
    (empty if unreachable)."""
    if start == goal:
        return [start]

    def h(n):
        if n in poses and goal in poses:
            return float(np.linalg.norm(poses[n][:3, 3] - poses[goal][:3, 3]))
        return 0.0

    dist = {start: 0.0}
    prev: Dict[int, int] = {}
    pq = [(h(start), start)]
    seen = set()
    while pq:
        _, u = heapq.heappop(pq)
        if u in seen:
            continue
        if u == goal:
            break
        seen.add(u)
        for v, w in links.get(u, {}).items():
            nd = dist[u] + w
            if v not in dist or nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(pq, (nd + h(v), v))
    if goal not in prev and goal != start:
        return []
    path = [goal]
    while path[-1] != start:
        path.append(prev[path[-1]])
    return path[::-1]


def links_to_adjacency(signatures) -> Dict[int, Dict[int, float]]:
    """Build {id: {neighbor: length}} from signature link dicts."""
    adj: Dict[int, Dict[int, float]] = {}
    for sid, sig in signatures.items():
        for j, lk in sig.links.items():
            d = float(np.linalg.norm(np.asarray(lk.transform)[:3, 3]))
            adj.setdefault(sid, {})[j] = d
            adj.setdefault(j, {})[sid] = d
    return adj


def find_nearest_nodes(target_pose: np.ndarray, poses: Dict[int, np.ndarray],
                       radius: float = 0.0, angle: float = 0.0,
                       k: int = 0) -> List[Tuple[int, float]]:
    """Nodes within radius (and optional view-angle cone) of the target
    pose, nearest first (reference: graph::findNearestNodes)."""
    tp = np.asarray(target_pose)
    out = []
    for i, P in poses.items():
        P = np.asarray(P)
        d = float(np.linalg.norm(P[:3, 3] - tp[:3, 3]))
        if radius > 0 and d > radius:
            continue
        if angle > 0:
            cosang = float(np.clip((np.trace(P[:3, :3].T @ tp[:3, :3]) - 1) / 2, -1, 1))
            if np.arccos(cosang) > angle:
                continue
        out.append((i, d))
    out.sort(key=lambda x: x[1])
    if k > 0:
        out = out[:k]
    return out


def radius_poses_filtering(poses: Dict[int, np.ndarray], radius: float,
                           angle: float = 0.0) -> List[int]:
    """Keep one node per radius neighborhood (reference:
    graph::radiusPosesFiltering — used by CleanupLocalGrids/ReduceGraph)."""
    ids = sorted(poses)
    kept: List[int] = []
    for i in ids:
        ok = True
        pi = np.asarray(poses[i])
        for j in kept:
            pj = np.asarray(poses[j])
            if np.linalg.norm(pi[:3, 3] - pj[:3, 3]) < radius:
                if angle <= 0:
                    ok = False
                    break
                cosang = float(np.clip((np.trace(pi[:3, :3].T @ pj[:3, :3]) - 1) / 2, -1, 1))
                if np.arccos(cosang) < angle:
                    ok = False
                    break
        if ok:
            kept.append(i)
    return kept


def connected_component(adj: Dict[int, Dict[int, float]], seed: int) -> List[int]:
    out = {seed}
    frontier = [seed]
    while frontier:
        u = frontier.pop()
        for v in adj.get(u, {}):
            if v not in out:
                out.add(v)
                frontier.append(v)
    return sorted(out)
