"""Tiny pure numpy/Python reference implementations — the per-vertex
fixtures the north rule compares against (FIXTURES.md F4; golden-value
style like the reference's successor-list tests,
/root/reference/src/ascii_graph/tests.rs:41-122).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_np(
    n: int, src: np.ndarray, dst: np.ndarray,
    alpha: float = 0.85, tol: float = 1e-6, max_iter: int = 100,
) -> np.ndarray:
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    r = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iter):
        dang = r[dangling].sum()
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, r[src] / outdeg[src])
        new = (1.0 - alpha) / n + alpha * (contrib + dang / n)
        delta = np.abs(new - r).sum()
        r = new
        if delta <= tol:
            break
    return r


def components_np(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Union-find; component id = min vertex id in component."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src.tolist(), dst.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        out[i] = find(i)
    return out


def label_prop_np(
    n: int, src: np.ndarray, dst: np.ndarray, max_iter: int = 10
) -> np.ndarray:
    """Synchronous LP, tie -> min label, isolated keep own."""
    nbrs = defaultdict(list)
    for u, v in zip(src.tolist(), dst.tolist()):
        if u != v:
            nbrs[u].append(v)
            nbrs[v].append(u)
    nbrs = {k: sorted(set(vs)) for k, vs in nbrs.items()}
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            ns = nbrs.get(v)
            if not ns:
                continue
            cnt = Counter(int(labels[u]) for u in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
        if (new == labels).all():
            labels = new
            break
        labels = new
    return labels


def triangles_np(n: int, src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, int]:
    """Exact per-vertex triangle counts on the underlying undirected graph."""
    adj = defaultdict(set)
    for u, v in zip(src.tolist(), dst.tolist()):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    counts = np.zeros(n, dtype=np.int64)
    total = 0
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:
                    counts[u] += 1
                    counts[v] += 1
                    counts[w] += 1
                    total += 1
    return counts, total
