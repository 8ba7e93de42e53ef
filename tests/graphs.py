"""Deterministic graph fixtures (FIXTURES.md §2) + pure-Python oracles
(FIXTURES.md §6). Oracles are intentionally naive — dense NumPy /
dict-loop implementations, the 'oracle = naive reimplementation' style
of the reference's own tests (test-unit/queue.lua:32-45)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

# --------------------------- fixtures --------------------------------

TOY7 = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
    ("e", "d"), ("f", "g"), ("g", "f"), ("a", "d"),
]

CLIQUE_BRIDGE = (
    # K5 on v0..v4 (10 triangles) + K4 on w0..w3 (4) + bridge v0-w0 (0)
    [(f"v{i}", f"v{j}") for i in range(5) for j in range(i + 1, 5)]
    + [(f"w{i}", f"w{j}") for i in range(4) for j in range(i + 1, 4)]
    + [("v0", "w0")]
)

DANGLING_CHAIN = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "e")]
# d and e are sinks (out-degree 0) -> dangling mass


def two_components(seed=42, n=50, p=0.1):
    rng = np.random.default_rng(seed)
    edges = []
    for block, offset in (("x", 0), ("y", 1000)):
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < p:
                    edges.append((f"{block}{offset + i}", f"{block}{offset + j}"))
        # guarantee connectivity inside the block
        for i in range(n - 1):
            edges.append((f"{block}{offset + i}", f"{block}{offset + i + 1}"))
    return edges


def powerlaw_hub(seed=42, n=2000):
    """Zipf out-degree + 3 forced hubs absorbing >=20% of edges."""
    rng = np.random.default_rng(seed)
    edges = set()
    for i in range(n):
        deg = min(int(rng.zipf(2.0)), 20)
        for _ in range(deg):
            t = int(rng.integers(0, n))
            if t != i:
                edges.add((f"n{i}", f"n{t}"))
    base = len(edges)
    hubs = ["n0", "n1", "n2"]
    need = max(1, int(0.25 * base) // 3)
    for h_i, h in enumerate(hubs):
        for k in range(need):
            s = f"n{(k * 7 + h_i + 3) % n}"
            if s != h:
                edges.add((s, h))
    return sorted(edges)


# --------------------------- oracles ---------------------------------

def pagerank_oracle(pairs, d=0.85, tol=1e-9, max_iter=10_000, k=None):
    """Dense power iteration; dangling mass uniform. Returns {id: rank}.
    If k is given, runs exactly k iterations (no tolerance stop)."""
    nodes = sorted({x for e in pairs for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = defaultdict(set)
    for s, t in pairs:
        out[s].add(t)
    r = np.full(n, 1.0 / n)
    iters = k if k is not None else max_iter
    for _ in range(iters):
        nxt = np.zeros(n)
        dm = 0.0
        for v in nodes:
            if out[v]:
                share = r[idx[v]] / len(out[v])
                for t in out[v]:
                    nxt[idx[t]] += share
            else:
                dm += r[idx[v]]
        new = (1 - d) / n + d * (nxt + dm / n)
        delta = np.abs(new - r).max()
        r = new
        if k is None and delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}


def components_oracle(pairs):
    """Union-find; component label = lexicographic min id. {id: label}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = defaultdict(list)
    for v in list(parent):
        groups[find(v)].append(v)
    out = {}
    for members in groups.values():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


def lpa_oracle(pairs, max_iter=10):
    """Synchronous LPA, mode of neighbor labels, ties -> min label,
    isolated-in-graph vertices keep label. {id: label}."""
    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = {v: v for v in nbrs}
    for _ in range(max_iter):
        new = {}
        changed = 0
        for v in labels:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            new[v] = best
            if best != labels[v]:
                changed += 1
        labels = new
        if changed == 0:
            break
    return labels


def triangles_oracle(pairs):
    """Global + per-vertex via adjacency-set combination counting."""
    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    per = Counter()
    total = 0
    nodes = sorted(nbrs)
    for v in nodes:
        for u in nbrs[v]:
            if u <= v:
                continue
            for w in nbrs[v] & nbrs[u]:
                if w > u:
                    total += 1
                    per[v] += 1
                    per[u] += 1
                    per[w] += 1
    return total, {v: per.get(v, 0) for v in nodes}


def maxprop_oracle(pairs, values):
    """Per-component (undirected) max of initial values. {id: max}."""
    comp = components_oracle(pairs)
    best = defaultdict(lambda: -(10**18))
    for v, lbl in comp.items():
        best[lbl] = max(best[lbl], values.get(v, 0))
    return {v: best[lbl] for v, lbl in comp.items()}
