"""Test-only numpy oracle: float64 replica of the reference math.

Replicates the semantics of /root/reference/pagerank.py (WebGraph.__init__
:18-68, make_personalization_vector :81-97, power_method :100-139) without
torch, parameterized by normalization mode so it reproduces every golden
variant in FIXTURES.md §F1 (SURVEY.md §5.2 forensics). This module is the
oracle the engine must match to allclose 1e-6 — it is NOT engine code.
"""

from __future__ import annotations

import math
import re

import numpy as np

URL_FILTER_REGEX = re.compile(r".*((/$)|(/.*/)).*")  # pagerank.py:33


def ingest_edges(
    rows: list[tuple[str, str]],
    max_nnz: int | None = None,
    filter_ratio: float | None = None,
    apply_url_filter: bool = True,
):
    """Replica of WebGraph.__init__ pagerank.py:18-61.

    rows: (source, target) string pairs in file order.
    Returns (url_list  [index order = first appearance],
             edges     [(src_id, dst_id) surviving all filters, file order],
             weights   [1/outdeg run-length, pagerank.py:50-61])
    """
    url_dict: dict[str, int] = {}
    indices: list[tuple[int, int]] = []
    target_counts: dict[int, int] = {}

    def to_index(u: str) -> int:
        if u not in url_dict:
            url_dict[u] = len(url_dict)
        return url_dict[u]

    for i, (s, t) in enumerate(rows):
        if max_nnz is not None and i > max_nnz:  # note: ref caps raw rows, `i>max_nnz`
            break
        if apply_url_filter and (URL_FILTER_REGEX.match(s) or URL_FILTER_REGEX.match(t)):
            continue
        si = to_index(s)
        ti = to_index(t)
        target_counts[ti] = target_counts.get(ti, 0) + 1
        indices.append((si, ti))

    if filter_ratio is not None:
        n = len(url_dict)  # final dict size, pagerank.py:45
        indices = [(s, t) for (s, t) in indices if target_counts[t] < filter_ratio * n]

    # run-length out-degree weights (pagerank.py:50-61) — order-independent
    # equivalent: 1/outdeg(src) per edge (the ref relies on sorted input; we
    # compute the same values robustly).
    outdeg: dict[int, int] = {}
    for s, _ in indices:
        outdeg[s] = outdeg.get(s, 0) + 1
    weights = [1.0 / outdeg[s] for s, _ in indices]
    urls = [None] * len(url_dict)
    for u, i in url_dict.items():
        urls[i] = u
    return urls, indices, weights


def build_P(n: int, edges: list[tuple[int, int]], weights: list[float]) -> np.ndarray:
    """Dense float64 P with COO-duplicate additive coalescing (pagerank.py:63-67)."""
    P = np.zeros((n, n), dtype=np.float64)
    for (s, t), w in zip(edges, weights):
        P[s, t] += w
    return P


def personalization_vector(
    urls: list[str], matcher=None
) -> np.ndarray:
    """Replica of make_personalization_vector pagerank.py:81-97 (L1 normalize)."""
    n = len(urls)
    if matcher is None:
        v = np.ones(n, dtype=np.float64)
    else:
        v = np.array([1.0 if matcher(u) else 0.0 for u in urls], dtype=np.float64)
    s = v.sum()
    assert s > 0
    return v / s


def power_method(
    P: np.ndarray,
    v: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    norm_x: str = "l1",
    norm_v: str = "l2",
):
    """Replica of power_method pagerank.py:100-139, float64, param. norms.

    reference mode = (norm_x='l1', norm_v='l2'): pagerank.py:133 / :113.
    Returns (x, iterations, residuals).
    """
    n = P.shape[0]
    a = (P.sum(axis=1) == 0).astype(np.float64)  # dangling indicator :104-107

    if v is None:
        v = np.full(n, 1.0 / n, dtype=np.float64)  # :111
    v = v.astype(np.float64).copy()
    v /= np.linalg.norm(v, 2 if norm_v == "l2" else 1)  # :113 (torch.norm = L2)

    if x0 is None:
        x0 = np.full(n, 1.0 / math.sqrt(n), dtype=np.float64)  # :116
    x = x0.astype(np.float64).copy()
    x /= np.linalg.norm(x, 2)  # :118

    residuals: list[float] = []
    iters = 0
    for _ in range(max_iterations):
        iters += 1
        xprev = x.copy()
        d = float(x @ a)  # dangling mass :125
        q = (alpha * d + (1 - alpha)) * v  # :125
        x = alpha * (P.T @ x) + q  # :126-132
        x /= np.linalg.norm(x, 1 if norm_x == "l1" else 2)  # :133
        r = float(np.linalg.norm(x - xprev, 2))  # :134
        residuals.append(r)
        if r < epsilon:
            break
    return x, iters, residuals


def power_method_sparse(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    v: np.ndarray | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    norm_x: str = "l1",
    norm_v: str = "l2",
):
    """Sparse variant of power_method (same semantics) for n where a dense
    P is infeasible: Pᵀx via np.add.at gather-scatter. → (x, iters)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    has_out = np.zeros(n, dtype=bool)
    has_out[src] = True
    a = (~has_out).astype(np.float64)

    if v is None:
        v = np.full(n, 1.0 / n, dtype=np.float64)
    v = v.astype(np.float64).copy()
    v /= np.linalg.norm(v, 2 if norm_v == "l2" else 1)

    x = np.full(n, 1.0 / math.sqrt(n), dtype=np.float64)
    x /= np.linalg.norm(x, 2)

    iters = 0
    for _ in range(max_iterations):
        iters += 1
        xprev = x.copy()
        d = float(x @ a)
        q = (alpha * d + (1 - alpha)) * v
        pt_x = np.zeros(n, dtype=np.float64)
        np.add.at(pt_x, dst, w * x[src])
        x = alpha * pt_x + q
        x /= np.linalg.norm(x, 1 if norm_x == "l1" else 2)
        r = float(np.linalg.norm(x - xprev, 2))
        if r < epsilon:
            break
    return x, iters


def sparse_weights(src: np.ndarray) -> np.ndarray:
    """w = 1/outdeg(src) per edge (pagerank.py:50-61), vectorized."""
    src = np.asarray(src, dtype=np.int64)
    counts = np.bincount(src)
    return 1.0 / counts[src].astype(np.float64)


def pagerank_from_rows(
    rows: list[tuple[str, str]],
    alpha: float = 0.85,
    filter_ratio: float | None = None,
    max_nnz: int | None = None,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
    norm_x: str = "l1",
    norm_v: str = "l2",
    matcher=None,
    apply_url_filter: bool = True,
):
    """End-to-end replica: ingest → P → v → power_method. → (urls, x, iters)."""
    urls, edges, weights = ingest_edges(
        rows, max_nnz=max_nnz, filter_ratio=filter_ratio, apply_url_filter=apply_url_filter
    )
    P = build_P(len(urls), edges, weights)
    v = personalization_vector(urls, matcher) if (matcher or True) else None
    # reference always builds v via make_personalization_vector (L1) then
    # power_method re-normalizes (pagerank.py:283-284)
    x, iters, residuals = power_method(
        P,
        v=v,
        alpha=alpha,
        epsilon=epsilon,
        max_iterations=max_iterations,
        norm_x=norm_x,
        norm_v=norm_v,
    )
    return urls, x, iters
