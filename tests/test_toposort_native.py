"""The C++ toposort must agree with the Python Kahn implementation."""

import numpy as np
import pytest

import gswt_renderer_tpu.native as native


def _python_toposort(a, b, nodes, has_edge_only=True):
    from collections import deque

    nodes_set = set(nodes.tolist())
    succ = {n: set() for n in nodes_set}
    pred = {n: set() for n in nodes_set}
    has_edge = set()
    for x, y in zip(a.tolist(), b.tolist()):
        if y not in succ[x]:
            succ[x].add(y)
            pred[y].add(x)
            has_edge.add(x)
            has_edge.add(y)
    indeg = {n: len(pred[n]) for n in nodes_set}
    alive = set(nodes_set)
    removed = []
    order = []
    ready = deque(sorted(n for n in alive if indeg[n] == 0))
    while alive:
        while ready:
            n = ready.popleft()
            if n not in alive:
                continue
            alive.discard(n)
            order.append(n)
            for m in succ[n]:
                if m in alive:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
        if alive:
            victim = min(alive)
            removed.append(victim)
            alive.discard(victim)
            for m in succ[victim]:
                if m in alive:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
    out = [n for n in order if n in has_edge]
    out.extend(removed)
    out.reverse()
    return out


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="no C++ lib")
def test_toposort_matches_python_dag(rng):
    # random DAG: edges low -> high index
    n = 200
    nodes = np.arange(n, dtype=np.int32)
    a = rng.integers(0, n - 1, 600).astype(np.int32)
    b = (a + rng.integers(1, 20, 600).astype(np.int32)).clip(0, n - 1).astype(np.int32)
    m = a != b
    a, b = a[m], b[m]
    got = native.toposort(a, b, nodes, n).tolist()
    expect = _python_toposort(a, b, nodes)
    # FIFO tie order may differ between implementations; both must be valid
    # painter orders over the same node set
    assert sorted(got) == sorted(expect)
    pos = {v: i for i, v in enumerate(got)}
    for x, y in zip(a.tolist(), b.tolist()):
        assert pos[y] < pos[x]


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="no C++ lib")
def test_toposort_with_cycles(rng):
    nodes = np.arange(6, dtype=np.int32)
    # cycle 0->1->2->0 plus chain 3->4, isolated 5
    a = np.array([0, 1, 2, 3], np.int32)
    b = np.array([1, 2, 0, 4], np.int32)
    got = native.toposort(a, b, nodes, 6).tolist()
    expect = _python_toposort(a, b, nodes)
    assert got == expect
    assert 5 not in got  # edgeless nodes excluded (wangtile.rs:1193-1204)
    # every node with an edge appears exactly once
    assert sorted(got) == [0, 1, 2, 3, 4]


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="no C++ lib")
def test_toposort_respects_order_constraints(rng):
    n = 100
    nodes = np.arange(n, dtype=np.int32)
    a = rng.integers(0, n - 1, 300).astype(np.int32)
    b = (a + rng.integers(1, 10, 300).astype(np.int32)).clip(0, n - 1).astype(np.int32)
    m = a != b
    a, b = a[m], b[m]
    got = native.toposort(a, b, nodes, n).tolist()
    pos = {v: i for i, v in enumerate(got)}
    # final order is reversed topo: for edge a->b, b must appear BEFORE a
    for x, y in zip(a.tolist(), b.tolist()):
        assert pos[y] < pos[x]
