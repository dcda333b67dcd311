import numpy as np
import pytest

from mpskit_tpu.tensors.planner import plan_contraction, _plan_python, _load_native


def test_planner_mps_chain():
    # GL - A - W - A* - GR style network: the optimal order must not form
    # the giant (D^2 w x D^2 w) intermediate
    dims = {"a": 5, "x": 64, "y": 64, "s": 2, "t": 2, "m": 64, "n": 64,
            "b": 5}
    tensors = [
        ["a", "x", "y"],      # GL
        ["y", "t", "n"],      # A (ket)
        ["a", "b", "s", "t"],  # W
        ["x", "s", "m"],      # A* (bra)
    ]
    steps, cost = plan_contraction(tensors, dims)
    assert len(steps) == 3
    # brute force optimal cost via the python DP (same algorithm) and a
    # naive worst order for comparison
    assert cost <= 5 * 2 * 64**3 + 5 * 5 * 2 * 2 * 64 * 64 + 5 * 2 * 64**3 + 1e5


def test_native_matches_python():
    rng = np.random.default_rng(0)
    names = list("abcdefgh")
    dims = {n: int(rng.integers(2, 20)) for n in names}
    tensors = [list(rng.choice(names, size=3, replace=False)) for _ in range(5)]
    # ensure connectivity: chain-share an index
    for i in range(4):
        tensors[i + 1][0] = tensors[i][-1]
    steps_n, cost_n = plan_contraction(tensors, dims)

    # python fallback on the same problem
    namelist = sorted(dims)
    nid = {n: i for i, n in enumerate(namelist)}
    masks = []
    for t in tensors:
        m = 0
        for n in t:
            m |= 1 << nid[n]
        masks.append(m)
    steps_p, cost_p = _plan_python(masks, [float(dims[n]) for n in namelist],
                                   len(tensors), len(namelist))
    assert abs(cost_n - cost_p) < 1e-6 * max(cost_n, 1)


def test_native_available():
    assert _load_native() is not None, "native planner failed to build"
