"""Contraction-order golden tests.

Every hot einsum path in the framework hand-specifies a pairwise
contraction order (derivatives.py, transfermatrix/transfer.py,
environments/*). These tests pin each of those orders against the native
contraction-order planner (native/contraction_planner.cpp, subset DP):
the cost of the code's order must equal the planner's optimum at
production-like dimensions. This is SURVEY.md §4's suggested replacement
for the reference's `force_planar` contraction checks (test/setup.jl:18-33)
— instead of proving braiding-safety, we prove order-optimality.

If one of these tests fails after an edit, either the edit regressed the
contraction order, or the dimension regime changed enough that a different
order is now optimal — the planner output tells you which.
"""

import math
from collections import Counter

import pytest

from mpskit_tpu.tensors.planner import plan_contraction


def order_cost(tensors, dims, order):
    """Multiply-count of a pairwise contraction `order` under the same cost
    model as the planner: each pair costs prod(dims of the union of their
    indices); kept indices are those shared with remaining tensors or
    appearing in the output (indices occurring exactly once overall)."""
    live = {i: set(t) for i, t in enumerate(tensors)}
    cnt = Counter(i for t in tensors for i in t)
    out = {i for i, c in cnt.items() if c == 1}
    total = 0.0
    for a, b in order:
        ia, ib = live.pop(a), live.pop(b)
        union = ia | ib
        total += math.prod(dims[i] for i in union)
        rest = set().union(*live.values()) if live else set()
        live[a] = (union & rest) | (union & out)
    assert len(live) == 1
    return total


# production-like regime: D >> w > d
D, w, d = 256, 5, 2


CASES = {
    # derivatives.ac_apply: ((GL, x), W), GR
    "ac_apply": (
        [["a", "x", "y"], ["a", "b", "s", "t"], ["y", "t", "n"],
         ["b", "r", "n"]],
        {"a": w, "b": w, "s": d, "t": d, "x": D, "y": D, "n": D, "r": D},
        [(0, 2), (0, 1), (0, 3)],
    ),
    # derivatives.c_apply: (GL, x), GR
    "c_apply": (
        [["a", "x", "y"], ["y", "n"], ["a", "r", "n"]],
        {"a": w, "x": D, "y": D, "n": D, "r": D},
        [(0, 1), (0, 2)],
    ),
    # derivatives.ac2_apply: (((GL, x), W1), W2), GR
    "ac2_apply": (
        [["a", "x", "y"], ["a", "b", "s", "u"], ["b", "c", "q", "v"],
         ["y", "u", "v", "n"], ["c", "r", "n"]],
        {"a": w, "b": w, "c": w, "s": d, "u": d, "q": d, "v": d,
         "x": D, "y": D, "n": D, "r": D},
        [(0, 3), (0, 1), (0, 2), (0, 4)],
    ),
    # transfer.transfer_left_mpo: ((GL, A_ket), W), A_bra
    "transfer_left_mpo": (
        [["a", "x", "y"], ["y", "t", "n"], ["a", "b", "s", "t"],
         ["x", "s", "m"]],
        {"a": w, "b": w, "s": d, "t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 1), (0, 2), (0, 3)],
    ),
    # transfer.transfer_right_mpo mirror
    "transfer_right_mpo": (
        [["b", "m", "n"], ["y", "t", "n"], ["a", "b", "s", "t"],
         ["x", "s", "m"]],
        {"a": w, "b": w, "s": d, "t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 1), (0, 2), (0, 3)],
    ),
    # environments.infinite_ham.transfer_left_block (single FSM block):
    # ((v, A_ket), Wab), A_bra
    "transfer_left_block": (
        [["x", "y"], ["y", "t", "n"], ["s", "t"], ["x", "s", "m"]],
        {"s": d, "t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 1), (0, 2), (0, 3)],
    ),
    # environments.infinite_ham._source_col_left: ((GL_i, Wcol), A*), A
    # (order was ((GL, A), W), A* until the planner flagged it 2x costlier
    # — the fix halved the FSM cyclethrough cost)
    "source_col_left": (
        [["a", "x", "y"], ["y", "t", "n"], ["a", "s", "t"],
         ["x", "s", "m"]],
        {"a": w, "s": d, "t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 2), (0, 3), (0, 1)],
    ),
    # environments.infinite_ham._source_row_right mirror
    "source_row_right": (
        [["b", "m", "n"], ["y", "t", "n"], ["b", "s", "t"],
         ["x", "s", "m"]],
        {"b": w, "s": d, "t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 2), (0, 3), (0, 1)],
    ),
    # plain MPS transfer (transfer_left): (v, A_ket), A_bra
    "transfer_left_plain": (
        [["x", "y"], ["y", "t", "n"], ["x", "t", "m"]],
        {"t": d, "x": D, "y": D, "n": D, "m": D},
        [(0, 1), (0, 2)],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_contraction_order_is_optimal(name):
    tensors, dims, order = CASES[name]
    code_cost = order_cost(tensors, dims, order)
    _, optimal = plan_contraction(tensors, dims)
    assert code_cost == pytest.approx(optimal, rel=1e-12), (
        f"{name}: code order costs {code_cost:.3e}, "
        f"planner optimum is {optimal:.3e}")
