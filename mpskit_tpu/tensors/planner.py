"""Python binding (ctypes) for the native C++ contraction-order planner
(native/contraction_planner.cpp) — the framework's counterpart of the
reference's TensorOperations native planning layer (SURVEY.md §2.8).

The shared library is built on first use with g++; a pure-Python dynamic
program is the fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Dict, List, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcontraction_planner.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "contraction_planner.cpp")


@functools.lru_cache(maxsize=1)
def _load_native():
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.plan_contraction.restype = ctypes.c_int
        lib.plan_contraction.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            ctypes.POINTER(ctypes.c_double),
        ]
        return lib
    except Exception:
        return None


def plan_contraction(tensor_indices: Sequence[Sequence[str]],
                     index_dims: Dict[str, int]):
    """Optimal pairwise contraction order.

    tensor_indices: per tensor, the list of its index names.
    index_dims: dimension per index name.
    Returns (steps, cost): steps is a list of (left, right) frozensets of
    original tensor positions contracted at each stage; cost is the total
    multiply count.
    """
    names = sorted(index_dims)
    name_id = {n: i for i, n in enumerate(names)}
    n_t = len(tensor_indices)
    n_i = len(names)
    masks = np.zeros((n_t,), np.uint64)
    for t, idxs in enumerate(tensor_indices):
        m = 0
        for n in idxs:
            m |= 1 << name_id[n]
        masks[t] = m
    dims = np.array([float(index_dims[n]) for n in names])

    lib = _load_native()
    if lib is not None:
        order = np.zeros((2 * max(n_t - 1, 0),), np.uint64)
        cost = ctypes.c_double(0.0)
        rc = lib.plan_contraction(n_t, n_i, masks, dims, order,
                                  ctypes.byref(cost))
        if rc == 0:
            steps = []
            for k in range(n_t - 1):
                l, r = int(order[2 * k]), int(order[2 * k + 1])
                steps.append((_subset(l, n_t), _subset(r, n_t)))
            return steps, cost.value

    return _plan_python(list(map(int, masks)), dims.tolist(), n_t, n_i)


def _subset(mask: int, n: int):
    return frozenset(i for i in range(n) if mask >> i & 1)


def _plan_python(masks: List[int], dims: List[float], n_t: int, n_i: int):
    """Pure-Python DP fallback, same algorithm as the native planner."""
    full = (1 << n_t) - 1
    union = {0: 0}
    for s in range(1, full + 1):
        lsb = s & -s
        union[s] = union[s ^ lsb] | masks[lsb.bit_length() - 1]
    count = [0] * n_i
    for m in masks:
        for i in range(n_i):
            if m >> i & 1:
                count[i] += 1
    gopen = 0
    for i in range(n_i):
        if count[i] == 1:
            gopen |= 1 << i

    def dimprod(mask):
        p = 1.0
        for i in range(n_i):
            if mask >> i & 1:
                p *= dims[i]
        return p

    INF = float("inf")
    best = {1 << t: (0.0, 0, 0, masks[t]) for t in range(n_t)}
    for s in range(1, full + 1):
        if bin(s).count("1") < 2:
            continue
        lsb = s & -s
        cur = (INF, 0, 0, 0)
        l = (s - 1) & s
        while l:
            if l & lsb:
                r = s ^ l
                if l in best and r in best:
                    cl, _, _, il = best[l]
                    cr, _, _, ir = best[r]
                    c = cl + cr + dimprod(il | ir)
                    if c < cur[0]:
                        inside = union[s]
                        outside = union[full ^ s]
                        open_ = (inside & outside) | (inside & gopen)
                        cur = (c, l, r, open_)
            l = (l - 1) & s
        best[s] = cur

    steps = []
    stack = [full]
    while stack:
        s = stack.pop()
        if bin(s).count("1") < 2:
            continue
        _, l, r, _ = best[s]
        steps.append((_subset(l, n_t), _subset(r, n_t)))
        stack.append(l)
        stack.append(r)
    steps.reverse()
    return steps, best[full][0]
