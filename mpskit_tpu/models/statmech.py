"""2D classical statistical-mechanics transfer MPOs, matching the
reference's fixtures (reference test/setup.jl:78-130).

Leg bookkeeping: the reference's MPOTensor has codomain (left-virtual,
phys-out) and domain (phys-in, right-virtual), i.e. array order
(left, out, in, right) after conversion. Our DenseMPO convention is
``O[a, b, s, t] = [left, right, out, in]`` — a (0, 3, 1, 2) transpose.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..operators.mpo import DenseMPO


def ising_bond_tensor(beta: float) -> np.ndarray:
    """Symmetric square root of the bond Boltzmann matrix
    (reference test/setup.jl:78-83)."""
    t = np.array([[np.exp(beta), np.exp(-beta)],
                  [np.exp(-beta), np.exp(beta)]])
    evals, evecs = np.linalg.eigh(t)
    return evecs @ np.diag(np.sqrt(evals)) @ evecs.T


def classical_ising(beta: float = None, dtype=np.complex128) -> DenseMPO:
    """Bulk transfer-matrix MPO of the 2D classical Ising model, at the
    critical temperature by default (reference test/setup.jl:85-103)."""
    if beta is None:
        beta = np.log(1 + np.sqrt(2)) / 2
    nt = ising_bond_tensor(beta)
    O = np.zeros((2, 2, 2, 2))
    O[0, 0, 0, 0] = 1
    O[1, 1, 1, 1] = 1
    # legs (left, out, in, right); fully symmetric for this model
    o = np.einsum("ijkl,ai,bj,sk,tl->abst", O, nt, nt, nt, nt)
    return DenseMPO.from_array(o.transpose(0, 3, 1, 2).astype(dtype))


def finite_classical_ising(N: int, beta: float = None,
                           dtype=np.complex128) -> DenseMPO:
    """Finite-row transfer MPO with size-1 boundary virtual legs
    (reference test/setup.jl:105-122)."""
    if beta is None:
        beta = np.log(1 + np.sqrt(2)) / 2
    nt = ising_bond_tensor(beta)

    O = np.zeros((2, 2, 2, 2))
    O[0, 0, 0, 0] = 1
    O[1, 1, 1, 1] = 1
    obulk = np.einsum("ijkl,ai,bj,sk,tl->abst", O, nt, nt, nt, nt)

    OL = np.zeros((1, 2, 2, 2))
    OL[0, 0, 0, 0] = 1
    OL[0, 1, 1, 1] = 1
    # (left=1, out, in, right); only the non-boundary legs get nt factors
    oleft = np.einsum("ixyz,bx,sy,tz->ibst", OL, nt, nt, nt)

    OR = np.zeros((2, 2, 2, 1))
    OR[0, 0, 0, 0] = 1
    OR[1, 1, 1, 0] = 1
    oright = np.einsum("xyzr,ax,by,cz->abcr", OR, nt, nt, nt)

    tensors = [oleft] + [obulk] * (N - 2) + [oright]
    return DenseMPO(tuple(
        jnp.asarray(np.ascontiguousarray(t.transpose(0, 3, 1, 2)).astype(dtype))
        for t in tensors
    ))


def sixvertex(a: float = 1.0, b: float = 1.0, c: float = 1.0,
              dtype=np.complex128) -> DenseMPO:
    """Six-vertex model R-matrix transfer MPO (reference
    test/setup.jl:124-130). The reference permutes ((1,2),(4,3)): with raw
    legs (1,2,3,4), the MPO legs are left=1, out=2, in=4, right=3 — in our
    [left, right, out, in] order that is a (0, 2, 1, 3) transpose."""
    d = np.array([[a, 0, 0, 0],
                  [0, c, b, 0],
                  [0, b, c, 0],
                  [0, 0, 0, a]], dtype).reshape(2, 2, 2, 2)
    return DenseMPO.from_array(d.transpose(0, 2, 1, 3).astype(dtype))


def hard_hexagon(z: float = None, dtype=np.float64) -> DenseMPO:
    """Row transfer MPO of the hard-hexagon lattice gas (Baxter): particles
    on the triangular lattice, no two adjacent, activity z per particle —
    critical at z_c = (11 + 5 sqrt 5)/2 with central charge c = 4/5.

    The reference realizes this with a FibonacciAnyon-symmetric MPO
    (examples/classic2d/1.hard-hexagon/main.jl via MPSKitModels); here it
    is the same model in the dense occupation (RSOS path) basis: the MPO
    bond carries the previous column's (new-row, old-row) occupancies so
    every triangular-lattice adjacency (vertical s_i t_i, horizontal
    s_i s_{i-1}, diagonal s_i t_{i-1}) is excluded locally. The anyonic
    fusion constraint of the reference and this path-basis constraint
    describe the same partition function."""
    if z is None:
        z = (11 + 5 * np.sqrt(5)) / 2
    O = np.zeros((4, 4, 2, 2), dtype)
    for sp in (0, 1):
        for tp in (0, 1):
            a = 2 * sp + tp
            for s in (0, 1):
                for t in (0, 1):
                    if s * t or s * sp or s * tp:
                        continue
                    O[a, 2 * s + t, s, t] = z ** s
    return DenseMPO.from_array(O)


def hard_hexagon_fibonacci(dtype=np.float64) -> DenseMPO:
    """The critical hard-hexagon transfer MPO of the reference's
    Fibonacci-anyon example (MPSKitModels `hard_hexagon()`: the all-ones
    morphism on tau (x) tau with the vacuum fusion channel zeroed, i.e. the
    projector P^tau onto the tau channel; used by reference
    examples/classic2d/1.hard-hexagon/main.jl), expressed exactly in the
    orthonormal fusion-path (height) basis of symmetry/fibonacci.py.

    Derivation. P^tau = 1 - e/phi where e is the Temperley-Lieb element on
    tau (x) tau with loop weight phi; in the path basis between contextual
    heights a_l, a_r the TL matrix elements are
    e^{(a_l=a_r)}_{x,x'} = sqrt(d_x d_x')/d_{a_l}. Composing one projector
    per column along the row threads the horizontal tau line between the
    already-produced upper heights and the pending lower heights, so the
    MPO bond state at a cut is the height PAIR (y, x) = (upper path, path
    after the horizontal tau), constrained to x in y (x) tau — three
    states: (1,tau), (tau,1), (tau,tau). With physical indices p_in = x'
    (lower height after the site) and p_out = y' (upper height after the
    site), the site tensor is

        W[(y,x) -> (y',x')] = delta_{x,y'}
                              - delta_{y,x'} sqrt(d_x d_{y'}) / (phi d_y)

    on fusion-allowed configurations. Validation: the flat ring trace of
    this MPO reproduces the lattice-gas `hard_hexagon(z_c)` transfer
    spectrum ratios exactly on small rings (tests/test_fibonacci.py) — the
    two are the same Baxter partition function at criticality."""
    phi = (1 + np.sqrt(5)) / 2
    d = np.array([1.0, phi])

    def ok(a, b):  # b in a (x) tau
        return not (a == 0 and b == 0)

    pairs = [(y, x) for y in (0, 1) for x in (0, 1) if ok(y, x)]
    P = len(pairs)
    W = np.zeros((P, P, 2, 2), dtype)
    for i, (y, x) in enumerate(pairs):
        for j, (y2, x2) in enumerate(pairs):
            if not ok(x, x2) or not ok(y, y2):
                continue
            val = 0.0
            if x == y2:
                val += 1.0
            if y == x2:
                val -= np.sqrt(d[x] * d[y2]) / (phi * d[y])
            W[i, j, y2, x2] = val
    return DenseMPO.from_array(W)
