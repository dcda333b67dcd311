"""Algorithm chaining with ``&`` (reference src/algorithms/unionalg.jl:4-26).

The reference lets users write ``DMRG2(...) & DMRG(...)`` or
``OptimalExpand() & SvdCut()``: the combined algorithm applies each stage
in sequence, threading the state from one stage into the next.
Environments are NOT handed off between stages: in the functional design
they are plain pytrees rebuilt by one `lax.scan` (finite) or a few
warm-startable GMRES solves (infinite) inside each driver, so each stage
recomputes them from the incoming state — unlike the reference's mutable
env caches, there is no invalidation state worth carrying across a stage
boundary. Here every algorithm dataclass inherits :class:`Chainable`, and
the dispatchers (`find_groundstate`, `changebonds`) accept the resulting
:class:`ChainedAlg`.
"""

from __future__ import annotations

import dataclasses


class Chainable:
    """Mixin giving algorithm structs the reference's ``&`` composition."""

    def __and__(self, other):
        tail = other.algs if isinstance(other, ChainedAlg) else (other,)
        return ChainedAlg((self,) + tuple(tail))


@dataclasses.dataclass(frozen=True)
class ChainedAlg(Chainable):
    """A sequence of algorithms applied one after the other
    (reference ``UnionAlg``, src/algorithms/unionalg.jl:4-26)."""

    algs: tuple

    def __and__(self, other):
        tail = other.algs if isinstance(other, ChainedAlg) else (other,)
        return ChainedAlg(tuple(self.algs) + tuple(tail))

    def __iter__(self):
        return iter(self.algs)

    def __len__(self):
        return len(self.algs)


# reference-name alias
UnionAlg = ChainedAlg
