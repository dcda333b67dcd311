"""Generic (left, middle, right) triple (reference src/states/window.jl:8-12).

Used as an *operator* window: a WindowMPS evolving under
``Window(H_left, H_mid, H_right)`` co-evolves its infinite boundary states
under ``H_left`` / ``H_right`` while the finite window evolves under
``H_mid`` — the time-dependent-background extension of the frozen-boundary
window evolution (beyond the v0.10.2 reference, whose WindowMPS timestep
treats the window as a plain finite chain with static boundary
environments, src/algorithms/timestep/tdvp.jl:61-91).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Window:
    """A left/middle/right triple. ``Window(H)`` broadcasts one operator to
    all three slots."""

    left: object
    middle: object = None
    right: object = None

    def __post_init__(self):
        if self.middle is None and self.right is None:
            object.__setattr__(self, "middle", self.left)
            object.__setattr__(self, "right", self.left)
        assert self.middle is not None and self.right is not None

    def map(self, f):
        return Window(f(self.left), f(self.middle), f(self.right))
