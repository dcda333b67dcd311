"""Plotting helpers (reference src/utility/plotting.jl recipes).

`entanglement_plot_data` and `transfer_plot_data` return plain arrays so
they work headless; `entanglement_plot`/`transfer_plot` render with
matplotlib when it is available.
"""

from __future__ import annotations

import numpy as np


def entanglement_plot_data(psi, bond=None):
    """Schmidt spectrum at a bond, sorted descending, zeros dropped
    (counterpart of the reference's `entanglementplot`)."""
    from ..algorithms.toolbox import entanglement_spectrum

    S = np.asarray(entanglement_spectrum(psi, bond))
    S = S[S > 1e-30]
    return np.sort(S)[::-1]


def transfer_plot_data(psi, num: int = 10):
    """(theta, r) polar coordinates of the leading transfer eigenvalues
    (counterpart of the reference's `transferplot`)."""
    from ..algorithms.toolbox import transfer_spectrum

    lams = np.asarray(transfer_spectrum(psi, num=num))
    return np.angle(lams), np.abs(lams)


def entanglement_plot(psi, bond=None, ax=None):
    import matplotlib.pyplot as plt

    S = entanglement_plot_data(psi, bond)
    if ax is None:
        _, ax = plt.subplots()
    ax.semilogy(np.arange(1, len(S) + 1), S, "o")
    ax.set_xlabel("index")
    ax.set_ylabel("Schmidt value")
    return ax


def transfer_plot(psi, num: int = 10, ax=None):
    import matplotlib.pyplot as plt

    theta, r = transfer_plot_data(psi, num)
    if ax is None:
        _, ax = plt.subplots(subplot_kw={"projection": "polar"})
    ax.plot(theta, r, "x")
    return ax
