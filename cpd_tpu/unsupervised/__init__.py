"""Unsupervised pseudo-label factory.

Parity with cpd/unsupervised_core/ (reference __init__.py:1-28): initial-label
generators {DBSCAN, OYSTER, MFCF} and refiners {C_PROTO}, dispatched per
sequence by ``compute_outline_box`` with idempotent pkl caching. All stages
are host-side NumPy/SciPy (matching the reference's process-parallel design)
with JAX-accelerated kernels for the hot neighbor computations.
"""
from .driver import compute_outline_box, ALL_INIT, ALL_REFINE  # noqa: F401
