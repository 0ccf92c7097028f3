"""Native (C) runtime components, loaded via ctypes with Python fallbacks.

The compute path is JAX/XLA; these cover the host-side runtime around it —
currently the parallel .npy batch loader feeding the channel datasets.
"""
from .loader import load_npy_batch, native_available

__all__ = ["load_npy_batch", "native_available"]
