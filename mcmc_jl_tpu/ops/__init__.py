"""Device-side numeric ops: FFT autocovariance, safe linear algebra, and
Pallas kernels for the hot paths."""
from .acf import autocov

__all__ = ["autocov"]
