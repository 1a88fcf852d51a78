"""Small shared utilities: dtype policy, pytree dataclasses, tables."""
from .dtypes import real_dtype, as_real
from .table import Table

__all__ = ["real_dtype", "as_real", "Table"]
