"""Model layer: distribution catalog, log-density models, and the ~ DSL."""
from .model import model, LogDensityModel
from . import distributions, dsl

__all__ = ["model", "LogDensityModel", "distributions", "dsl"]
