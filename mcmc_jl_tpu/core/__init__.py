from .task import MCMCTask, product
from .chain import MCMCChain

__all__ = ["MCMCTask", "MCMCChain", "product"]
