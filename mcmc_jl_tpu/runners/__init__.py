"""Runner layer (reference: src/runners/)."""
from .serialmc import SerialMC
from .seqmc import SeqMC
from .serialtempmc import SerialTempMC
from .ptmc import PTMC
from .api import run, resume, prun
from .convergence import ConvergenceResult, run_until

__all__ = ["SerialMC", "SeqMC", "SerialTempMC", "PTMC", "run", "resume",
           "prun", "run_until", "ConvergenceResult"]
