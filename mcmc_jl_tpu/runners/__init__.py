"""Runner layer (reference: src/runners/)."""
from .serialmc import SerialMC
from .seqmc import SeqMC
from .serialtempmc import SerialTempMC
from .ptmc import PTMC
from .api import run, resume, prun

__all__ = ["SerialMC", "SeqMC", "SerialTempMC", "PTMC", "run", "resume", "prun"]
