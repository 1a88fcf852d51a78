"""Runner layer (reference: src/runners/)."""
from .serialmc import SerialMC
from .seqmc import SeqMC
from .serialtempmc import SerialTempMC
from .api import run, resume, prun

__all__ = ["SerialMC", "SeqMC", "SerialTempMC", "run", "resume", "prun"]
