from .format import FMIndex, DeviceIndex
from .builder import build_index
from .fasta import parse_fasta, ReferenceMap

__all__ = ["FMIndex", "DeviceIndex", "build_index", "parse_fasta", "ReferenceMap"]
