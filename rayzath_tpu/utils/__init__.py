from . import hostmath
from .timing import TimeTable
from .text import scientific_with_prefix
from .exceptions import RayZathError

__all__ = ["hostmath", "TimeTable", "scientific_with_prefix", "RayZathError"]
