"""Native (C++) runtime components, built lazily with the system toolchain.

The reference delegates its assignment hot loop to the external `lap`
C++ package (ObjectTracker/byteTrack/matching.py:3); here the solver is
in-repo (lapjv.cpp), compiled once into ``_lib/`` on first use.
"""
from .build import load_library

__all__ = ["load_library"]
