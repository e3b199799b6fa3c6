"""Native (C) host-path accelerators, compiled lazily with the system
compiler and loaded via ctypes.  Every native routine has a NumPy twin
that is bit-identical (same floating-point association order), so the
framework runs everywhere — the .so is a pure speedup."""

from lshrs_tpu.native.build import load_fwht_library, native_cache_dir

__all__ = ["load_fwht_library", "native_cache_dir"]
