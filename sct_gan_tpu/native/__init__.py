"""Native (C++) runtime components, loaded via ctypes with pure-Python
fallbacks — the host-side counterpart to the Pallas device kernels."""
from .build import load_library, native_available

__all__ = ["load_library", "native_available"]
