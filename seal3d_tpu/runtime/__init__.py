"""Native runtime components (C++ over ctypes)."""
