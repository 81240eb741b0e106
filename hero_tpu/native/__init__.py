"""Native (C++) components, loaded via ctypes with lazy self-build."""
