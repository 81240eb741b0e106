"""Checkpoint conversion: reference torch ``.pt`` state dicts → JAX pytrees."""
