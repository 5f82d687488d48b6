"""Mesh/sharding utilities (multi-chip IK)."""
