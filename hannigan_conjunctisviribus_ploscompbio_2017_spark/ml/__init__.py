"""Subpackage: ml."""
