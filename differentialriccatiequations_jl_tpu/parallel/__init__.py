"""Mesh sharding and multi-chip execution (populated in later milestones)."""
