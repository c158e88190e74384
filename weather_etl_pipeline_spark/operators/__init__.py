"""Operator library — each module registers queries in registry.REGISTRY."""
