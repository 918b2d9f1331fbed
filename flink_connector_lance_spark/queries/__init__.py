"""Registered query modules (self-register into ``registry.REGISTRY``)."""
