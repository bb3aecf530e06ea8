"""Integrators ("model families"): wavefront path tracer, SPPM."""
