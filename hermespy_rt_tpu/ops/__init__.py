"""Compute ops: intersection, Fresnel, scattering, geometry."""
