"""Differentiable projective geometry and bundle adjustment."""
