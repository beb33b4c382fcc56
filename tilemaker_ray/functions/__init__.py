"""Scalar/vector function library shared by pipelines and queries."""
