"""Scalar Column combinators (the engine's "function library")."""
