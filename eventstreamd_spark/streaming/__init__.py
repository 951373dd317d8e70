"""Structured Streaming layer: the reference daemon's behavior as
streaming queries over the batch operators."""
