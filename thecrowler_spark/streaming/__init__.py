"""Structured Streaming renditions of the reference's event bus."""
