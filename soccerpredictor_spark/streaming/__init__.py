"""Structured Streaming layer over the events table."""
