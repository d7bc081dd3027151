"""Fixture/corpus synthesis and media resolution."""
