"""Utilities: checkpoint conversion, audio helpers, scp tooling."""
