"""Utility subpackage: timing, CLI args, test helpers, image IO, native lib."""
