"""Multi-chip execution: meshes, shardings, and carry exchange collectives."""
