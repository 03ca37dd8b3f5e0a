"""Application drivers (the reference's Examples/ layer)."""
