"""Spatial dataflow layer: hierarchical cells, tiles, PIP joins, kNN."""
