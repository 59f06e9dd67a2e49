"""NMI-paper experiment grids (reference: bm/grids/nmi/)."""
