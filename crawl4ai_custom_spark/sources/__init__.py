"""Input sources: pages-table loaders and the deterministic site generator."""
