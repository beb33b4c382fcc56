"""Input sources: deterministic synthetic web-page corpus and polygon
layers (analog of tilemaker's external shapefile/GeoJSON sources)."""
