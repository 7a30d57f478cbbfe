"""Input sources: GeoJSON ROI parsing, raster footprint ingestion."""
