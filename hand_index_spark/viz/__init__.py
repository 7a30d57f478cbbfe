"""Visual-audit reporting (the reference's viz/query_visualization.py
analogue, folium-free: one self-contained HTML file with inline SVG)."""
