"""Engine operators: cell encoding, spatial join / tile assignment, kNN,
geometry union-agg, overlap refinement, dedup, similarity, text analysis.
"""
