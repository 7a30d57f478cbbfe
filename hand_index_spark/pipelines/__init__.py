"""End-to-end pipelines: tile assignment (flagship), index build, ROI query."""
