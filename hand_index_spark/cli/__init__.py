"""spark-submit-able entry points mirroring the reference CLI surface:

- ``python -m hand_index_spark.cli.build_index_main`` — the reference's
  ``python load.py --db-path ... --hand-dir ...`` (load.py:303-380);
- ``python -m hand_index_spark.cli.query_roi_main`` — the reference's
  ``python query_geojson.py -g roi.geojson -p ... -o outdir``
  (query_geojson.py:250-340).

Both are plain scripts building their own SparkSession, so
``spark-submit --py-files hand_index_spark.zip <script>`` works as the
north rule requires (BASELINE.json:14).
"""
