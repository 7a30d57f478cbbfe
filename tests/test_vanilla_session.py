"""The contract surface must work under the DRIVER's session, not just
the repo's (SURVEY §5.2): `queries()` entries run under whatever
vanilla `SparkSession.builder.getOrCreate()` the grading driver built —
no Arrow coercion, default timezone, default shuffle partitions. The r4
`spatial_join_generic` crash (numpy.float64 defeating schema inference)
only existed there, invisible to every in-repo check.

This test runs `scripts/verify_contract.py --vanilla` in a SUBPROCESS
(a second SparkSession with different confs cannot coexist with the
session fixture's JVM) over a representative key set: every query whose
builder calls `createDataFrame`, plus one representative each of the
broadcast-kernel geo path, window/temporal idioms (the epoch-cast
timezone idiom), datetime functions, and stateful streaming.

Confs the contract LEGITIMATELY requires (documented in
__spark_entry__'s docstring): none — this test is the proof.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The bug-class-covering sample (keep runtime ~2 min):
#   createDataFrame fixtures: spatial_join_generic, wkb_roundtrip
#   Arrow-UDF kernel + broadcast: tile_assign
#   epoch-cast timestamp idiom (session-timezone-sensitive): asof_join_latest_order
#   datetime surface: datetime_functions
#   stateful streaming (applyInPandasWithState): stream_windowed
KEYS = [
    "spatial_join_generic",
    "simplify_ring",
    "convex_hull",
    "wkb_roundtrip",
    "tile_assign",
    "asof_join_latest_order",
    "datetime_functions",
    "stream_windowed",
    # round-5d driver-sample newcomers (snap's fixture is spark.range;
    # hillshade exercises the engine-exact sqrt/floor double rule
    # without Arrow)
    "snap_points",
    "hillshade_stats",
    # round-5e: staypoint/interval use the unix_micros(cast) epoch
    # idiom (session-timezone-sensitive output), mad_outliers leans on
    # percentile() interpolation exactness
    "staypoint_detect",
    "mad_outliers",
    # round-5g driver-sample newcomers: cusum uses the epoch idiom
    # plus two same-ordering window frames; fuzzy_name_join leans on
    # levenshtein() agreement between engines
    "cusum_changepoints",
    "fuzzy_name_join",
    # WAP: pure parquet + pointer-file I/O, but its audit aggregate and
    # per-lang publish read must behave identically without Arrow
    "wap_publish",
    # round-5h driver-sample newcomers: the clip fold must analyze and
    # run without repo confs (its createDataFrame-free fixture is pure
    # column arithmetic); dsir's token-hash + 64-row broadcasts must
    # agree without Arrow
    "clip_to_tiles",
    "dsir_weights",
    # round-5l/5m epoch-and-sink bug classes: attribution uses the
    # unix_micros(cast) idiom (only DIFFERENCES, so offset-invariant —
    # this pins that); jsonl writes and re-reads text outside parquet
    "attribution_last_touch",
    "jsonl_roundtrip",
]


def test_contract_green_under_vanilla_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "scripts", "verify_contract.py"),
            "--vanilla",
            "--keys",
            ",".join(KEYS),
        ],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = (proc.stdout or "")[-2000:] + (proc.stderr or "")[-1000:]
    assert proc.returncode == 0, f"vanilla-session contract run failed:\n{tail}"
    assert f"{len(KEYS)}/{len(KEYS)} queries oracle-green" in proc.stdout, tail
