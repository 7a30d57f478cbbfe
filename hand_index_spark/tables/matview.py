"""Incrementally-maintained materialized aggregates over icelite.

The 100-TB pattern this implements: a dashboard/stats table (per-lang
doc counts, per-host byte sums, ...) over an append-only fact table
must NOT rescan the fact table per refresh. Each ``refresh()``:

1. reads ONLY the data directories appended since the last refreshed
   snapshot (``IceliteTable.read_incremental`` — an Iceberg
   incremental append scan),
2. partial-aggregates that delta (one map-side-combinable groupBy whose
   shuffle is group-cardinality-sized),
3. merges the partials with the stored state (count/sum add, min/max
   combine — all algebraic, so merge(old, delta) == full recompute
   exactly), and
4. publishes the new state atomically through the MV's own icelite
   snapshot, recording which source snapshot it reflects.

Refresh work is therefore O(delta + |groups|), never O(table). If the
source history since the last refresh contains a rewrite (overwrite /
compact / MERGE / DELETE), the append delta is undefined and refresh
falls back to a full recompute — correctness never depends on the
history shape. avg is served as sum/count at read time (algebraic,
exact), never stored.

Reference parity: the reference materializes query outputs as new
Iceberg tables and fully recomputes them per run (SURVEY §2.9 D-ops);
this module is the derived-table path rebuilt with incremental
maintenance. Exactness: merge order never matters for count/sum over
integers and min/max, so the MV hash-matches a one-shot DuckDB
aggregate (the driver query ``matview_incremental``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .icelite import IceliteTable, NonAppendHistoryError

_KINDS = ("count", "sum", "min", "max")


class MaterializedAgg:
    """A grouped aggregate view of an append-only IceliteTable,
    refreshed incrementally.

    specs: list of (kind, col) with kind in count/sum/min/max; count
    ignores col (pass "*"). State columns are ``cnt`` plus
    ``{kind}__{col}``.
    """

    def __init__(
        self,
        root: str,
        name: str,
        source: IceliteTable,
        group_cols: list[str],
        specs: list[tuple[str, str]],
    ):
        for kind, _ in specs:
            if kind not in _KINDS:
                raise ValueError(f"unsupported aggregate kind {kind!r}")
        self.source = source
        self.group_cols = list(group_cols)
        self.specs = [(k, c) for k, c in specs if k != "count"]
        self.mv = IceliteTable(root, name)
        self.state_path = os.path.join(self.mv.meta_dir, "mv_state.json")

    # ------------------------------------------------------------ state

    def refreshed_snapshot_id(self) -> int | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)["source_snapshot_id"]

    def _save_state(self, sid: int) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"source_snapshot_id": sid}, f)
        os.replace(tmp, self.state_path)  # atomic, like the snapshot ptr

    # ---------------------------------------------------------- refresh

    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("cnt")]
        for kind, col in self.specs:
            aggs.append(getattr(F, kind)(col).alias(f"{kind}__{col}"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _merge(self, state: DataFrame, delta: DataFrame) -> DataFrame:
        both = state.unionByName(delta)
        aggs = [F.sum("cnt").cast("long").alias("cnt")]
        for kind, col in self.specs:
            name = f"{kind}__{col}"
            fn = F.sum if kind == "sum" else getattr(F, kind)
            merged = fn(name)
            if kind == "sum":
                merged = merged.cast(state.schema[name].dataType)
            aggs.append(merged.alias(name))
        return both.groupBy(*self.group_cols).agg(*aggs)

    def refresh(self, spark: SparkSession) -> dict:
        """Bring the MV up to the source's current snapshot. Returns
        {"mode": "initial"|"incremental"|"full", "delta_rows": n,
        "source_snapshot_id": sid}."""
        cur = self.source.current_snapshot()
        if cur is None:
            raise ValueError("source table has no snapshot")
        sid = cur["snapshot_id"]
        last = self.refreshed_snapshot_id()
        if last is not None and last == sid:
            return {"mode": "noop", "delta_rows": 0, "source_snapshot_id": sid}
        mode = "initial"
        if last is None:
            delta = self.source.read(spark)
            new_state = self._partials(delta)
        else:
            try:
                delta = self.source.read_incremental(spark, last)
                mode = "incremental"
                new_state = self._merge(self.mv.read(spark), self._partials(delta))
            except NonAppendHistoryError:
                delta = self.source.read(spark)
                mode = "full"
                new_state = self._partials(delta)
        n = delta.count()
        self.mv.write(
            new_state,
            stage="mv_refresh",
            fingerprint=f"src-snap-{sid}",
        )
        self._save_state(sid)
        return {"mode": mode, "delta_rows": n, "source_snapshot_id": sid}

    # ------------------------------------------------------------- serve

    def serve(self, spark: SparkSession) -> DataFrame:
        """The view: group cols, n (count), each aggregate, plus
        avg__{col} for every sum (one exact IEEE division of the exact
        integer partials — bit-stable under any refresh history)."""
        st = self.mv.read(spark)
        cols = [*self.group_cols, F.col("cnt").alias("n")]
        for kind, col in self.specs:
            cols.append(F.col(f"{kind}__{col}"))
        for kind, col in self.specs:
            if kind == "sum":
                cols.append(
                    (F.col(f"sum__{col}").cast("double") / F.col("cnt")).alias(
                        f"avg__{col}"
                    )
                )
        return st.select(*cols)
