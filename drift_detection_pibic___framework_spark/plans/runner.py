"""ValidationRunner — per-partition check orchestration with manifest resume.

The Spark lifecycle of the reference's per-sample loop (SURVEY §3 entry
point 1), at Iceberg-partition granularity:

  1. driver enumerates unprocessed partitions (manifest left-anti);
  2. ONE DataFrame job computes all batch checks for every pending partition
     (stats agg + uniqueness + referential + PSI/KS) — map-side combined,
     no per-partition job storm;
  3. the ordered per-partition stat series advances the sequential detector
     steppers (state re-hydrated from the manifest checkpoint — the Spark
     equivalent of the reference's detector state carried across samples,
     /root/reference/utils/StreamProcessor.py:213-215);
  4. violations are written partition-by-partition (dynamic overwrite =
     idempotent), THEN the manifest row is committed (atomic rename) — the
     commit point, so a kill re-validates exactly the uncommitted suffix
     and outputs are byte-identical to an uninterrupted run (SURVEY §5
     resume tests).

Per-partition verdict = AND over checks; MUDANÇA from the partition-series
detector marks the drift state exactly as the reference's 3-state machine
does per sample (framework_detector.py:134-147).
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import drift_dist, stats
from ..operators.detectors import oracle
from ..operators.detectors.harness import PrequentialStepper
from ..sources.tableio import ParquetTableIO
from . import suite

# partition-series detector config: the series has ONE sample per partition
# (16 in fixtures), so warm-starts are scaled down from the row-level
# defaults; at production scale (1e5+ partitions) the row-level defaults in
# detectors/config.py apply. Page-Hinkley on |z|-standardized stats is the
# primary monitor (fires within 1-2 partitions of a mean shift).
SERIES_DETECTORS = {
    "page_hinkley": {"params": {"min_instances": 2, "delta": 0.05,
                                "threshold": 10.0, "alpha": 1.0},
                     "bin_threshold": 3.0},
}
SERIES_SEED_PARTS = 4  # baseline window = p0..p3 (FIXTURES.md §5)
MONITOR_COL = "dur_ms"


class ValidationRunner:
    def __init__(self, io: ParquetTableIO, scope: str = "default",
                 baseline_parts=drift_dist.DEFAULT_BASELINE_PARTS):
        self.io = io
        self.scope = scope
        self.baseline_parts = tuple(baseline_parts)

    # -- table names ---------------------------------------------------------

    @property
    def violations_table(self) -> str:
        return f"violations_{self.scope}"

    @property
    def metrics_table(self) -> str:
        return f"metrics_{self.scope}"

    # -- main ---------------------------------------------------------------

    def run(self, spark: SparkSession, limit_parts: int = None) -> dict:
        """Validate all pending partitions (optionally at most
        ``limit_parts``, for kill/resume tests). Returns a summary dict."""
        pending = self.io.pending_partitions("clips", self.scope)
        if limit_parts is not None:
            pending = pending[:limit_parts]
        if not pending:
            return {"validated": [], "failed": [], "skipped": True}

        clips_all = self.io.read_table(spark, "clips")
        clips = clips_all.filter(F.col("part").isin(pending))
        dim = self.io.read_table(spark, "allowed_codecs")

        # ---- one batch job: every check, every pending partition ----------
        st = stats.partition_column_stats(clips)
        verdicts = suite.suite_verdicts(
            clips, dim, baseline=clips_all,
            baseline_parts=self.baseline_parts, st=st)
        verdict_rows = verdicts.collect()          # <= parts * checks rows
        stat_rows = {r["part"]: r.asDict() for r in st.collect()}

        violations = (suite.suite_violations(clips, dim)
                      .withColumn("run_scope", F.lit(self.scope)))

        # write violations for ALL pending partitions BEFORE any manifest
        # commit (idempotent dynamic overwrite per partition)
        out = f"{self.io.root}/{self.violations_table}"
        (violations.repartition("part").write
         .partitionBy("part").mode("overwrite")
         .option("partitionOverwriteMode", "dynamic").parquet(out))

        # ---- sequential detector over the ordered partition-stat series ---
        steppers = self._load_steppers()
        by_part: dict = {}
        for r in verdict_rows:
            by_part.setdefault(r["part"], []).append(r)

        validated, failed = [], []
        base_mean, base_std = self._baseline_moments(stat_rows)
        for part in sorted(pending):
            stat = stat_rows[part]
            z = abs((stat[f"{MONITOR_COL}_mean"] - base_mean) /
                    (base_std or 1.0))
            drift_flag, drift_state = self._advance_steppers(steppers, part, z)

            checks = by_part.get(part, [])
            all_passed = all(r["passed"] for r in checks) and not drift_flag
            state = drift_state if drift_flag else (
                oracle.STATE_NORMAL if all_passed else oracle.STATE_WARNING)
            row = {
                "status": "done",
                "verdict": "pass" if all_passed else "fail",
                "state": state,
                "checks": {r["check_name"]: bool(r["passed"]) for r in checks},
                "series_drift": bool(drift_flag),
                "metrics_json": json.dumps(stat, default=str),
                "snapshot_id": f"{self.scope}-{part}",
            }
            # commit point: manifest row (violations already on disk);
            # O(1) per partition — no full-manifest rewrite.  The detector
            # state goes to the O(state) sidecar, NOT into every row
            # (manifest bytes stay independent of detector count); a kill
            # between the two commits is repaired at load by replaying the
            # missing rows' stored metrics.
            self.io.commit_manifest_row(self.scope, part, row)
            self.io.commit_state(self.scope, {
                "part": part,
                "detector_state": self._dump_steppers(steppers)})
            (validated if all_passed else failed).append(part)
        if not self.io.pending_partitions("clips", self.scope):
            # run complete: fold the per-row commit log into one file so a
            # resume scan is O(1) file opens, not O(partitions)
            self.io.compact_manifest(self.scope)
        return {"validated": validated, "failed": failed, "skipped": False}

    # -- detector-state checkpointing ---------------------------------------

    @staticmethod
    def _steppers_from_blob(blob: str) -> dict:
        raw = json.loads(blob)
        return {k: PrequentialStepper.deserialize(
            base64.b64decode(v)) for k, v in raw.items()}

    def _load_steppers(self) -> dict:
        manifest = self.io.read_manifest(self.scope)
        done = sorted(p for p, v in manifest.items()
                      if v.get("status") == "done")
        st = self.io.read_state(self.scope)
        if st is not None and done:
            steppers = self._steppers_from_blob(st["detector_state"])
            # a kill between a row commit and its sidecar write leaves the
            # sidecar behind by those rows; replay them from the stored
            # per-partition metrics (same z inputs -> byte-identical state)
            behind = [p for p in done if p > st["part"]]
            if behind:
                base_mean, base_std = self._baseline_moments({})
                for p in behind:
                    stat = json.loads(manifest[p]["metrics_json"])
                    z = abs((stat[f"{MONITOR_COL}_mean"] - base_mean) /
                            (base_std or 1.0))
                    self._advance_steppers(steppers, p, z)
            return steppers
        if done:
            # legacy manifests (pre-sidecar) carried the blob in every row
            blob = manifest[max(done)].get("detector_state")
            if blob:
                return self._steppers_from_blob(blob)
        return self._fresh_steppers()

    @staticmethod
    def _fresh_steppers() -> dict:
        return {
            name: PrequentialStepper(name, tamanho_batch=SERIES_SEED_PARTS,
                                     params=cfg["params"],
                                     bin_threshold=cfg["bin_threshold"])
            for name, cfg in SERIES_DETECTORS.items()}

    def invalidate_from(self, part: int) -> list:
        """Re-open validation from ``part`` onward — the correction path
        after an upsert/backfill touches already-validated partitions.

        The sequential-series contract (SURVEY §2.9 T3: detectors consume
        the ORDERED per-partition stat series) forbids re-inserting a
        middle partition alone, so a correction rolls the series back to
        the correction point: every done partition >= ``part`` gets an
        O(1) 'invalidated' override row (overlays rows folded into the
        consolidated manifest too), and the detector-state sidecar is
        rebuilt by replaying the surviving prefix's stored metrics from
        fresh seeds (same z inputs -> byte-identical state, the resume
        repair guarantee).  The next run() then re-validates exactly the
        invalidated suffix with correct series state; outputs are
        idempotent per (part, scope).  Returns the re-opened partitions."""
        manifest = self.io.read_manifest(self.scope)
        done = sorted(p for p, v in manifest.items()
                      if v.get("status") == "done")
        victims = [p for p in done if p >= part]
        for p in victims:
            self.io.commit_manifest_row(
                self.scope, p, {"status": "invalidated"})
        keep = [p for p in done if p < part]
        if keep:
            steppers = self._fresh_steppers()
            base_mean, base_std = self._baseline_moments({})
            for p in keep:
                stat = json.loads(manifest[p]["metrics_json"])
                z = abs((stat[f"{MONITOR_COL}_mean"] - base_mean) /
                        (base_std or 1.0))
                self._advance_steppers(steppers, p, z)
            self.io.commit_state(self.scope, {
                "part": max(keep),
                "detector_state": self._dump_steppers(steppers)})
        else:
            self.io.clear_state(self.scope)
        return victims

    @staticmethod
    def _dump_steppers(steppers: dict) -> str:
        return json.dumps({k: base64.b64encode(v.serialize()).decode()
                           for k, v in steppers.items()})

    @staticmethod
    def _advance_steppers(steppers: dict, part: int, z: float) -> tuple:
        flag = False
        state = oracle.STATE_NORMAL
        for stepper in steppers.values():
            f, _w, s = stepper.step(z, z)
            if s == "SEED":
                continue
            flag = flag or f
            if s == oracle.STATE_DRIFT:
                state = oracle.STATE_DRIFT
            elif s == oracle.STATE_WARNING and state == oracle.STATE_NORMAL:
                state = oracle.STATE_WARNING
        return flag, state

    def _baseline_moments(self, stat_rows: dict) -> tuple:
        """mean/std of the monitored stat over the baseline partitions;
        falls back to manifest metrics when baseline parts were validated
        in an earlier run."""
        import numpy as np
        vals = []
        manifest = self.io.read_manifest(self.scope)
        for p in self.baseline_parts:
            if p in stat_rows:
                vals.append(stat_rows[p][f"{MONITOR_COL}_mean"])
            elif p in manifest and manifest[p].get("metrics_json"):
                vals.append(json.loads(manifest[p]["metrics_json"])
                            [f"{MONITOR_COL}_mean"])
        if not vals:
            return 0.0, 1.0
        a = np.asarray(vals, dtype=float)
        return float(a.mean()), float(a.std(ddof=0) or 1.0)

    # -- reads ---------------------------------------------------------------

    def read_violations(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.io.root}/{self.violations_table}")

    def verdict_matrix(self) -> dict:
        m = self.io.read_manifest(self.scope)
        return {p: v["verdict"] for p, v in m.items() if v.get("status") == "done"}
