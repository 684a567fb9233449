"""S5 — idempotent stage checkpoints (BASELINE.json:6 "resumable from
Iceberg-backed checkpoints").

Each stage's output is committed atomically through the Catalog (Iceberg
snapshot on a cluster; temp-dir + rename + manifest in the parquet
fallback). A stage is skipped on re-run iff its manifest exists AND its
recorded config fingerprint matches — a config change invalidates the
stage and everything downstream (SURVEY.md §3 entry point 3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .catalog import Catalog


class Checkpointer:
    def __init__(self, catalog: Catalog, run_id: str, fingerprint: str,
                 enabled: bool = True, reuse: bool = True):
        """``reuse=False`` (jobs run without --resume) recomputes every
        stage, overwriting stale checkpoints for the run_id."""
        self.catalog = catalog
        self.run_id = run_id
        self.fingerprint = fingerprint
        self.enabled = enabled
        self.reuse = reuse
        self.skipped: list[str] = []
        self.computed: list[str] = []

    def _ident(self, stage: str) -> str:
        return f"ckpt.{self.run_id}.{stage}"

    def done(self, stage: str) -> bool:
        if not self.reuse:
            return False
        ident = self._ident(stage)
        if not self.catalog.exists(ident):
            return False
        # fingerprint lives in the parquet manifest meta OR the Iceberg
        # table properties (hsip.fingerprint) — Catalog.properties()
        # normalizes both, so a config change invalidates the stage on
        # the cluster path too (ADVICE.md r1)
        return self.catalog.properties(ident).get("fingerprint") == self.fingerprint

    def materialize(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage output, recomputing only if not checkpointed."""
        if not self.enabled:
            return build()
        if self.done(stage):
            self.skipped.append(stage)
            return self.catalog.read(self._ident(stage))
        df = build()
        self.catalog.write(df, self._ident(stage), meta={"fingerprint": self.fingerprint})
        self.computed.append(stage)
        return self.catalog.read(self._ident(stage))
