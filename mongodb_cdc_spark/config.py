"""Engine configuration surface — the reference's config object (js:12-41)
re-expressed for Spark deployment.

Field-for-field mapping (reference -> engine):

| reference (js) | here | notes |
|---|---|---|
| source.uri/db/collection (js:14-18) | CDCConfig.source_* | connector reader opts |
| target.uri/db/collection (js:19-23) | CDCConfig.target_* | connector writer / state path |
| batchSize=1000 (js:25) | max_files_per_trigger / connector maxBatchSize | micro-batch sizing |
| checkpointIntervalMs=30000 (js:24) | (gone) | Spark commits offsets per batch; the knob becomes trigger_interval |
| 5 s flush timer (js:326-349) | trigger_interval="5 seconds" | |
| checkpointFile (js:26) | checkpoint_dir | Spark offset/commit log |
| logConfig (js:35-40) | driver/executor log4j config | out of engine scope |
| email alerts (js:28-34) | on_alert callback (monitor.py) | |
| CLI --start-time/--end-time (md:108-109) | start_time/end_time | source starting offsets / filter |
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class CDCConfig:
    """Deployment configuration for the CDC replication pipeline."""

    # source change feed: a file path (test/file-backed) or mongodb:// URI
    source: str = "mongodb://localhost:27017"
    source_database: str = "AUTH"
    source_collection: str = "events"
    # target: upsert state directory (bundled target) or mongodb:// URI
    target: str = "/tmp/cdc-target"
    target_database: str = "AUTH"
    target_collection: str = "events"
    checkpoint_dir: str = "/tmp/cdc-checkpoint"
    trigger_interval: str = "5 seconds"  # js:326-349 flush cadence
    watermark: str = "10 minutes"
    max_files_per_trigger: int = 1000  # js:25 batchSize analog (file source)
    start_time: str | None = None  # md:108 --start-time
    end_time: str | None = None  # md:109 --end-time
    max_healthy_lag_s: int = 300  # js:557

    @classmethod
    def from_env(cls, **overrides) -> "CDCConfig":
        """12-factor style: CDC_SOURCE, CDC_TARGET, CDC_CHECKPOINT_DIR,
        CDC_TRIGGER_INTERVAL env vars, then keyword overrides."""
        kwargs = {}
        for f, env in (
            ("source", "CDC_SOURCE"),
            ("target", "CDC_TARGET"),
            ("checkpoint_dir", "CDC_CHECKPOINT_DIR"),
            ("trigger_interval", "CDC_TRIGGER_INTERVAL"),
        ):
            if os.environ.get(env):
                kwargs[f] = os.environ[env]
        kwargs.update(overrides)
        return cls(**kwargs)

    @property
    def file_backed(self) -> bool:
        return not self.source.startswith("mongodb://")
