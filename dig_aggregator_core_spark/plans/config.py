"""Config + Provenance sources (reference Config.scala:15-31,
Provenance.scala:12-34, version.properties fixture).

The reference parses a nested JSON settings file into typed case classes
via json4s and a `version.properties` resource into a Provenance record
attached to run metadata. Driver-side concerns — plain Python here, no
Spark involvement (SURVEY.md §2.1 rows S11/S12).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class Config:
    """Typed settings loaded from a JSON file (Config.scala:22-30; sample
    schema README.md:63-80). Unknown keys are preserved in `extra` so user
    methods can carry their own settings blocks."""

    project: str
    ledger_dir: str
    out_dir: str
    extra: dict = field(default_factory=dict)

    @staticmethod
    def load(path: str) -> "Config":
        with open(path) as fh:
            raw = json.load(fh)
        known = {k: raw[k] for k in ("project", "ledger_dir", "out_dir") if k in raw}
        extra = {k: v for k, v in raw.items() if k not in known}
        return Config(**known, extra=extra)


@dataclass(frozen=True)
class Provenance:
    """Build provenance from a properties file (Provenance.scala:12-34):
    `source`, `branch`, `commit` — any may be absent."""

    source: Optional[str] = None
    branch: Optional[str] = None
    commit: Optional[str] = None

    @staticmethod
    def from_properties(path: str) -> "Provenance":
        """Minimal java-properties parse: `key=value` lines, `#`/`!`
        comments ignored (the reference reads the same via
        java.util.Properties)."""
        vals: dict[str, str] = {}
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line or line[0] in "#!" or "=" not in line:
                        continue
                    k, _, v = line.partition("=")
                    vals[k.strip()] = v.strip()
        return Provenance(
            source=vals.get("remote") or vals.get("source"),
            branch=vals.get("branch"),
            commit=vals.get("commit"),
        )

    def as_metadata(self) -> dict:
        """Attachable write metadata (non-None fields only)."""
        return {
            k: v
            for k, v in (
                ("source", self.source),
                ("branch", self.branch),
                ("commit", self.commit),
            )
            if v is not None
        }
