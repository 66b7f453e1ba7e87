"""Lake path provider — parity with the reference's path module
(`src/common/paths.py:23-55`) and its env-switchable local override
(`local_overrides/src/common/paths.py:8-31`).

The lake root comes from ``$SPARK_GRAFT_LAKE_ROOT`` (local dir or any
Hadoop-FS URI such as s3a://bucket) so swapping local testing for object
storage is configuration, not code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class LakePaths:
    root: str

    @classmethod
    def from_env(cls, default: str = "/tmp/spark_graft_lake") -> LakePaths:
        return cls(root=os.environ.get("SPARK_GRAFT_LAKE_ROOT", default))

    def bronze(self, name: str) -> str:
        return f"{self.root.rstrip('/')}/bronze/{name}"

    def bronze_misc(self, name: str) -> str:
        """Unknown-input fallback (`src/common/paths.py:53-55` parity)."""
        return f"{self.root.rstrip('/')}/bronze/misc/{name}"

    def silver(self, name: str) -> str:
        return f"{self.root.rstrip('/')}/silver/{name}"

    def gold(self, name: str) -> str:
        return f"{self.root.rstrip('/')}/gold/{name}"

    def artifact(self, name: str) -> str:
        return f"{self.root.rstrip('/')}/artifacts/{name}"
