"""Per-partition checkpoint manifest — the resume-by-probe analogue.

The reference resumes downloads by probing whether a local file opens
(engines/s3.py:291-299, stac.py:129-142). Generalized: a run writes
output partitioned by ``part_id``; ``_manifest.json`` records, per
partition, row count + status, plus a run fingerprint (input path +
parameters + hasher version). A resumed run:

1. loads the manifest; on fingerprint mismatch starts fresh,
2. purges output dirs of NOT-done partitions (killed-mid-write safety:
   "done" is only set after the full write succeeds, so stale partial
   files in un-done partitions are deleted before re-processing),
3. filters done partitions out at the READ (cheap vectorized predicate)
   so completed work is never recomputed.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field


@dataclass
class RunManifest:
    path: str
    fingerprint: str
    partitions: dict[int, dict] = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)

    @classmethod
    def load(cls, out_dir: str, fingerprint: str) -> "RunManifest":
        """Load manifest compatible with ``fingerprint``, else a fresh one."""
        path = os.path.join(out_dir, "_manifest.json")
        if os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            if raw.get("fingerprint") == fingerprint:
                return cls(
                    path=path,
                    fingerprint=fingerprint,
                    partitions={int(k): v for k, v in raw.get("partitions", {}).items()},
                    metrics=raw.get("metrics", {}),
                )
        return cls(path=path, fingerprint=fingerprint)

    def done_partitions(self) -> set[int]:
        return {p for p, v in self.partitions.items() if v.get("status") == "done"}

    def mark_done(self, part_id: int, rows: int, **extra) -> None:
        self.partitions[part_id] = {"status": "done", "rows": rows, **extra}

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "fingerprint": self.fingerprint,
                    "partitions": {str(k): v for k, v in self.partitions.items()},
                    "metrics": self.metrics,
                },
                f,
                indent=1,
                default=str,
            )
        os.replace(tmp, self.path)  # atomic

    def purge_incomplete(self, data_dirs: list[str], num_partitions: int) -> list[int]:
        """Delete partition dirs not marked done (stale partial writes)."""
        done = self.done_partitions()
        purged = []
        for p in range(num_partitions):
            if p in done:
                continue
            for d in data_dirs:
                part_dir = os.path.join(d, f"part_id={p}")
                if os.path.exists(part_dir):
                    shutil.rmtree(part_dir)
                    purged.append(p)
        return sorted(set(purged))
