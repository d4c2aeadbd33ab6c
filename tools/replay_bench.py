"""Transaction-log replay microbench: substantiates the SCALING.md
claim that snapshot resolution over a ~10^6-add table is driver-side
seconds, and that checkpoints bound cold starts to one checkpoint read
plus a bounded JSON tail.

Pure Python — no Spark session; the log layer is deliberately
JVM-free so snapshot resolution costs no executor time.

Usage:  python tools/replay_bench.py [n_adds ...]   (default 1e5 1e6)
Prints one JSON line per scale with cold-replay / checkpoint timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_spark.log import AddFile, CommitInfo, DeltaLog, Metadata

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [{"name": "id", "type": "long", "nullable": True, "metadata": {}}],
    }
)

ADDS_PER_COMMIT = 10_000  # a large append lands ~10^4 files per commit


def build_log(path: str, n_adds: int) -> DeltaLog:
    log = DeltaLog(path, checkpoint_interval=0)  # no auto-checkpoints
    version = 0
    stats = json.dumps(
        {"minValues": {"id": 0}, "maxValues": {"id": 1}, "nullCount": {"id": 0}}
    )
    for start in range(0, n_adds, ADDS_PER_COMMIT):
        actions = [CommitInfo(operation="WRITE").to_action()]
        if version == 0:
            actions.append(Metadata(schemaString=SCHEMA).to_action())
        actions += [
            AddFile(
                path=f"data/part-{i:08d}.parquet",
                size=128 << 20,
                numRecords=1_000_000,
                stats=stats,
            ).to_action()
            for i in range(start, min(start + ADDS_PER_COMMIT, n_adds))
        ]
        log.commit(version, actions)
        version += 1
    return log


def churn_log(log: DeltaLog, n_live: int, churn_commits: int) -> int:
    """Rewrite the same 10^4-file slice repeatedly: total history grows
    by churn_commits * 2 * 10^4 actions while the live set stays n_live
    (the OPTIMIZE/MERGE-heavy table shape where checkpoints matter)."""
    stats = json.dumps(
        {"minValues": {"id": 0}, "maxValues": {"id": 1}, "nullCount": {"id": 0}}
    )
    version = log.latest_version()
    slice_n = min(ADDS_PER_COMMIT, n_live)
    from delta_lake_spark.log import RemoveFile

    for c in range(churn_commits):
        version += 1
        actions = [CommitInfo(operation="OPTIMIZE").to_action()]
        actions += [
            RemoveFile(path=f"data/part-{i:08d}.parquet").to_action()
            if c % 2 == 0
            else RemoveFile(path=f"data/rw{c-1}-{i:08d}.parquet").to_action()
            for i in range(slice_n)
        ]
        actions += [
            AddFile(
                path=f"data/rw{c}-{i:08d}.parquet"
                if c % 2 == 0
                else f"data/part-{i:08d}.parquet",
                size=128 << 20,
                numRecords=1_000_000,
                stats=stats,
            ).to_action()
            for i in range(slice_n)
        ]
        log.commit(version, actions)
    return version


def cold_snapshot_seconds(path: str, **log_kwargs) -> float:
    t0 = time.perf_counter()
    snap = DeltaLog(path, **log_kwargs).snapshot()
    dt = time.perf_counter() - t0
    assert snap.files  # materialized, not lazy
    return dt


def main() -> None:
    scales = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    for n in scales:
        base = tempfile.mkdtemp(prefix="replaybench-")
        path = os.path.join(base, "tbl")
        try:
            log = build_log(path, n)
            n_commits = -(-n // ADDS_PER_COMMIT)

            replay_s = cold_snapshot_seconds(path)

            # single-file (or auto-split multi-part) checkpoint at head
            t0 = time.perf_counter()
            v = log.write_checkpoint()
            ckpt_write_s = time.perf_counter() - t0
            ckpt_s = cold_snapshot_seconds(path)

            # forced multi-part checkpoint (4 slices)
            for name in os.listdir(log.log_path):
                if ".checkpoint." in name:
                    os.remove(os.path.join(log.log_path, name))
            os.remove(log._last_checkpoint_file())
            t0 = time.perf_counter()
            log.write_checkpoint(v, parts=4)
            mp_write_s = time.perf_counter() - t0
            mp_s = cold_snapshot_seconds(path)

            # churn: history grows to ~5x the live set, then checkpoint —
            # replay cost follows HISTORY, checkpoint cost follows LIVE
            churn_commits = max(2, (2 * n_commits))
            head = churn_log(log, n, churn_commits)
            churn_replay_s = cold_snapshot_seconds(path)
            log.write_checkpoint(head)
            churn_ckpt_s = cold_snapshot_seconds(path)
            total_actions = n + churn_commits * 2 * min(ADDS_PER_COMMIT, n)

            print(
                json.dumps(
                    {
                        "n_adds": n,
                        "n_commits": n_commits,
                        "cold_json_replay_sec": round(replay_s, 3),
                        "ckpt_write_sec": round(ckpt_write_s, 3),
                        "cold_from_ckpt_sec": round(ckpt_s, 3),
                        "multipart_write_sec": round(mp_write_s, 3),
                        "cold_from_multipart_sec": round(mp_s, 3),
                        "churn_total_actions": total_actions,
                        "churn_cold_json_replay_sec": round(churn_replay_s, 3),
                        "churn_cold_from_ckpt_sec": round(churn_ckpt_s, 3),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
