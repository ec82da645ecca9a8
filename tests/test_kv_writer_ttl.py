"""KV writer contract incl. TTL (S4/S5 + the r10 verdict's TTL nit).

The reference's feature-store design TTLs its Redis keys (600 s
user/item, 300 s global — `flink-jobs/redis_sink copy.sql:167-168`);
`foreach_partition_kv_writer` gained an optional `ttl_seconds` that
pairs every HSET with an EXPIRE. The fake client logs every call to a
per-partition file because `foreachPartition` runs in separate Python
worker processes — an in-memory list would stay on the executor.
"""

from __future__ import annotations

import json
import os
import uuid

from tests.conftest import SF_SMOKE


class _FileLoggingKV:
    """Picklable fake client: one log file per instance (= partition)."""

    def __init__(self, log_dir: str):
        self._f = open(os.path.join(log_dir, f"{uuid.uuid4().hex}.jsonl"), "w")

    def hset(self, key, mapping):
        self._f.write(json.dumps(["hset", key, dict(mapping)]) + "\n")

    def expire(self, key, seconds):
        self._f.write(json.dumps(["expire", key, seconds]) + "\n")

    def close(self):
        self._f.close()


def _read_ops(log_dir: str) -> list[list]:
    ops = []
    for name in sorted(os.listdir(log_dir)):
        with open(os.path.join(log_dir, name)) as f:
            ops.append([json.loads(line) for line in f])
    return ops


def test_fp2_kv_write_pairs_every_hset_with_expire(spark, tmp_path):
    from kafka_flink_streaming_pipeline_spark.plans.feature_store import (
        FP2_FEATURE_TTL_S,
        fp2_kv_rows,
        fp2_kv_write,
    )

    log_dir = str(tmp_path)
    fp2_kv_write(spark, SF_SMOKE, lambda: _FileLoggingKV(log_dir))

    expected = {
        r.redis_key: json.loads(r.redis_hash_json)
        for r in fp2_kv_rows(spark, SF_SMOKE).collect()
    }
    assert expected, "smoke data must produce at least one feature row"

    written, expired = {}, {}
    for partition_ops in _read_ops(log_dir):
        # within a partition, each hset is IMMEDIATELY followed by the
        # matching expire — a crash between the two leaves at most one
        # un-TTL'd key, never a drifting backlog
        for op, nxt in zip(partition_ops, partition_ops[1:] + [None]):
            if op[0] == "hset":
                written[op[1]] = op[2]
                assert nxt is not None and nxt[0] == "expire" and nxt[1] == op[1], (
                    f"hset {op[1]} not followed by its expire"
                )
            else:
                expired[op[1]] = op[2]

    assert written == expected
    assert set(expired) == set(expected)
    assert set(expired.values()) == {FP2_FEATURE_TTL_S}


def test_kv_writer_without_ttl_never_calls_expire(spark, tmp_path):
    from kafka_flink_streaming_pipeline_spark.sinks import (
        foreach_partition_kv_writer,
    )

    df = spark.createDataFrame(
        [("k1", {"a": "1"}), ("k2", {"b": "2"})],
        "redis_key string, redis_hash map<string,string>",
    )
    log_dir = str(tmp_path)
    foreach_partition_kv_writer(df, lambda: _FileLoggingKV(log_dir))
    ops = [op for part in _read_ops(log_dir) for op in part]
    assert {op[0] for op in ops} == {"hset"}
    assert {op[1]: op[2] for op in ops} == {"k1": {"a": "1"}, "k2": {"b": "2"}}

