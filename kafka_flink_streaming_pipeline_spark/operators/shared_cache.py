"""Cross-process disk persistence for the session-shared one-time
builds (pair graphs, PQ code tables, the IVF inverted file, the
power-iteration direction).

`_session_shared` (operators/dedup.py) already materializes these once
per SESSION; but every battery/driver process rebuilt them from
scratch (~22 s of the 142 s r7 battery). Their own docstrings argue
the artifacts are write-once at 100 TB — a production curation DAG
materializes its candidate-pair table / ANN index ONCE and every
downstream consumer reads it from storage. This module makes the local
harness do what the docstrings say: artifacts land under
`spark-warehouse/shared_cache/<key>__<fingerprint>/`, where the
fingerprint covers

- the resolved sf_dir path,
- (name, mtime_ns, size) of every parquet file in it — the testdata
  is immutable per sf_dir, so any regeneration invalidates the key,
- the artifact key and `CACHE_VERSION`.

`CACHE_VERSION` MUST be bumped whenever a builder's logic changes —
the cache cannot see code. A forgotten bump is loud, not silent: the
driver re-derives every oracle in DuckDB from the raw parquet, so a
stale cached artifact hash-mismatches immediately.

Concurrency: builds write to a pid-suffixed temp dir and `os.rename`
into place — first writer wins, losers read the winner's artifact.
Set SPARK_GRAFT_SHARED_CACHE=0 to disable (in-memory behavior only).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path

CACHE_VERSION = 1

_ROOT = Path(__file__).resolve().parents[2] / "spark-warehouse" / "shared_cache"


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_SHARED_CACHE", "1") != "0"


def sf_fingerprint(sf_dir: str) -> str:
    p = Path(sf_dir).resolve()
    stats = []
    for f in sorted(p.glob("*.parquet")):
        st = f.stat()
        stats.append((f.name, st.st_mtime_ns, st.st_size))
    blob = json.dumps([str(p), CACHE_VERSION, stats]).encode()
    return hashlib.md5(blob).hexdigest()[:16]


def artifact_dir(key: str, sf_dir: str) -> Path:
    return _ROOT / f"{key}__{sf_fingerprint(sf_dir)}"


def publish(tmp: Path, final: Path) -> Path:
    """Atomically promote a freshly built artifact; on a race the
    first writer wins and the loser's copy is discarded."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not final.exists():
            raise
    return final


def get_or_build_df(spark, sf_dir: str, key: str, build):
    """DataFrame-valued artifact: serve `spark.read.parquet` from the
    cache when fresh, else build(), persist, and serve the parquet
    round-trip (so first and later processes read IDENTICAL bytes).
    Empty results are never cached (a 0-row build may be legitimate
    at tiny SF; writing it can produce a schema-less directory)."""
    if not enabled():
        return build().localCheckpoint()
    final = artifact_dir(key, sf_dir)
    if not (final / "_SUCCESS").exists():
        df = build().localCheckpoint()
        if df.isEmpty():
            return df
        _ROOT.mkdir(parents=True, exist_ok=True)
        tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
        df.write.mode("overwrite").parquet(str(tmp))
        publish(tmp, final)
    return spark.read.parquet(str(final))


def get_or_build_json(sf_dir: str, key: str, build):
    """Small python-valued artifact (e.g. the 64-int power-iteration
    direction): json file next to the parquet artifacts."""
    if not enabled():
        return build()
    final = artifact_dir(key, sf_dir).with_suffix(".json")
    if final.exists():
        return json.loads(final.read_text())
    value = build()
    _ROOT.mkdir(parents=True, exist_ok=True)
    tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
    tmp.write_text(json.dumps(value))
    os.replace(tmp, final)
    return value


def get_or_build_path(key: str, sf_dir: str, build_into) -> str:
    """Path-valued artifact (the partitioned IVF inverted file):
    `build_into(tmp_path)` writes the artifact, which is then promoted
    into the cache; returns the final directory path."""
    final = artifact_dir(key, sf_dir)
    if not enabled():
        import tempfile

        path = tempfile.mkdtemp(prefix=f"{key}_")
        build_into(path)
        return path
    if not final.exists():
        _ROOT.mkdir(parents=True, exist_ok=True)
        tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
        build_into(str(tmp))
        publish(tmp, final)
    return str(final)
