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
- the artifact key and `CACHE_VERSION`,
- a hash of the BUILDER'S SOURCE (the `build` callable plus every
  package-local function it directly references) — an edit to the
  builder's logic invalidates its cached artifact automatically, so
  `CACHE_VERSION` is a belt-and-braces hammer, not the only guard.

Crash/torn-write safety: builds write to a pid-suffixed temp dir and
`os.rename` into place — first writer wins, losers read the winner's
artifact. A validity marker (`_SUCCESS` for Spark-written parquet,
`_CACHE_OK` for path artifacts) distinguishes a published artifact
from a torn one: a final dir missing its marker is deleted and
rebuilt. Temp dirs from crashed builders (pid no longer alive) are
swept before each build. `try/finally` removes this process's temp
dir on any build failure.

Set SPARK_GRAFT_SHARED_CACHE=0 to disable (in-memory behavior only).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import shutil
from pathlib import Path

CACHE_VERSION = 2  # r9: builder-source fingerprint + torn-write recovery

_ROOT = Path(__file__).resolve().parents[2] / "spark-warehouse" / "shared_cache"

#: our own marker for artifacts not written by Spark (get_or_build_path
#: builders write Spark parquet INSIDE the dir, but the dir itself may
#: hold extra sidecar files — mark the whole publish unit).
_OK_MARKER = "_CACHE_OK"


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_SHARED_CACHE", "1") != "0"


_PKG_PREFIX = "kafka_flink_streaming_pipeline_spark"


def _code_fp(build) -> str:
    """Hash the builder's source plus the source of every package-local
    function it directly references (one level — enough to catch an
    edit to e.g. `build_ann_index` behind a thin lambda). Falls back to
    raw bytecode when source is unavailable (REPL-defined callables);
    unresolvable referents are skipped, so this is best-effort by
    design — CACHE_VERSION remains the manual override."""
    pieces: list[str] = []
    try:
        pieces.append(inspect.getsource(build))
    except (OSError, TypeError):
        code = getattr(build, "__code__", None)
        pieces.append(code.co_code.hex() if code is not None else repr(build))
    code = getattr(build, "__code__", None)
    glb = getattr(build, "__globals__", {})
    if code is not None:
        for name in sorted(set(code.co_names)):
            ref = glb.get(name)
            if ref is None or not callable(ref):
                continue
            if not getattr(ref, "__module__", "").startswith(_PKG_PREFIX):
                continue
            try:
                pieces.append(inspect.getsource(ref))
            except (OSError, TypeError):
                pass
    return hashlib.md5("\n".join(pieces).encode()).hexdigest()[:12]


def sf_fingerprint(sf_dir: str, build=None) -> str:
    p = Path(sf_dir).resolve()
    stats = []
    for f in sorted(p.glob("*.parquet")):
        st = f.stat()
        stats.append((f.name, st.st_mtime_ns, st.st_size))
    code_fp = _code_fp(build) if build is not None else ""
    blob = json.dumps([str(p), CACHE_VERSION, code_fp, stats]).encode()
    return hashlib.md5(blob).hexdigest()[:16]


def artifact_dir(key: str, sf_dir: str, build=None) -> Path:
    return _ROOT / f"{key}__{sf_fingerprint(sf_dir, build)}"


def _sweep_stale_tmp(final: Path) -> None:
    """Remove `<name>.tmp.<pid>` siblings left by builders that died
    mid-write. Only dirs whose owning pid is no longer alive are
    removed — a concurrent live build keeps its temp dir."""
    for tmp in final.parent.glob(final.name + ".tmp.*"):
        pid_txt = tmp.name.rsplit(".", 1)[-1]
        if not pid_txt.isdigit():
            continue
        pid = int(pid_txt)
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(tmp, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it


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


def _valid(final: Path, marker: str) -> bool:
    return (final / marker).exists()


def _clear_torn(final: Path, marker: str) -> None:
    """A final dir without its validity marker is a torn publish (e.g.
    a crash between mkdir and marker write under a non-atomic fs, or a
    partial copy restored from backup) — delete it so the caller
    rebuilds rather than serving garbage."""
    if final.exists() and not _valid(final, marker):
        shutil.rmtree(final, ignore_errors=True)


def get_or_build_df(spark, sf_dir: str, key: str, build):
    """DataFrame-valued artifact: serve `spark.read.parquet` from the
    cache when fresh, else build(), persist, and serve the parquet
    round-trip (so first and later processes read IDENTICAL bytes).
    Empty results are never cached (a 0-row build may be legitimate
    at tiny SF; writing it can produce a schema-less directory)."""
    if not enabled():
        return build().localCheckpoint()
    final = artifact_dir(key, sf_dir, build)
    _clear_torn(final, "_SUCCESS")
    if not _valid(final, "_SUCCESS"):
        df = build().localCheckpoint()
        if df.isEmpty():
            return df
        _ROOT.mkdir(parents=True, exist_ok=True)
        _sweep_stale_tmp(final)
        tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
        try:
            df.write.mode("overwrite").parquet(str(tmp))
            publish(tmp, final)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(str(final))


def get_or_build_json(sf_dir: str, key: str, build):
    """Small python-valued artifact (e.g. the 64-int power-iteration
    direction): json file next to the parquet artifacts. The write is
    a same-directory `os.replace`, so torn files cannot be observed."""
    if not enabled():
        return build()
    final = artifact_dir(key, sf_dir, build).with_suffix(".json")
    if final.exists():
        return json.loads(final.read_text())
    value = build()
    _ROOT.mkdir(parents=True, exist_ok=True)
    tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
    try:
        tmp.write_text(json.dumps(value))
        os.replace(tmp, final)
    finally:
        if tmp.exists():
            tmp.unlink(missing_ok=True)
    return value


def get_or_build_path(key: str, sf_dir: str, build_into) -> str:
    """Path-valued artifact (the partitioned IVF inverted file):
    `build_into(tmp_path)` writes the artifact, which is then promoted
    into the cache; returns the final directory path."""
    if not enabled():
        import tempfile

        path = tempfile.mkdtemp(prefix=f"{key}_")
        build_into(path)
        return path
    final = artifact_dir(key, sf_dir, build_into)
    _clear_torn(final, _OK_MARKER)
    if not _valid(final, _OK_MARKER):
        _ROOT.mkdir(parents=True, exist_ok=True)
        _sweep_stale_tmp(final)
        tmp = final.with_name(final.name + f".tmp.{os.getpid()}")
        try:
            build_into(str(tmp))
            (Path(tmp) / _OK_MARKER).touch()
            publish(tmp, final)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return str(final)
