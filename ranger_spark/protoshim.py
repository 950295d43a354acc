"""Activation for the vendored pure-Python ``google.protobuf`` shim.

Spark 4's ``transformWithStateInPandas`` Python worker has exactly one
hard third-party dependency: the protobuf runtime behind the generated
``pyspark.sql.streaming.proto.StateMessage_pb2`` module. In environments
without a protobuf distribution that single import is what gates the
whole API (the reference-adjacent surface this repo has carried as
"environment-blocked" since round 1).

``ensure_protobuf()`` closes the gate honestly:

- if a real ``google.protobuf`` is importable, it is left untouched and
  always wins ("real");
- otherwise the vendored minimal runtime subset
  (``ranger_spark/vendor/pyshims/google/protobuf`` — see its docstring
  for scope) is prepended to ``sys.path`` AND to the ``PYTHONPATH``
  environment variable ("shim"). The env export matters: Spark's Python
  workers are separate processes launched by the JVM with the JVM's
  inherited environment, so the shim must be on PYTHONPATH *before the
  first SparkSession starts* for executors to see it.
  ``ranger_spark.session.get_spark`` therefore calls this first.

Validation story: the JVM StateServer speaks real Java protobuf, so
every transformWithStateInPandas round-trip is a two-direction interop
gate for the shim's wire bytes (tests/test_stateful_streaming.py,
tests/test_protoshim.py) — the same reference-implementation-validation
pattern as the zstd codec vs libzstd (NOTES.md round-10 item 9).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "vendor", "pyshims")

_state: str | None = None


def ensure_protobuf() -> str:
    """Make ``google.protobuf`` importable. Returns "real" or "shim"."""
    global _state
    if _state is not None:
        return _state
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except (ImportError, ModuleNotFoundError):
        spec = None
    if spec is not None:
        locations = list(spec.submodule_search_locations or [])
        if any(SHIM_DIR in loc for loc in locations):
            # the shim itself is already active (e.g. a worker process
            # whose PYTHONPATH the driver exported)
            _state = "shim"
        else:
            _state = "real"
        return _state
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    pp = os.environ.get("PYTHONPATH", "")
    parts = pp.split(os.pathsep) if pp else []
    if SHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            SHIM_DIR + (os.pathsep + pp if pp else "")
        )
    importlib.invalidate_caches()
    _state = "shim"
    return _state


_shipped_contexts: set[int] = set()


def ensure_protobuf_on_workers(spark) -> str:
    """Make ``google.protobuf`` importable in Spark's PYTHON WORKERS too.

    The PYTHONPATH export in :func:`ensure_protobuf` only reaches workers
    when the JVM starts AFTER it ran (ranger_spark.session.get_spark
    guarantees that). A session created elsewhere — the driver harness
    builds a plain ``SparkSession`` before importing this repo — has
    already frozen the JVM environment, so the shim is shipped the way
    any runtime dependency is shipped to workers: zipped once and
    ``addPyFile``-ed (workers prepend submitted pyFiles to sys.path at
    startup). Idempotent per SparkContext. Returns the active mode.
    """
    mode = ensure_protobuf()
    if mode != "shim":
        return mode
    sc = spark.sparkContext
    # Python workers get their PYTHONPATH from the *UDF's* envVars
    # (pyspark reads sc.environment live at UDF creation —
    # _prepare_for_python_RDD), which the JVM worker factory merges into
    # the spawned interpreter's environment. This is what reaches the
    # transformWithState DRIVER worker (StreamingPythonRunner), which
    # does not process submitted pyFiles. Driver-node path: fine — that
    # worker always runs where this repo lives.
    pp = sc.environment.get("PYTHONPATH", "")
    if SHIM_DIR not in pp.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            SHIM_DIR + (os.pathsep + pp if pp else "")
        )
    key = id(sc)
    if key in _shipped_contexts:
        return mode
    import hashlib
    import zipfile

    sources = sorted(
        os.path.join(root, fn)
        for root, _dirs, files in os.walk(os.path.join(SHIM_DIR, "google"))
        for fn in files
        if fn.endswith(".py")
    )
    digest = hashlib.sha256()
    for full in sources:
        with open(full, "rb") as f:
            digest.update(f.read())
    # content-addressed name: a shim source change can never ship a
    # stale cached zip (and addPyFile dedupes by file name per context)
    zip_path = f"/tmp/ranger_protoshim_google_{digest.hexdigest()[:12]}.zip"
    if not os.path.exists(zip_path):
        tmp = f"{zip_path}.{os.getpid()}.part"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, SHIM_DIR))
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _shipped_contexts.add(key)
    return mode
