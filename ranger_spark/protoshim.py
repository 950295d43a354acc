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
    if spec is not None and SHIM_DIR not in (spec.submodule_search_locations or [""])[0]:
        _state = "real"
        return _state
    if spec is not None:
        # the shim itself is already active (e.g. a worker process whose
        # PYTHONPATH the driver exported)
        _state = "shim"
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
