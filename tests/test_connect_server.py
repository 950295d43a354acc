"""Spark Connect endpoint boots and listens (subprocess-isolated: the
plugin must be set at session creation, so it can't share the test
fixture's JVM)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from ranger_spark.sources.connect_server import serve, is_listening
import time
spark = serve(port=15098, cpus=2)
ok = False
for _ in range(30):
    if is_listening(15098):
        ok = True
        break
    time.sleep(1)
print("LISTENING" if ok else "NOT_LISTENING")
spark.stop()
"""


def test_connect_endpoint_listens():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert "LISTENING" in out.stdout, out.stdout[-500:] + out.stderr[-500:]
