"""Server entrypoint — the reference's cmd/server/main.go shape.

    python tools/ranger_server.py [config.yml] [--ephemeral-ports]

Loads ``ranger-server.yml`` from the working directory (or the given
path); a missing file falls back to the built-in defaults exactly like
the reference (main.go:16-20). Boots a SparkSession + the protocol
gateway (HTTP 2847, pgwire 2848, native 2849 — constants.go), prints
the bound ports as one JSON line, then blocks until SIGINT/SIGTERM and
shuts down gracefully (main.go:39-66).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ephemeral = "--ephemeral-ports" in sys.argv
    cfg_path = args[0] if args else "ranger-server.yml"

    from ranger_spark.config import gateway_from_config, load_config
    from ranger_spark.engine import Engine
    from ranger_spark.errors import RangerError
    from ranger_spark.gateway import Gateway
    from ranger_spark.session import get_spark

    spark = get_spark("ranger_server")
    try:
        load_config(cfg_path)  # raises on unreadable/invalid file
        gw = gateway_from_config(spark, cfg_path, ephemeral_ports=ephemeral)
        src = cfg_path
    except RangerError as e:
        if e.code != "config.file_read_failed":
            print(f"invalid config: {e}", file=sys.stderr)
            return 1
        # file not found → default configuration (main.go:16-20)
        kw = dict(http_port=0, jdbc_port=0, native_port=0) if ephemeral else {}
        gw = Gateway(Engine(spark), **kw).start()
        src = "<defaults>"
    print(
        json.dumps({"status": "started", "config": src, "ports": gw.ports()}),
        flush=True,
    )

    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    stop.wait()
    print("shutting down data lakehouse server...", file=sys.stderr)
    gw.shutdown()
    spark.stop()
    print(json.dumps({"status": "stopped"}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
