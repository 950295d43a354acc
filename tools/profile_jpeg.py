"""Walk-vs-IDCT attribution for the pure-numpy JPEG decoder.

VERDICT r12 next-round #5: with dequant+zigzag+IDCT batched to numpy
(operators/multimodal._idct_plane, r12), the canonical-Huffman entropy
walk is the presumed residual — this tool measures it ALONE, by timing
the full decode and the decode with _idct_plane stubbed to a
zeros-plane of the right shape (everything upstream of the stub — the
marker walk, DHT/DQT parse, and the entropy bit-walk — runs
unchanged). Reported per fixture: payload MB/s for the walk alone vs
the batched tail, on the same 512x512 baseline fixtures as the r12
SCALE.md rows (smooth ~ all-zero AC; seeded noise ~ worst-case
entropy density).

Usage: python tools/profile_jpeg.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import ranger_spark.operators.multimodal as mm  # noqa: E402
from test_multimodal_ops import _encode_baseline_jpeg_444  # noqa: E402


def _fixtures() -> dict[str, bytes]:
    quant = np.array([16] * 64)
    xx, yy = np.meshgrid(np.arange(512), np.arange(512))
    smooth = np.stack(
        [
            (xx // 64 * 16 + 60) % 256,
            (yy // 64 * 16 + 80) % 256,
            ((xx + yy) // 128 * 16 + 90) % 256,
        ],
        axis=2,
    ).astype(np.float64)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (512, 512, 3)).astype(np.float64)
    return {
        "smooth": _encode_baseline_jpeg_444(smooth, quant),
        "noise": _encode_baseline_jpeg_444(noise, quant),
    }


def _min_of(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = []
    for name, payload in _fixtures().items():
        mb = len(payload) / 1e6
        full = _min_of(lambda: mm.parse_jpeg_pixels(payload), reps)
        orig = mm._idct_plane

        def stub(store, q, m, zz_r, zz_c):
            nby, nbx, _ = store.shape
            return np.zeros((nby * 8, nbx * 8))

        mm._idct_plane = stub
        try:
            walk = _min_of(lambda: mm.parse_jpeg_pixels(payload), reps)
        finally:
            mm._idct_plane = orig
        rows.append(
            {
                "fixture": name,
                "payload_mb": round(mb, 3),
                "full_ms": round(full * 1e3, 1),
                "walk_ms": round(walk * 1e3, 1),
                "idct_tail_ms": round((full - walk) * 1e3, 1),
                "walk_mb_s": round(mb / walk, 2),
                "full_mb_s": round(mb / full, 2),
                "walk_share_pct": round(100 * walk / full, 1),
            }
        )
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
