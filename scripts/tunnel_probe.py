"""Tunnel-state probe: time a trivial op round-trip on the TPU.

Prints ONE JSON line {"probe_ms": ..., "backend": ...}. The suite runner
stamps this into every jsonl row so later readers can adjudicate
throughput spreads against the tunnel state of the capture
(VERDICT r4 item 6: the 1800-col all-sky spread had no tunnel metadata).
"""
from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    jax.block_until_ready(x + 1.0)  # compile + first-op latency outside
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(x + 1.0)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"probe_ms": round(best * 1e3, 3),
                      "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
