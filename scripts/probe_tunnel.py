"""Axon-tunnel data-plane forensics: the first-d2h stall (VERDICT r4 task 2).

Each trial is a FRESH process that times, in order: first h2d (tiny),
first d2h (tiny), second d2h, then bulk h2d/d2h bandwidth at 59 MB (a
150x130x768 f32 scan cube). Run with ``--trials N``.

Measured 2026-08-19 (real v5e behind the tunnel, 6 fresh processes):

    first h2d  : 0.031-0.043 s              (never stalls)
    first d2h  : 0.22, 0.33, 2.26, 2.3, 249.5, 476.4 s   <-- BIMODAL
    second d2h : 0.000-0.039 s              (never stalls)
    bulk h2d   : ~43 MB/s steady (one 10 s outlier at 16 MB)
    bulk d2h   : ~36-41 MB/s steady

Conclusion: the tunnel's d2h data plane has a per-idle-period cold start
of minutes, paid by the FIRST device->host transfer of the first process
to touch it; every later d2h (same or subsequent process) is milliseconds.
This — not XLA-cache misses, which scripts/diag_firstopen.py rules out
with a per-program hit/miss table — was the round-3/4 warm-open
nondeterminism (7 s vs 53.7 s for identical repo work). Mitigation:
``utils/warmup.py`` issues a tiny h2d+d2h at Explorer construction on a
background thread; ``bench.py`` times it per run (``tunnel_first_d2h_s``).

The reference app is CPU-local (``io.rs:496-631``) and has no transfer at
all; this cost is environment, not program.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

_TRIAL = """
import time, json
import numpy as np
import warnings; warnings.filterwarnings("ignore")
import jax
dev = jax.devices()[0]
out = {}
x = np.zeros(8, np.float32)
t0 = time.perf_counter(); y = jax.device_put(x, dev); y.block_until_ready()
out["first_h2d_s"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter(); np.asarray(y)
out["first_d2h_s"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter(); np.asarray(y)
out["second_d2h_s"] = round(time.perf_counter() - t0, 3)
big = np.random.rand(150 * 130 * 768).astype(np.float32)  # 59 MB
mb = big.nbytes / 1e6
t0 = time.perf_counter(); yb = jax.device_put(big, dev); yb.block_until_ready()
out["bulk_h2d_mb_s"] = round(mb / (time.perf_counter() - t0), 1)
t0 = time.perf_counter(); np.asarray(yb)
out["bulk_d2h_mb_s"] = round(mb / (time.perf_counter() - t0), 1)
print(json.dumps(out))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    trials = []
    for i in range(args.trials):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _TRIAL], capture_output=True,
                text=True, timeout=args.timeout,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
            trials.append(json.loads(line))
        except subprocess.TimeoutExpired:
            trials.append({"error": f"timeout (> {args.timeout} s)"})
        except Exception as e:  # noqa: BLE001
            trials.append({"error": str(e)[:200]})
        print(json.dumps({"trial": i, **trials[-1]}), flush=True)
    # successful trials only: an inf sentinel serializes as bare
    # `Infinity`, which strict JSON parsers reject (bench.py keeps the
    # same rule for its warm-open median)
    firsts = sorted(t["first_d2h_s"] for t in trials if "first_d2h_s" in t)
    print(json.dumps({
        "n": len(trials),
        "n_failed": sum("first_d2h_s" not in t for t in trials),
        "first_d2h_median_s": firsts[len(firsts) // 2] if firsts else -1,
        "first_d2h_max_s": firsts[-1] if firsts else -1,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
