"""One long exclusive run of the scale-tier benches → benchmarks/SCALE_TIER.json.

The d=1024/N=1e5 programs take tens of minutes of REMOTE COMPILE on the
axon relay (measured: the 3-matmul dataset generator alone took 29 min
queued, scripts session r3), so they cannot fit the driver's bench window.
This script measures them once under a generous budget; bench.py merges the
artifact into BENCH_SUITE.json (clearly marked) whenever its own deadline
forces a live skip.

Run exclusively:  nohup python scripts/run_scale_tier.py > /tmp/scale.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (init before bench import)


def main():
    import bench

    out = {}
    for name, fn in [
        ("scale_logistic", bench.bench_scale_logistic),
        ("scale_nuts", bench.bench_scale_nuts),
        ("scale_chees", bench.bench_scale_chees),
        ("scale_densemass", bench.bench_scale_densemass),
        ("scale_plate", bench.bench_scale_plate),
        ("vi_scale", bench.bench_vi_scale),
    ]:
        t0 = time.perf_counter()
        try:
            row = fn()
        except Exception as e:
            row = {"submetric": name, "error": repr(e)}
        row["total_s_incl_compile"] = round(time.perf_counter() - t0, 1)
        row["measured"] = "separate exclusive session (compile too slow for the driver window)"
        out[name] = row
        print(json.dumps(row), flush=True)

    out["meta"] = {"device": str(jax.devices()[0])}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "SCALE_TIER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
