"""On-hardware correctness gate: run the pallas/seg kernel tests and the
fluid-coupled rigid-body physics gates on the REAL TPU (Mosaic-compiled
kernels, not interpret mode) and record the outcome as a JSON artifact the
repo checks in (artifacts/tpu_gate.json).

    PYTHONPATH=.:/root/.axon_site python tools/run_tpu_gate.py [suite...]

With suite-name substrings as argv, runs only the matching suites and
MERGES their results into the existing artifact (other suites' entries
are kept); with no args, runs everything and rewrites the artifact.

The CPU CI runs the same tests in interpret mode; this artifact is the
evidence that the compiled kernels agree with the oracle ON HARDWARE
(VERDICT r1 weak #5) and that the buoyancy gates pass on TPU (weak #3).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

SUITES = [
    ("pallas_kernels", ["tests/test_pallas.py"]),
    ("seg_kernels", ["tests/test_seg.py"]),
    ("csr_bounds", ["tests/test_grid.py::test_csr_bounds_fast_matches_hist"]),
    ("rigid_buoyancy", ["tests/test_rigid_dynamics.py", "-m", "slow"]),
]


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TISPH_TEST_TPU="1")
    filters = sys.argv[1:]
    suites = [s for s in SUITES
              if not filters or any(f in s[0] for f in filters)]
    if not suites:
        print(f"no suite matches {filters}; have "
              f"{[n for n, _ in SUITES]}", file=sys.stderr)
        return 2
    out = os.path.join(here, "artifacts", "tpu_gate.json")
    results = {}
    if filters and os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("suites", {})
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=here,
            capture_output=True, text=True,
        ).stdout.strip() or None
    except OSError:
        rev = None
    ok = True
    for name, args in suites:
        cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
               "-o", "addopts=", *args]
        print(f"== {name}: {' '.join(args)}", flush=True)
        p = subprocess.run(cmd, cwd=here, env=env, capture_output=True,
                           text=True)
        tail = (p.stdout or "").strip().splitlines()[-1:]
        # per-suite provenance: merged artifacts (filtered reruns keep the
        # other suites' old entries) must show which results are stale
        results[name] = {
            "args": args,
            "returncode": p.returncode,
            "summary": tail[0] if tail else "",
            "date": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(),
            "revision": rev,
        }
        print(f"   {results[name]['summary']} (rc={p.returncode})", flush=True)
        ok &= p.returncode == 0
    # merged (not-rerun) suites count toward ok too
    ok &= all(r.get("returncode") == 0 for r in results.values())
    import jax

    artifact = {
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "device": str(jax.devices()[0]),
        "platform": jax.default_backend(),
        "interpret": False,
        "suites": results,
        "ok": ok,
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"artifact written: {out} ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
