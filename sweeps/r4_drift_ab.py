"""r4: headline-bench drift A/B — round-1 library vs HEAD, interleaved.

Runs the CURRENT bench.py (best-of-3, 6000-epoch window) against both
library versions in one session, alternating r1/HEAD three times, so
tunnel weather cancels and any systematic gap is library code.
"""
import json, subprocess, sys, time

R1 = "/tmp/r1_worktree"
HEAD = "/root/repo"

def run(lib):
    p = subprocess.run(
        [sys.executable, "/tmp/bench_ab.py"],
        capture_output=True, text=True, cwd=lib,
        env={"PATH": "/usr/bin:/bin:/opt/venv/bin", "PYTHONPATH": lib,
             "HOME": "/root"},
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(json.dumps({"lib": lib, "error": p.stderr[-500:]}), flush=True)
        return
    out = json.loads(lines[-1])
    print(json.dumps({"lib": "r1" if lib == R1 else "head",
                      "value": out["value"], "runs": out.get("runs")}),
          flush=True)

for i in range(3):
    run(R1)
    run(HEAD)
