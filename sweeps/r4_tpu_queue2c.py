"""r4 queue 2c: INTERLEAVED full-length vmapped/sequential A/B (weather-proof),
after the round-4 chunk/fetch fixes (epochs_per_call 2500, single device_get)."""
import subprocess, sys, time, json

def run(tag, extra, i):
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "experiments/run_uci.py", "yacht", "--quiet",
         "--ckpt-dir", f"/tmp/r4q2c_{tag}_{i}"] + extra,
        capture_output=True, text=True)
    wall = time.time() - t0
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    out = json.loads(lines[-1]) if lines else {}
    print(json.dumps({
        "tag": tag, "iter": i, "proc_wall_s": round(wall, 1),
        "protocol_wall_s": out.get("protocol_wall_s"),
        "rmse_mean": out.get("rmse_mean"),
    }), flush=True)
    if p.returncode != 0:
        print("STDERR:", p.stderr[-1000:], flush=True)

for i in range(2):
    run("vmap", [], i)
    run("seq", ["--sequential-splits"], i)
