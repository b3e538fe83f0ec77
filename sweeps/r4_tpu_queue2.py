"""r4 queue 2: timed vmapped-vs-sequential protocol A/B on the v5e."""
import subprocess, sys, time, json

def run(tag, extra, epochs2):
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "experiments/run_uci.py", "yacht",
         "--epochs1", "50", "--epochs2", str(epochs2), "--quiet",
         "--ckpt-dir", f"/tmp/r4q2_{tag}_{epochs2}"] + extra,
        capture_output=True, text=True)
    wall = time.time() - t0
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    out = json.loads(line)
    print(json.dumps({"tag": tag, "epochs2": epochs2, "proc_wall_s": round(wall, 1),
                      "protocol_wall_s": out.get("protocol_wall_s"),
                      "rmse_mean": out.get("rmse_mean")}), flush=True)
    if p.returncode != 0:
        print("STDERR:", p.stderr[-2000:], flush=True)

for epochs2 in (450, 4950):
    run("vmap", [], epochs2)
    run("seq", ["--sequential-splits"], epochs2)
