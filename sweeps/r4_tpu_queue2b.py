"""r4 queue 2b: FULL-length (500+50000) vmapped vs sequential yacht protocol."""
import subprocess, sys, time, json

def run(tag, extra):
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "experiments/run_uci.py", "yacht",
         "--ckpt-dir", f"/tmp/r4q2b_{tag}"] + extra,
        capture_output=True, text=True)
    wall = time.time() - t0
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    out = json.loads(lines[-1]) if lines else {}
    # per-split walls from the log entries (sequential path)
    split_walls = [json.loads(l)["wall_s"] for l in lines
                   if '"split"' in l and '"wall_s"' in l]
    print(json.dumps({
        "tag": tag, "proc_wall_s": round(wall, 1),
        "protocol_wall_s": out.get("protocol_wall_s"),
        "sum_split_wall_s": round(sum(split_walls), 1) if split_walls else None,
        "rmse_mean": out.get("rmse_mean"),
        "pred_mnll_per_point_mean": out.get("pred_mnll_per_point_mean"),
    }), flush=True)
    if p.returncode != 0:
        print("STDERR:", p.stderr[-1500:], flush=True)

run("vmap_full", [])
run("seq_full", ["--sequential-splits"])
