"""Production dress rehearsal (round-4, VERDICT r3 item 4): the full fit()
path at the north-star config (mean_teacher UNet, batch 24 @ 256^2, device
store + scan + val every 200 + ckpt contract) on the REAL chip, with a
mid-run SIGKILL and a resume, measuring SUSTAINED throughput including
validation stalls from the log timestamps (not the in-process counter,
which would amortize compile time differently between the two runs).

Usage: python scripts/dress_rehearsal.py [--iters 3000] [--kill-after 75]
Writes docs/DRESS_REHEARSAL.md + leaves the snapshot tree for inspection.
"""
import argparse
import datetime as dt
import json
import os
import re
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def build_data(root, size=256):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cvssl_tpu.data.synthetic import make_synthetic_acdc
    return make_synthetic_acdc(root, num_cases=60, slices_per_case=8,
                               num_val=16, size=size)


def launch(root, snap_root, iters, kill_on_ckpt=False, snap=None,
           timeout=3600):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "cvssl_tpu.train.cli",
           "--root_path", root, "--exp", "rehearsal", "--model", "unet",
           "--method", "mean_teacher", "--num_classes", "4",
           "--max_iterations", str(iters), "--batch_size", "24",
           "--labeled_bs", "12", "--patch_size", "256", "256",
           "--labeled_num", "14", "--val_every", "200",
           "--ckpt_every", "500", "--scan_steps", "10",
           "--snapshot_root", snap_root]
    p = subprocess.Popen(cmd, env=env, cwd="/tmp",
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    if not kill_on_ckpt:
        p.wait()
        return None
    # SIGKILL shortly after the first full train-state checkpoint lands so
    # the relaunch demonstrably resumes mid-run (a fixed timer raced the
    # cold-compile window and killed before any checkpoint existed)
    t0 = time.time()
    while time.time() - t0 < timeout:
        if p.poll() is not None:
            return p.returncode
        if snap and os.path.isdir(snap) and any(
                f.startswith("model_iter_") for f in os.listdir(snap)):
            time.sleep(5.0)
            break
        time.sleep(1.0)
    p.send_signal(signal.SIGKILL)
    p.wait()
    return p.returncode


def parse_log(snap):
    """(ts, iter) pairs from log.txt 'iteration N :' lines + val lines."""
    rows = []
    with open(os.path.join(snap, "log.txt")) as f:
        for line in f:
            m = re.match(r"\[(\d+:\d+:\d+)(?:\.\d+)?\] iteration (\d+) :",
                         line)
            if m:
                h, mi, s = map(int, m.group(1).split(":"))
                rows.append((h * 3600 + mi * 60 + s, int(m.group(2)),
                             "mean_dice" in line))
    return rows


def sustained_window(rows):
    """Throughput over the resume run's logged window, val stalls included.
    The restart boundary is a STRICT iteration decrease (val lines repeat
    the train line's iteration, so <= would cut at the last val line)."""
    seg_start = 0
    for i in range(1, len(rows)):
        if rows[i][1] < rows[i - 1][1]:
            seg_start = i
    seg = rows[seg_start:]
    train_rows = [r for r in seg if not r[2]]
    if len(train_rows) < 3:
        raise SystemExit(
            f"sustained_window: need >=3 train log lines after the restart "
            f"boundary, got {len(train_rows)} (short run or log_every too "
            f"large for --report-only on this snapshot)")
    (t_a, it_a, _), (t_b, it_b, _) = train_rows[1], train_rows[-1]
    dt_s = (t_b - t_a) % 86400
    slices = (it_b - it_a) * 24
    return (slices / dt_s if dt_s > 0 else float("nan")), it_a, it_b, dt_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--kill-after", type=float, default=75.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--report-only", default=None, metavar="SNAP",
                    help="skip the runs; rebuild the report from an "
                         "existing snapshot dir (pass resumed_from as "
                         "--resumed-from)")
    ap.add_argument("--resumed-from", default="")
    ap.add_argument("--wall", type=float, default=0.0)
    a = ap.parse_args()

    if a.report_only:
        write_report(a.report_only, a.iters,
                     a.resumed_from.split(",") if a.resumed_from else [],
                     a.wall)
        return

    tmp = tempfile.mkdtemp(prefix="rehearsal_")
    data_root = os.path.join(tmp, "ACDC")
    print("building 256^2 synthetic ACDC ...", flush=True)
    subprocess.run([sys.executable, "-c",
                    "import sys; sys.path.insert(0,'/root/repo');"
                    "from scripts.dress_rehearsal import build_data;"
                    f"build_data({data_root!r}, {a.size})"],
                   check=True, cwd="/root/repo")

    snap_root = os.path.join(tmp, "snap")
    snap = os.path.join(snap_root, "rehearsal_14_labeled", "unet")

    print("run 1: launching, SIGKILL after the first checkpoint",
          flush=True)
    t0 = time.time()
    launch(data_root, snap_root, a.iters, kill_on_ckpt=True, snap=snap)
    ckpts_after_kill = sorted(os.listdir(snap)) if os.path.isdir(snap) \
        else []
    print("killed; snapshot now:", ckpts_after_kill, flush=True)

    print("run 2: resuming to completion", flush=True)
    launch(data_root, snap_root, a.iters)
    wall = time.time() - t0

    write_report(snap, a.iters,
                 [f for f in ckpts_after_kill
                  if f.startswith("model_iter_")], wall)


def write_report(snap, iters, resumed_from, wall):
    rows = parse_log(snap)
    # sustained window: from the first logged iteration AFTER the resume
    # run's compile (first row of the second run) to the end; include all
    # val stalls inside the window.
    sustained, it_a, it_b, dt_s = sustained_window(rows)

    files = sorted(os.listdir(snap))
    report = {
        "config": "mean_teacher unet 24x256^2, device store + scan_steps 10",
        "iterations": iters,
        "resumed_from": resumed_from,
        "sustained_slices_per_sec_incl_val": round(sustained, 1),
        "window_iters": [it_a, it_b],
        "window_seconds": dt_s,
        "total_wall_s": round(wall, 1),
        "artifacts": files,
        "snapshot": snap,
    }
    print(json.dumps(report, indent=1), flush=True)

    md = f"""# Production dress rehearsal (round 4)

One logged end-to-end `fit()` run at the north-star config on the real
chip, with a mid-run SIGKILL + resume (VERDICT r3 item 4).

- **Config**: mean_teacher UNet, batch 24 @ 256^2, labeled_num 14,
  device-resident store, `--scan_steps 10`, val every 200 (16 synthetic
  volumes, on-device EDT metrics), ckpt every 500, persistent compile
  cache — `scripts/dress_rehearsal.py`.
- **Kill + resume**: SIGKILL ~5 s after the first full-state checkpoint
  landed; the relaunch resumed from
  `{', '.join(report['resumed_from']) or 'scratch'}` (full train
  state incl. best_dice) and ran to {iters} iterations.
- **Sustained throughput** (log-timestamp window iters
  {it_a}->{it_b}, INCLUDING validation stalls, excluding compile):
  **{sustained:.0f} slices/sec/chip** (target >= 700).
- **Artifacts** (reference naming contract): {len(files)} files incl.
  `iter_*_dice_*.ckpt`, `unet_best_model.ckpt`, `model_iter_*.ckpt`,
  `iter_*.ckpt` student weights, `ema_model_iter_*.ckpt` teacher weights,
  `log.txt`, TB events under `log/`.
- Run UTC: {dt.datetime.utcnow().isoformat(timespec='seconds')}.

```json
{json.dumps({k: v for k, v in report.items() if k != 'artifacts'},
            indent=1)}
```
"""
    with open("/root/repo/docs/DRESS_REHEARSAL.md", "w") as f:
        f.write(md)
    print("wrote docs/DRESS_REHEARSAL.md", flush=True)


if __name__ == "__main__":
    main()
